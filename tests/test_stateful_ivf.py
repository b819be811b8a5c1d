"""Stateful streaming operator + IVF ANN tests."""

from pyspark.sql import functions as F

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.streaming.stateful import running_user_totals
from clickhouse_batcher_spark.tables import load_table


def test_running_user_totals_across_batches(spark, sf_dir, tmp_path):
    """State carries across micro-batches: the LAST update emitted per
    user must equal the batch-mode groupBy over all data."""
    events = load_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends each emitted update; the final
    # state per user is the row with the max n_events.
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM state_out) WHERE rn = 1
        """
    )
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in expected.collect()}
    assert set(got) == set(exp)
    for uid in exp:
        assert got[uid][0] == exp[uid][0], uid
        assert abs(got[uid][1] - exp[uid][1]) < 1e-6, uid


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in catalog.QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    approx_rows = catalog.QUERIES["similarity_ann_ivf"](spark, sf_dir).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    assert approx
    recall = len(exact & approx) / len(exact)
    # probing 4/16 cells; assert well above the ~25% random-cell floor
    assert recall >= 0.3, f"recall {recall}"
