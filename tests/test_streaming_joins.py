"""Stream-static enrichment and stream-stream interval join tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_batcher_spark.streaming.joins import enrich_stream, interval_self_join
from clickhouse_batcher_spark.tables import load_table

# streaming joins soak — excluded from the driver's default verify run (pytest.ini
# deselects 'slow'; run with -m slow). VERDICT r13 task 6.
pytestmark = pytest.mark.slow


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    customer = load_table(spark, sf_dir, "customer")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    enriched = enrich_stream(
        stream, customer, "user_id", "c_custkey", ["c_name", "c_mktsegment"]
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql(
        "SELECT event_id, c_mktsegment FROM enrich_out ORDER BY event_id"
    ).collect()
    expected = (
        events.join(customer, events.user_id == customer.c_custkey, "left")
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    src = str(tmp_path / "src")
    events.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    joined = interval_self_join(stream, watermark="365 days", within="10 minutes")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT l_event_id, r_event_id FROM ssj_out").collect()
    }
    e1 = events.alias("a")
    e2 = events.alias("b")
    expected = {
        (r["l"], r["r"])
        for r in e1.join(
            e2,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(F.col("a.event_id").alias("l"), F.col("b.event_id").alias("r"))
        .collect()
    }
    assert got == expected
    assert got  # the window actually pairs events at this density
