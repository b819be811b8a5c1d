"""Physical-layout scale proofs: partition pruning and bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_batcher_spark.sources.layout import (
    read_partitioned,
    write_bucketed_table,
    write_partitioned_by_month,
)
from clickhouse_batcher_spark.tables import load_table


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partition_pruning_on_month_layout(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_month")
    write_partitioned_by_month(events, "ts", path)

    back = read_partitioned(spark, path)
    jan = back.filter((F.col("_year") == 2024) & (F.col("_month") == 1))
    plan = _plan(jan.select("event_id"))
    # the predicate must become a PartitionFilter (directory pruning),
    # not a row-level PushedFilter
    assert "PartitionFilters" in plan
    assert "_month" in plan.split("PartitionFilters", 1)[1][:300]
    assert jan.count() == events.filter(F.month("ts") == 1).count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key -> sort-merge join with no
    shuffle Exchange: the 100 TB co-location story, verified on the
    actual plan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed_table(
            orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8
        )
        write_bucketed_table(
            lineitem.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8
        )
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle paid at write
        # correctness unchanged
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
