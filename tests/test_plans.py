"""Plan-shape regression tests + DDL + metrics listener.

Guards the scale properties SCALE.md documents: filters reach the
parquet scan, projections prune columns, small dims broadcast. A
refactor that silently breaks pushdown fails here, not at 100 TB.
"""

from __future__ import annotations

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.plans.ddl import clickhouse_migrations
from clickhouse_batcher_spark.plans.migrations import MigrationRunner
from clickhouse_batcher_spark.streaming.metrics import IngestMetricsListener
from clickhouse_batcher_spark.tables import load_table


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _formatted_plan(catalog.QUERIES["tpch_q1"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    plan = _formatted_plan(catalog.QUERIES["join_revenue_by_segment"](spark, sf_dir))
    # lineitem scan must not read unused columns
    import re

    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_extendedprice", "l_discount"}


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _formatted_plan(catalog.QUERIES["orders_by_region"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle-sort


def test_semi_anti_joins_selected(spark, sf_dir):
    semi = _formatted_plan(catalog.QUERIES["parts_with_heavy_lineitems"](spark, sf_dir))
    anti = _formatted_plan(catalog.QUERIES["customers_without_recent_orders"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_clickhouse_ddl_migrations(tmp_path):
    executed: list[str] = []
    runner = MigrationRunner(
        clickhouse_migrations(), executed.append, str(tmp_path / "v.json")
    )
    assert runner.up() == [1, 2]
    assert "limits_hashes" in executed[0] and "UInt32" in executed[0]
    assert "batch_ledger" in executed[1]
    assert runner.up() == []  # idempotent


def test_ingest_metrics_listener(spark, sf_dir, tmp_path):
    from clickhouse_batcher_spark.sinks.parquet_sink import IdempotentParquetSink
    from clickhouse_batcher_spark.streaming.batcher import BatcherConfig, MicroBatcher

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    listener = IngestMetricsListener()
    spark.streams.addListener(listener)
    try:
        sink = IdempotentParquetSink(str(tmp_path / "sink"))
        batcher = MicroBatcher(sink, BatcherConfig(max_files_per_trigger=1))
        batcher.run_until_drained(
            batcher.file_source(spark, src, events.schema), str(tmp_path / "ckpt")
        )
    finally:
        spark.streams.removeListener(listener)
    assert listener.total_rows == events.count()
    assert len([b for b in listener.batches if b["num_input_rows"] > 0]) >= 3
