"""Oracle parity for the core (reference-derived) query surface."""

import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from tests.parity import assert_parity

CORE_QUERIES = [
    "count_star_all",
    "filtered_count",
    "ingest_readback",
    "replay_idempotent",
    "delete_where_counts",
    "sha256_docs",
    "tpch_q1",
    "join_revenue_by_segment",
    "except_all_users",
    "intersect_users",
    "topk_per_user",
    "dedup_exact_docs",
    "distinct_users_by_type",
    "events_hourly",
    "orders_rollup",
    "parts_with_heavy_lineitems",
    "customers_without_recent_orders",
    "orders_by_region",
]


@pytest.mark.parametrize("name", CORE_QUERIES)
def test_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
