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


def test_parity_harness_discriminates(spark, sf_dir):
    """Meta: the oracle comparison must FAIL on a wrong result — guards
    against a vacuous harness."""
    import pandas as pd
    import pytest as _pytest

    from clickhouse_batcher_spark import catalog as cat
    from tests.parity import canonicalize, duckdb_connection

    spark_pd = cat.QUERIES["tpch_q1"](spark, sf_dir).toPandas()
    spark_pd.loc[0, "sum_qty"] += 1.0  # corrupt one value
    con = duckdb_connection(sf_dir)
    oracle_pd = con.execute(cat.ORACLES["tpch_q1"]).df()
    con.close()
    with _pytest.raises(AssertionError):
        pd.testing.assert_frame_equal(
            canonicalize(spark_pd),
            canonicalize(oracle_pd),
            check_dtype=False,
            check_exact=True,
        )
