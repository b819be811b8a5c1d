"""Bucketed-table co-located join: plan contract + result parity.

The point of `operators/bucketing.py` is a TESTED plan shape: writing
both join sides bucketed+sorted on the join key must produce a
SortMergeJoin with no Exchange above either scan — the layout that
makes a 100 TB fact-fact join shuffle-free on every subsequent run.
"""

import pytest

from clickhouse_batcher_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from clickhouse_batcher_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "bt_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bt_lineitem",
        "o_orderkey",
        8,
    )
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey")
    plan = _formatted(joined)
    assert "SortMergeJoin" in plan, plan
    # the whole point: neither join input shuffles (no Exchange at
    # all in a bare join — the scans already report the bucket
    # partitioning)
    assert "Exchange" not in plan, plan
    # write-time sortBy also removes the per-task Sort above the scans
    assert plan.count("(4) Sort") + plan.count("Sort [") <= 2


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, "o_orderkey")
        .groupBy()
        .agg({"l_quantity": "sum", "o_orderkey": "count"})
        .collect()[0]
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .groupBy()
        .agg({"l_quantity": "sum", "l_orderkey": "count"})
        .collect()[0]
    )
    assert got[0] == want[0]
    assert abs(float(got[1]) - float(want[1])) < 1e-6


def test_mismatched_bucket_counts_still_correct(spark, sf_dir):
    """A 2x bucket-count mismatch must still produce correct results
    (Spark shuffles one side) — layout is an optimization, never a
    correctness dependency."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    write_bucketed(customer, "bt_cust4", "c_custkey", 4)
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "bt_ord8",
        "c_custkey",
        8,
    )
    try:
        n = bucketed_join(spark, "bt_cust4", "bt_ord8", "c_custkey").count()
        want = customer.join(
            orders, customer.c_custkey == orders.o_custkey
        ).count()
        assert n == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_cust4")
        spark.sql("DROP TABLE IF EXISTS bt_ord8")
