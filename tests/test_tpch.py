"""TPC-H family: oracle parity + plan-shape guards for Q3/Q5/Q6/Q7/Q10/Q14.

Q1 parity lives in test_core_queries.py; this file covers the rest of
the family (queries_ext4/ext5) the same way the driver will: exact
Spark-vs-DuckDB comparison, plus explain-plan assertions for the scale
properties each query's docstring claims.
"""

from __future__ import annotations

import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from parity import assert_parity

TPCH = [
    "tpch_q3_unshipped",
    "tpch_q5_regional_share",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q13_order_distribution",
    "tpch_q18_big_orders",
    "tpch_q15_top_supplier",
    "tpch_q22_idle_customers",
    "tpch_q8_market_share",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_bracket_revenue",
    # queries_ext6: the final eight, completing the 22-query family
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines_by_status",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_suppliers",
]


@pytest.mark.parametrize("name", TPCH)
def test_tpch_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_transfer_checksum_parity(spark, sf_dir):
    """Pin the orders_transfer_checksum DuckDB oracle in pytest: it
    rides the round-5 driver window and leans on less-common SQL
    ('0x'||hex -> BIGINT cast, HUGEINT modulo, double->VARCHAR
    rendering parity), so its first automated check must NOT be the
    correctness gate itself (ADVICE r4)."""
    assert_parity(spark, "orders_transfer_checksum", sf_dir)


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_is_pure_pushed_scan(spark, sf_dir):
    """Q6's whole point: predicates and the 3-needed-columns projection
    must reach the parquet scan; no join, no shuffle of row data."""
    plan = _formatted_plan(
        catalog.QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir)
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    assert "SortMergeJoin" not in plan


def test_q10_topk_is_heap_not_global_sort(spark, sf_dir):
    plan = _formatted_plan(
        catalog.QUERIES["tpch_q10_returned_items"](spark, sf_dir)
    )
    assert "TakeOrderedAndProject" in plan


def test_q7_dimensions_broadcast(spark, sf_dir):
    plan = _formatted_plan(
        catalog.QUERIES["tpch_q7_volume_shipping"](spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    """Q4's EXISTS must plan as a left-semi join (stops at the first
    matching line per order), never a full join + distinct."""
    plan = _formatted_plan(catalog.QUERIES["tpch_q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    """Q16's NOT IN must plan as a broadcast left-anti join against the
    handful of complaint suppliers — not a null-aware nested loop."""
    plan = _formatted_plan(catalog.QUERIES["tpch_q16_supplier_cnt"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_semi_join_broadcasts_movers(spark, sf_dir):
    """The decorrelated nested aggregate reduces to a distinct supplier
    key set (bounded by |supplier|), so the final semi-join must
    broadcast it rather than shuffling the supplier table."""
    plan = _formatted_plan(catalog.QUERIES["tpch_q20_promo_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q21_only_orderkey_joins_shuffle(spark, sf_dir):
    """Q21's decorrelation promise: the only SortMergeJoins are the
    big-big orderkey joins; every dimension join broadcasts and there
    is no correlated self-join explosion."""
    plan = _formatted_plan(catalog.QUERIES["tpch_q21_waiting_suppliers"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
