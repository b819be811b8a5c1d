"""Classic multi-way-join OLAP queries (TPC-H Q3/Q5 shapes).

The reference delegates all query processing to the ClickHouse server
(SURVEY.md §2.2 — its own surface is three SQL strings,
``hashes_test.go:192-196,229,237``); these two queries are the
canonical "does the engine plan multi-way joins well" checks an
analytics engine must answer natively:

- ``tpch_q3_unshipped`` — TPC-H Q3 adapted to the driver schema
  (``orders`` has no ``o_shippriority``; ``o_orderpriority`` stands
  in): revenue of not-yet-shipped orders for one market segment,
  top 10.
- ``tpch_q5_regional_share`` — TPC-H Q5 shape: 6-way join
  region→nation→customer→orders→lineitem→supplier with the
  local-supplier condition ``s_nationkey = c_nationkey``, revenue per
  nation plus each nation's share of the region total
  (ratio-to-report window).

Scale notes (100 TB):

- Catalyst broadcasts every dimension side (region/nation/customer/
  supplier are small after pruning; customer at SF-100k is the one
  that graduates to a shuffle join — AQE decides from size stats, the
  query text does not change).
- The only big-table shuffle is lineitem⋈orders on the order key;
  the Q3 top-10 is ``TakeOrderedAndProject`` (per-partition heaps),
  never a global sort.
- Determinism: money sums are decimal-routed (``dec_sum``), the Q5
  share is one IEEE division of two exact decimal-derived doubles,
  and the Q3 limit has a unique tiebreak (``o_orderkey``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec, dec_sum_expr
from clickhouse_batcher_spark.tables import load_table

_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1998-06-01 00:00:00"
_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01 00:00:00"
_Q5_TO = "1997-01-01 00:00:00"


@query(
    "tpch_q3_unshipped",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
           AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{_Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
      AND l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue.

    customer is filtered to one segment and joined unhinted (AQE
    broadcasts it while it fits — customer scales with SF); the
    lineitem⋈orders shuffle carries only the post-filter keys
    (both date predicates are pushed to the parquet scans).
    """
    cutoff = F.lit(_Q3_CUTOFF).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum_expr(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_regional_share",
    oracle=f"""
    WITH rev AS (
      SELECT n_name,
        SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
          AS dec_rev
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = '{_Q5_REGION}'
        AND o_orderdate >= TIMESTAMP '{_Q5_FROM}'
        AND o_orderdate < TIMESTAMP '{_Q5_TO}'
      GROUP BY n_name
    )
    SELECT n_name,
      CAST(dec_rev AS DOUBLE) AS revenue,
      CAST(dec_rev AS DOUBLE) / CAST(SUM(dec_rev) OVER () AS DOUBLE)
        AS region_share
    FROM rev
    """,
)
def tpch_q5_regional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape + ratio-to-report share of the region total.

    All four dimension sides join unhinted (AQE broadcasts each while
    it fits); the local-supplier condition ``s_nationkey =
    c_nationkey`` rides the supplier join as an equi-key, so no extra
    shuffle. The final window is over one row
    per nation (≤ 25 rows) — a single tiny partition by construction.
    """
    lo = F.lit(_Q5_FROM).cast("timestamp")
    hi = F.lit(_Q5_TO).cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    rev = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            cust.c_nationkey == nation.n_nationkey,
        )
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (supp.s_suppkey == li.l_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("dec_rev"))
    )
    total = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("dec_rev").cast("double").alias("revenue"),
        (
            F.col("dec_rev").cast("double")
            / F.sum("dec_rev").over(total).cast("double")
        ).alias("region_share"),
    )
