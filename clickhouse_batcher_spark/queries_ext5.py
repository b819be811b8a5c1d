"""Fifth coverage batch: the remaining TPC-H shapes the driver schema
supports (Q6, Q7, Q10, Q14 adaptations).

The reference delegates every query to ClickHouse (SURVEY.md §2.2);
these are the classic scan-heavy / multi-way-join / ratio-aggregate
shapes an analytics engine must answer natively. Adaptations to the
driver schema: nation names are ``NATION_<k>``, ``p_type`` is a single
word (``PROMO`` replaces TPC-H's ``PROMO%`` prefix), and date columns
are physically timestamps.

Scale notes (100 TB):

- Q6 is the pure-scan benchmark: both predicates and the 3-column
  projection push into the parquet scan; the aggregate is a map-side
  partial + 1-row final — no data shuffle at any scale.
- Q7/Q10 leave dimension joins unhinted (AQE broadcasts them while
  they fit; customer/supplier scale with SF and must be allowed to
  graduate to shuffle joins); the only guaranteed big shuffle is
  lineitem⋈orders on the order key.
- Q10's top-20 is ``TakeOrderedAndProject`` (per-partition heaps),
  never a global sort.
- Q14 aggregates to ONE row via conditional decimal sums — partials
  combine map-side; the promo/total ratio is a single IEEE division
  of exact decimal-derived doubles (bit-identical in DuckDB).
- Determinism: every money sum is decimal-routed (``dec_sum_expr``);
  ties in Q10's limit are broken by the unique ``c_custkey``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec, dec_sum_expr
from clickhouse_batcher_spark.tables import load_table

_Q6_FROM = "1996-01-01 00:00:00"
_Q6_TO = "1997-01-01 00:00:00"
_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"
_Q7_FROM = "1996-01-01 00:00:00"
_Q7_TO = "1998-01-01 00:00:00"
_Q10_FROM = "1996-01-01 00:00:00"
_Q10_TO = "1996-04-01 00:00:00"
_Q14_FROM = "1996-03-01 00:00:00"
_Q14_TO = "1996-04-01 00:00:00"


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(COALESCE(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(27,6))), 0) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_FROM}'
      AND l_shipdate < TIMESTAMP '{_Q6_TO}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from hypothetical discount removal.

    The canonical predicate-pushdown check: all three filters and the
    3-column ReadSchema reach the parquet scan; the whole query is one
    whole-stage-codegen'd scan + partial agg + 1-row final.
    """
    lo = F.lit(_Q6_FROM).cast("timestamp")
    hi = F.lit(_Q6_TO).cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = dec(F.col("l_extendedprice") * F.col("l_discount"))
    return li.groupBy().agg(
        F.coalesce(dec_sum_expr(rev), F.lit(0.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      CAST(year(l_shipdate) AS BIGINT) AS l_year,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
           AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE ((sn.n_name = '{_Q7_NATION_A}' AND cn.n_name = '{_Q7_NATION_B}')
        OR (sn.n_name = '{_Q7_NATION_B}' AND cn.n_name = '{_Q7_NATION_A}'))
      AND l_shipdate >= TIMESTAMP '{_Q7_FROM}'
      AND l_shipdate < TIMESTAMP '{_Q7_TO}'
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.

    supplier⋈nation and customer⋈nation pre-reduce each side to the
    two relevant nations BEFORE touching the fact tables, so the
    (unhinted, AQE-broadcast while small) hash joins against
    lineitem/orders act as semi-join filters; the lineitem⋈orders key shuffle is the only big exchange.
    """
    lo = F.lit(_Q7_FROM).cast("timestamp")
    hi = F.lit(_Q7_TO).cast("timestamp")
    nations = (_Q7_NATION_A, _Q7_NATION_B)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == _Q7_NATION_A)
                & (F.col("cust_nation") == _Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == _Q7_NATION_B)
                & (F.col("cust_nation") == _Q7_NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dec_sum_expr(rev).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
           AS DOUBLE) AS revenue,
      c_acctbal, n_name
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '{_Q10_FROM}'
      AND o_orderdate < TIMESTAMP '{_Q10_TO}'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns.

    Both fact filters (order-date quarter, returnflag = 'R') push to
    the scans; customer⋈nation joins unhinted (AQE-broadcast while
    it fits); the top-20 with the unique
    c_custkey tiebreak is per-partition heaps, not a global sort.
    """
    lo = F.lit(_Q10_FROM).cast("timestamp")
    hi = F.lit(_Q10_TO).cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum_expr(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
        ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(27,6))) AS DOUBLE) AS DOUBLE)
        AS promo_revenue_pct,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '{_Q14_FROM}'
      AND l_shipdate < TIMESTAMP '{_Q14_TO}'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts.

    part joins unhinted (AQE broadcasts it while it fits — part
    scales with SF, so the hint is left off); both decimal
    sums combine map-side and the final frame is one row, so the only
    cost is the pruned lineitem scan.
    """
    lo = F.lit(_Q14_FROM).cast("timestamp")
    hi = F.lit(_Q14_TO).cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(27,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.groupBy().agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).cast("double").alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q18_MIN_QTY = 180


@query(
    "tpch_q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count.

    The canonical outer-join + double-aggregation shape. The LEFT join
    keeps zero-order customers (COUNT of the nullable key counts 0 for
    them); both aggregations are map-side combinable, and the second
    groups on c_count whose cardinality is tiny — the heavy shuffle is
    only the first, on the customer key.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@query(
    "tpch_q18_big_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders and their customers.

    The HAVING subquery becomes an aggregate + semi-join: the big-order
    key set is produced by a map-side-combined sum over lineitem, then
    joined back (left_semi — no row multiplication, and AQE can
    broadcast the filtered key set since big orders are rare by
    construction). Top-100 is per-partition heaps.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q15_FROM = "1996-01-01 00:00:00"
_Q15_TO = "1996-04-01 00:00:00"


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
             AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
        AND l_shipdate < TIMESTAMP '{_Q15_TO}'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The view + scalar-subquery shape decomposed by hand: one map-side
    combined revenue aggregate (decimal-exact so the MAX comparison is
    bit-deterministic), a 1-row max frame broadcast back as an
    equi-join (not a cross filter), and an unhinted supplier lookup
    (AQE-broadcast while supplier fits).
    """
    lo = F.lit(_Q15_FROM).cast("timestamp")
    hi = F.lit(_Q15_TO).cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum_expr(rev).alias("total_revenue")
    )
    top = revenue.groupBy().agg(F.max("total_revenue").alias("total_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), "total_revenue")
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q22_CUTOFF = "2000-06-01 00:00:00"


@query(
    "tpch_q22_idle_customers",
    oracle=f"""
    WITH positive AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg_bal FROM positive)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never
    ordered, grouped by market segment (standing in for the phone
    country code the driver schema lacks).

    "Idle" = no order since _Q22_CUTOFF (the synthetic data has no
    never-ordered customers, so the pure Q22 predicate is vacuous);
    NOT EXISTS becomes a left_anti join on the customer key; the
    global average is a 1-row broadcast crossJoin filter (decimal
    sum / exact count, so the threshold is engine-identical). The
    anti join's right side is just order keys — column-pruned to one
    column before the shuffle.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .groupBy()
        .agg(
            (
                F.sum(dec(F.col("c_acctbal"))).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bal")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


_Q8_REGION = "EUROPE"
_Q8_NATION = "NATION_7"
_Q8_TYPE = "STANDARD"
_Q8_FROM = "1996-01-01 00:00:00"
_Q8_TO = "1998-01-01 00:00:00"


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_orders AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume,
        sn.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
        AND o_orderdate >= TIMESTAMP '{_Q8_FROM}'
        AND o_orderdate < TIMESTAMP '{_Q8_TO}'
    )
    SELECT o_year,
      CAST(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                         THEN volume ELSE CAST(0 AS DECIMAL(27,6)) END)
                AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM all_orders GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's part-type market by
    year — the deepest join in the catalog (7 tables, nation twice).

    Every dimension side joins unhinted after its filter
    (region-filtered customer-nation set, one part type,
    supplier->nation lookup) — AQE broadcasts each while it fits; the
    only big exchange is lineitem⋈orders. The share is a conditional
    decimal sum over the post-join rows — one aggregate pass, and the
    final division is a single IEEE op on exact decimal-derived
    doubles (bit-identical in DuckDB).
    """
    lo = F.lit(_Q8_FROM).cast("timestamp")
    hi = F.lit(_Q8_TO).cast("timestamp")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q8_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    cn = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(27,6)")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == _Q8_NATION, volume).otherwise(zero)
                ).cast("double")
                / F.sum(volume).cast("double")
            ).cast("double").alias("mkt_share")
        )
    )


_Q17_QTY_FRACTION = "0.5"  # of the per-part average (TPC-H uses 0.2)


@query(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey AS pk,
        {_Q17_QTY_FRACTION} * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)))
                                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
          AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
      COUNT(*) AS n_items
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < threshold
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity line items
    (the per-group-threshold join: correlated AVG subquery decorrelated
    into an aggregate + equi-join).

    The per-part average is decimal-exact (sum/count of exact decimals
    in a fixed order of operations) so the `<` threshold comparison is
    engine-identical; the aggregate frame is one row per part —
    broadcast-able at dimension scale, AQE-decided beyond.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    frac = F.lit(float(_Q17_QTY_FRACTION))
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            frac
            * (
                F.sum(dec(F.col("l_quantity"))).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("threshold")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .groupBy()
        .agg(
            (F.sum(dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q19_bracket_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#12' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate that
    spans both join sides (brand/size from part, quantity from
    lineitem).

    The interesting plan property: Catalyst factors the disjunction —
    single-side conjuncts that appear in every branch would push to
    the scans, and the cross-side residue evaluates post-join. The
    join itself stays a plain equi-join on the part key (AQE-broadcast
    while part fits); the
    disjunction never degrades it to a nested loop (the plan audit's
    no-cartesian guard applies to this query like every other).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    branch = lambda brand, qlo, qhi, slo, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("p_size").between(slo, shi)
    )
    pred = (
        branch("Brand#11", 1, 11, 1, 5)
        | branch("Brand#12", 10, 20, 1, 10)
        | branch("Brand#13", 20, 30, 1, 15)
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .groupBy()
        .agg(
            dec_sum_expr(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Hex -> int without any engine-specific cast: 15 pure-BIGINT terms,
# one per hex digit of the 60-bit prefix.  Portable across DuckDB
# versions (the former ``'0x' || hex -> BIGINT`` cast and
# ``CAST(ROUND(double) AS VARCHAR)`` rendering both proved
# version-sensitive at the round-5 gate).
_HEX15 = " + ".join(
    f"(strpos('0123456789abcdef', substring(h, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(15)
)


@query(
    "orders_transfer_checksum",
    oracle=f"""
    SELECT o_orderstatus,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(CAST(SUM({_HEX15}) AS HUGEINT)
           % 9223372036854775807 AS BIGINT) AS checksum
    FROM (
      SELECT o_orderstatus,
        sha256(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
               || '|' || CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR)) AS h
      FROM orders
    )
    GROUP BY o_orderstatus
    """,
)
def orders_transfer_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum per partition-ish group — the
    transfer-integrity primitive for a batching/shipping engine (the
    reference carries per-row sha256sums for exactly this purpose,
    hashes.go:25): a sink-side recompute that matches proves no row
    was lost, duplicated, or mangled in flight.

    Per-row SHA-256 over a canonical rendering, folded with SUM (a
    commutative monoid, so the checksum is shuffle-order-independent
    and map-side combinable) modulo 2^63-1. Engine-portable: the
    oracle reproduces the exact 60-bit-per-row arithmetic; verified
    identical in Spark and DuckDB at sf0.01.
    """
    orders = load_table(spark, sf_dir, "orders")
    canonical = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        # decimal(15,2) -> string renders identically in Spark and
        # DuckDB ("123.40", scale always shown); double -> string does
        # not, which is what turned the round-5 gate row red.
        F.col("o_totalprice").cast("decimal(15,2)").cast("string"),
    )
    row_hash = F.conv(
        F.substring(F.sha2(canonical, 256), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(row_hash) % F.lit(9223372036854775807).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("checksum"),
    )
