"""Cohort retention analysis (the product-analytics retention matrix).

Users are grouped by the ISO week of their first event (the cohort);
each later week they remain active contributes to that cohort's
retention curve. Both engines truncate weeks to ISO Monday, so the
matrix keys agree exactly; retention is one IEEE division of two
exact integers.

Plan shape: one groupBy(user) for first-activity, one distinct over
(user, week), a user-keyed join (same hash partitioning reused), and
a final groupBy on the (cohort_week, activity_week) matrix key —
every shuffle is keyed, no cross join, matrix cardinality is weeks²
regardless of event count. At 100 TB the user-level frames are
user-cardinality-bounded (orders of magnitude below events); AQE
picks broadcast for the cohort-size join since the matrix side is
weeks²-tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table


@query(
    "cohort_retention_weekly",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1),
    act AS (SELECT DISTINCT user_id, week AS activity_week FROM e),
    mat AS (
      SELECT c.cohort_week, a.activity_week,
             CAST(count(*) AS BIGINT) AS n_active
      FROM act a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
           FROM cohort GROUP BY 1)
    SELECT m.cohort_week, m.activity_week, m.n_active, s.cohort_size,
           CAST(m.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS retention
    FROM mat m JOIN sz s ON m.cohort_week = s.cohort_week
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort x activity-week retention matrix."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = e.select("user_id", F.col("week").alias("activity_week")).distinct()
    mat = (
        act.join(cohort, "user_id")
        .groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sz = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return mat.join(sz, "cohort_week").select(
        "cohort_week",
        "activity_week",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round-5 third session): the classic
# recency/frequency/monetary customer quartiles. One orders aggregate
# per customer, then three deterministic quartile assignments via the
# exact two-level global index over (metric, custkey) — the unique
# tiebreak makes the segments hash-stable, unlike ntile over bare
# metrics, and the range-shuffled index keeps every pass parallel.
# ---------------------------------------------------------------------------


@query(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS custkey,
        MAX(CAST(o_orderdate AS DATE)) AS last_order,
        COUNT(*) AS freq,
        CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(27,6)))
             AS DOUBLE) AS monetary
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT custkey, last_order, freq, monetary,
        ((ROW_NUMBER() OVER (ORDER BY last_order, custkey) - 1) * 4)
          // COUNT(*) OVER () + 1 AS r_q,
        ((ROW_NUMBER() OVER (ORDER BY freq, custkey) - 1) * 4)
          // COUNT(*) OVER () + 1 AS f_q,
        ((ROW_NUMBER() OVER (ORDER BY monetary, custkey) - 1) * 4)
          // COUNT(*) OVER () + 1 AS m_q
      FROM base
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
      CAST(m_q AS INT) AS m_q,
      CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
        || CAST(m_q AS VARCHAR) AS segment,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(MIN(custkey) AS BIGINT) AS sample_custkey
    FROM ranked GROUP BY r_q, f_q, m_q
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed into 4x4x4 recency/frequency/monetary
    quartile segments (the classical CRM slicing), reported as segment
    sizes. Quartile = (global_index * 4) div n + 1 over
    (metric, custkey) — balanced quartiles with a deterministic
    tiebreak, so the assignment is engine-independent; monetary sums
    are decimal-exact first.

    Each metric's rank is the exact two-level global index
    (``with_global_index`` — range shuffle + parallel per-partition
    row_number + broadcast offsets): three fully-parallel range
    shuffles over |customers| aggregate rows, never a single-partition
    Window.orderBy (round-7 upgrade; identical assignment).
    """
    from clickhouse_batcher_spark.functions import with_global_index

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(27,6)"))
        .cast("double")
        .alias("monetary"),
    )
    nrow = base.agg(F.count(F.lit(1)).alias("_n"))
    idx = base
    metrics = (("last_order", "r_q"), ("freq", "f_q"), ("monetary", "m_q"))
    for col, name in metrics:
        idx = with_global_index(idx, [col, "custkey"], index_name=f"_i{name}")
    ranked = idx.crossJoin(F.broadcast(nrow)).select(
        "custkey",
        *[
            (((F.col(f"_i{name}") * 4) / F.col("_n")).cast("int") + 1).alias(
                name
            )
            for _, name in metrics
        ],
    )
    return ranked.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.min("custkey").cast("bigint").alias("sample_custkey"),
    ).select(
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
        "n_customers",
        "sample_custkey",
    )
