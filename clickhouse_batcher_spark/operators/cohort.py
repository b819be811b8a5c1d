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
