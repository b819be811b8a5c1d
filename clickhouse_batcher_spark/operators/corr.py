"""Pairwise correlation matrix over grouped measures.

``F.corr`` (and any double-sum covariance) is shuffle-order dependent
— banned for oracled output. This operator computes Pearson
correlation from its *moment sums* instead, each routed through
DECIMAL(27,6) (the repo's exact-aggregation carrier), so every input
to the final closed-form expression is bit-identical across engines
and partitionings; the remaining arithmetic is a fixed IEEE sequence
(products, subtractions, ``sqrt``, one division — sqrt is correctly
rounded per IEEE-754, not a transcendental, so no rounding fudge is
needed).

The statistical question: do users who spend big on one event type
also spend big on another? x_u(t) = user u's total value for type t
(decimal-exact); for each unordered type pair the correlation runs
over users having both types.

Scale: one groupBy(user, type) over raw events (map-side combined),
then a self-equi-join on user — the joined frame is (users x
types²) rows, far smaller than the event count; the pair-level agg
shuffles only (type-pair) keys. The per-user frame is reused for
both join sides, and Catalyst shares the one underlying aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec
from clickhouse_batcher_spark.tables import load_table


def moment_corr(pairs: DataFrame, a: str, b: str, keys: list[str]) -> DataFrame:
    """groupBy(keys) Pearson corr of columns a, b via decimal moments."""
    n = F.count(F.lit(1)).cast("double")
    agg = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(dec(F.col(a))).cast("double").alias("sx"),
        F.sum(dec(F.col(b))).cast("double").alias("sy"),
        F.sum(dec(F.col(a) * F.col(a))).cast("double").alias("sxx"),
        F.sum(dec(F.col(b) * F.col(b))).cast("double").alias("syy"),
        F.sum(dec(F.col(a) * F.col(b))).cast("double").alias("sxy"),
    )
    nn = F.col("n_users").cast("double")
    cov = nn * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nn * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))
    ).otherwise(F.lit(None).cast("double"))
    return agg.select(*keys, "n_users", corr.alias("corr"))


@query(
    "event_type_value_correlation",
    oracle="""
    WITH per_user AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, a.x AS xa, b.x AS xb
      FROM per_user a JOIN per_user b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    ),
    m AS (
      SELECT type_a, type_b,
        CAST(count(*) AS BIGINT) AS n_users,
        CAST(SUM(CAST(xa AS DECIMAL(27,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(xb AS DECIMAL(27,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(xa * xa AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(xb * xb AS DECIMAL(27,6))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(xa * xb AS DECIMAL(27,6))) AS DOUBLE) AS sxy
      FROM pairs GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_users,
      CASE WHEN (CAST(n_users AS DOUBLE) * sxx - sx * sx) > 0
            AND (CAST(n_users AS DOUBLE) * syy - sy * sy) > 0
        THEN (CAST(n_users AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n_users AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n_users AS DOUBLE) * syy - sy * sy))
        ELSE NULL END AS corr
    FROM m
    """,
)
def event_type_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation matrix of per-user total value across event types."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id", "event_type").agg(
        F.sum(dec("value")).cast("double").alias("x")
    )
    a = per_user.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("x").alias("xa")
    )
    b = per_user.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("x").alias("xb")
    )
    pairs = a.join(b, "user_id").filter(F.col("type_a") < F.col("type_b"))
    return moment_corr(pairs, "xa", "xb", ["type_a", "type_b"])
