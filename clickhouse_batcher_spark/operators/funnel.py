"""Ordered event-funnel analysis (view -> click -> purchase).

The product-analytics companion to ``user_sessions``/
``profile_events``: for each user, did a click happen strictly after
their first view, and a purchase strictly after that first qualifying
click? Stage timestamps cascade (``min`` of events later than the
previous stage's time), which is the standard windowed-funnel
semantics ClickHouse ships as ``windowFunnel`` — re-expressed here as
relational min-aggregates so it is exactly SQL-oracle-able. As in
``windowFunnel(window)``, each stage must land within
``FUNNEL_WINDOW_S`` seconds of the previous stage's time or the user
stalls at that stage.

Plan shape: one filtered scan of events, then a chain of
``groupBy(user_id)`` min-aggregates and inner joins — every exchange
in the chain hashes on ``user_id``, so Catalyst reuses one
partitioning across all stages (no re-shuffle between stage 2 and 3),
and the final single-row summary is a partial-aggregated global agg.
No cross joins: the summary counts come from one left-join spine over
users, keeping the catalog-wide no-CartesianProduct guard intact.

Determinism: outputs are integer counts plus ratios that are single
IEEE divisions of those counts — no float sums, no tie-breaking.

Scale: events shuffle once per stage keyed by user (AQE coalesces the
tiny aggregated sides); stage frames are user-cardinality-bounded,
far below the event count at 100 TB. The strict ``>`` cascade needs
only each user's per-stage minimum, so nothing holds more than one
row per user per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 172_800  # each stage within 2 days of the previous


def funnel_stage_times(events: DataFrame) -> DataFrame:
    """Per-user stage completion times: user_id, t1, t2, t3 (nullable).

    ``t1`` = first 'view'; ``t2`` = first 'click' in
    ``(t1, t1 + window]``; ``t3`` = first 'purchase' in
    ``(t2, t2 + window]``. A NULL stage implies NULL for all later
    stages (inner joins enforce the cascade).
    """
    s_view, s_click, s_buy = FUNNEL_STAGES
    within = F.expr(f"INTERVAL {FUNNEL_WINDOW_S} SECONDS")
    e = events.select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == s_view)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == s_click)
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + within)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == s_buy)
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + within)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = e.select("user_id").distinct()
    return (
        users.join(s1, "user_id", "left")
        .join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3, "user_id", "left")
    )


@query(
    "funnel_conversion",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type IN ('{FUNNEL_STAGES[0]}', '{FUNNEL_STAGES[1]}',
                           '{FUNNEL_STAGES[2]}')
    ),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM e
           WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_S} SECOND
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t2
             AND e.ts <= s2.t2 + INTERVAL {FUNNEL_WINDOW_S} SECOND
           GROUP BY e.user_id),
    j AS (
      SELECT u.user_id, s1.t1, s2.t2, s3.t3
      FROM (SELECT DISTINCT user_id FROM e) u
      LEFT JOIN s1 ON u.user_id = s1.user_id
      LEFT JOIN s2 ON u.user_id = s2.user_id
      LEFT JOIN s3 ON u.user_id = s3.user_id
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_users,
      CAST(count(t1) AS BIGINT) AS n_view,
      CAST(count(t2) AS BIGINT) AS n_view_click,
      CAST(count(t3) AS BIGINT) AS n_view_click_purchase,
      CASE WHEN count(t1) > 0
        THEN CAST(count(t2) AS DOUBLE) / CAST(count(t1) AS DOUBLE)
        ELSE 0.0 END AS click_conversion,
      CASE WHEN count(t2) > 0
        THEN CAST(count(t3) AS DOUBLE) / CAST(count(t2) AS DOUBLE)
        ELSE 0.0 END AS purchase_conversion
    FROM j
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stage counts + stage-to-stage conversion rates (1 row)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STAGES)
    )
    j = funnel_stage_times(events)
    agg = j.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
    )
    click_conv = F.when(
        F.col("n_view") > 0,
        F.col("n_view_click").cast("double") / F.col("n_view").cast("double"),
    ).otherwise(F.lit(0.0))
    buy_conv = F.when(
        F.col("n_view_click") > 0,
        F.col("n_view_click_purchase").cast("double")
        / F.col("n_view_click").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "*",
        click_conv.alias("click_conversion"),
        buy_conv.alias("purchase_conversion"),
    )


# ---------------------------------------------------------------------------
# Conversion latency (round-5 third session): the funnel-metric
# companion to `funnel_conversion` / `window_funnel_levels` — not
# WHETHER users convert but HOW FAST. Per event type pair
# (first 'view' -> first 'purchase'), the per-user latency reduces to
# two conditional MINs in ONE aggregate pass (no window, no join);
# the distribution summary is exact interpolated percentiles over the
# converted users' latencies.
# ---------------------------------------------------------------------------


@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
        MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_buy
      FROM events GROUP BY user_id
    ), lat AS (
      SELECT (t_buy - t_view) / 1000000.0 AS latency_s
      FROM per_user
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
      round(quantile_cont(latency_s, 0.5), 6) AS p50_s,
      round(quantile_cont(latency_s, 0.9), 6) AS p90_s,
      round(MIN(latency_s), 6) AS min_s,
      round(MAX(latency_s), 6) AS max_s
    FROM lat
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from a user's FIRST view to their FIRST purchase (when it
    follows): converted-user count and the latency distribution
    (median / p90 / extremes, seconds).

    One conditional-MIN aggregate per user (map-side combinable),
    then exact interpolated percentiles over the |converted users|
    latencies — the same percentile/quantile_cont parity convention
    as `quantity_percentiles`.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("t_buy"),
    )
    lat = per_user.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(
        ((F.col("t_buy") - F.col("t_view")) / 1_000_000.0).alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.min("latency_s"), 6).alias("min_s"),
        F.round(F.max("latency_s"), 6).alias("max_s"),
    )
