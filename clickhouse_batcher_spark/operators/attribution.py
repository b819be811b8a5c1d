"""Last-touch conversion attribution over per-user event sequences.

The marketing-analytics staple: credit each purchase to the user's
most recent non-purchase touch within an attribution window, else
'organic'. Expressed as one pass of IGNORE-NULLS window functions —
no self-join, no per-user collect:

- ``last_value(touch IGNORE NULLS) OVER (... ROWS UNBOUNDED
  PRECEDING .. 1 PRECEDING)`` carries the latest prior touch past any
  run of intervening purchases;
- the attribution-window cut compares *integer epoch seconds*
  (timestamp casts floor to whole seconds identically in Spark and
  DuckDB), so the in/out-of-window decision is deterministic;
- credited value is an exact decimal sum; the average
  time-to-convert is one IEEE division of two exact integers.

Scale shape: one shuffle on user_id for the window sort (the
sessionization assumption: one user's events fit an executor), then
a map-side-combined groupBy down to |touch types| rows. At 100 TB
this is strictly cheaper than the as-of-join formulation (asof.py),
which would re-shuffle both the purchases and the touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec
from clickhouse_batcher_spark.tables import load_table

ATTR_WINDOW_SECS = 72 * 3600  # touches older than this are 'organic'
CONVERSION_TYPE = "purchase"


@query(
    "purchase_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
        last_value(CASE WHEN event_type <> '{CONVERSION_TYPE}'
                        THEN event_type END IGNORE NULLS)
          OVER w AS touch_type,
        last_value(CASE WHEN event_type <> '{CONVERSION_TYPE}'
                        THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
          OVER w AS touch_ts
      FROM events
      WINDOW w AS (
        PARTITION BY user_id
        ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
      SELECT
        CASE WHEN touch_ts IS NOT NULL
              AND date_diff('second', touch_ts, ts) <= {ATTR_WINDOW_SECS}
             THEN touch_type ELSE 'organic' END AS touch_type,
        value,
        CASE WHEN touch_ts IS NOT NULL
              AND date_diff('second', touch_ts, ts) <= {ATTR_WINDOW_SECS}
             THEN date_diff('second', touch_ts, ts) END AS secs
      FROM seq WHERE event_type = '{CONVERSION_TYPE}'
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
             AS attributed_value,
           CASE WHEN count(secs) > 0
                THEN CAST(SUM(secs) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           END AS avg_secs_to_touch
    FROM p GROUP BY 1
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases credited to the last non-purchase touch within
    ATTR_WINDOW_SECS; |touch types|+1 rows out."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type") != CONVERSION_TYPE
    seq = events.select(
        "event_type",
        "value",
        "ts",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    ).filter(F.col("event_type") == CONVERSION_TYPE)
    secs_raw = F.col("ts").cast("long") - F.col("touch_ts").cast("long")
    in_window = F.col("touch_ts").isNotNull() & (
        secs_raw <= ATTR_WINDOW_SECS
    )
    p = seq.select(
        F.when(in_window, F.col("touch_type"))
        .otherwise(F.lit("organic"))
        .alias("touch_type"),
        "value",
        F.when(in_window, secs_raw).alias("secs"),
    )
    return p.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(dec("value")).cast("double").alias("attributed_value"),
        F.when(
            F.count("secs") > 0,
            F.sum("secs").cast("double")
            / F.count(F.lit(1)).cast("double"),
        ).alias("avg_secs_to_touch"),
    )
