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


# ---------------------------------------------------------------------------
# Multi-model attribution comparison (first / last / linear touch)
# ---------------------------------------------------------------------------
@query(
    "attribution_model_comparison",
    oracle=f"""
    WITH purch AS (
      SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts,
             CAST(round(value, 6) AS DECIMAL(27,6)) AS pval
      FROM events WHERE event_type = '{CONVERSION_TYPE}'
    ), touch AS (
      SELECT user_id, event_id AS tid, CAST(ts AS TIMESTAMP) AS tts,
             event_type AS touch_type
      FROM events WHERE event_type <> '{CONVERSION_TYPE}'
    ), pairs AS (
      SELECT p.pid, p.pval, t.touch_type,
        row_number() OVER (PARTITION BY p.pid
                           ORDER BY t.tts, t.tid) AS rn_first,
        row_number() OVER (PARTITION BY p.pid
                           ORDER BY t.tts DESC, t.tid DESC) AS rn_last,
        COUNT(*) OVER (PARTITION BY p.pid) AS k
      FROM purch p JOIN touch t
        ON t.user_id = p.user_id
       AND t.tts < p.pts
       AND date_diff('second', t.tts, p.pts) <= {ATTR_WINDOW_SECS}
    ), credited AS (
      SELECT 'first_touch' AS model, touch_type,
             CAST(1000000 AS BIGINT) AS ppm, pval
      FROM pairs WHERE rn_first = 1
      UNION ALL
      SELECT 'last_touch', touch_type, CAST(1000000 AS BIGINT), pval
      FROM pairs WHERE rn_last = 1
      UNION ALL
      SELECT 'linear', touch_type,
             CAST(1000000 // k AS BIGINT), pval
      FROM pairs
      UNION ALL
      SELECT m.model, 'organic', CAST(1000000 AS BIGINT), o.pval
      FROM (
        SELECT p.pid, p.pval FROM purch p
        WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.pid = p.pid)
      ) o
      CROSS JOIN (VALUES ('first_touch'), ('last_touch'), ('linear'))
        AS m(model)
    )
    SELECT model, touch_type,
      CAST(SUM(ppm) AS BIGINT) AS credits_ppm,
      round(CAST(SUM(pval * ppm) AS DOUBLE) / 1000000, 4)
        AS credited_value
    FROM credited GROUP BY 1, 2
    """,
)
def attribution_model_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch vs linear multi-touch attribution of
    purchase credit over the same 72h window — the model-sensitivity
    audit run before anyone trusts a single attribution number
    (`purchase_attribution` is the production last-touch path; this
    operator quantifies how much the answer MOVES under the other two
    standard models).

    Credit is integer ppm per purchase (1e6 for first/last; 1e6 div k
    per in-window touch for linear — truncating, so both engines agree
    to the ppm), and credited value is an exact decimal sum of
    value x ppm with ONE final double division. Purchases with no
    in-window touch credit 'organic' under every model.

    Scale: the purchase-touch pair join shuffles once on user_id with
    the window cut as a join-time filter (pairs bounded by one user's
    72h activity); the per-purchase windows partition by purchase id;
    the rollup is |models| x |touch types| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == CONVERSION_TYPE).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.round("value", 6).cast("decimal(27,6)").alias("pval"),
    )
    touch = ev.filter(F.col("event_type") != CONVERSION_TYPE).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = purch.join(touch, "user_id").filter(
        (F.col("tts") < F.col("pts"))
        & (
            F.unix_timestamp("pts") - F.unix_timestamp("tts")
            <= ATTR_WINDOW_SECS
        )
    )
    wp = Window.partitionBy("pid")
    pairs = pairs.select(
        "pid",
        "pval",
        "touch_type",
        F.row_number()
        .over(wp.orderBy(F.col("tts"), F.col("tid")))
        .alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.col("tts").desc(), F.col("tid").desc()))
        .alias("rn_last"),
        F.count(F.lit(1)).over(wp).alias("k"),
    )
    first = pairs.filter(F.col("rn_first") == 1).select(
        F.lit("first_touch").alias("model"),
        "touch_type",
        F.lit(1000000).cast("bigint").alias("ppm"),
        "pval",
    )
    last = pairs.filter(F.col("rn_last") == 1).select(
        F.lit("last_touch").alias("model"),
        "touch_type",
        F.lit(1000000).cast("bigint").alias("ppm"),
        "pval",
    )
    linear = pairs.select(
        F.lit("linear").alias("model"),
        "touch_type",
        F.expr("CAST(1000000 DIV k AS BIGINT)").alias("ppm"),
        "pval",
    )
    organic_base = purch.join(
        pairs.select("pid").distinct(), "pid", "left_anti"
    ).select("pval")
    models = spark.createDataFrame(
        [("first_touch",), ("last_touch",), ("linear",)], "model STRING"
    )
    organic = organic_base.crossJoin(F.broadcast(models)).select(
        "model",
        F.lit("organic").alias("touch_type"),
        F.lit(1000000).cast("bigint").alias("ppm"),
        "pval",
    )
    credited = first.unionAll(last).unionAll(linear).unionAll(organic)
    return credited.groupBy("model", "touch_type").agg(
        F.sum("ppm").cast("bigint").alias("credits_ppm"),
        F.round(
            F.sum(F.col("pval") * F.col("ppm")).cast("double") / 1000000, 4
        ).alias("credited_value"),
    )
