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
             event_type FROM events
      WHERE event_type <> '{CONVERSION_TYPE}'
    ), pairs AS (
      SELECT p.pid, p.pval, t.tid, t.event_type,
        row_number() OVER (PARTITION BY p.pid
                           ORDER BY t.tts, t.tid) AS rn_first,
        row_number() OVER (PARTITION BY p.pid
                           ORDER BY t.tts DESC, t.tid DESC) AS rn_last,
        COUNT(t.tid) OVER (PARTITION BY p.pid) AS k
      FROM purch p LEFT JOIN touch t
        ON t.user_id = p.user_id
       AND t.tts < p.pts
       AND date_diff('second', t.tts, p.pts) <= {ATTR_WINDOW_SECS}
    ), credited AS (
      SELECT
        CASE WHEN tid IS NULL THEN 'organic' ELSE event_type END
          AS touch_type,
        m.model, pval,
        CASE
          WHEN tid IS NULL THEN CAST(1000000 AS BIGINT)
          WHEN m.model = 'first_touch' THEN
            CASE WHEN rn_first = 1 THEN CAST(1000000 AS BIGINT) END
          WHEN m.model = 'last_touch' THEN
            CASE WHEN rn_last = 1 THEN CAST(1000000 AS BIGINT) END
          ELSE CAST(1000000 // k AS BIGINT)
        END AS ppm
      FROM pairs
      CROSS JOIN (VALUES ('first_touch'), ('last_touch'), ('linear'))
        AS m(model)
    )
    SELECT model, touch_type,
      CAST(SUM(ppm) AS BIGINT) AS credits_ppm,
      round(CAST(SUM(pval * ppm) AS DOUBLE) / 1000000, 4)
        AS credited_value
    FROM credited WHERE ppm IS NOT NULL
    GROUP BY 1, 2
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
    value x ppm with ONE final double division.

    Plan shape (audited): purchases LEFT-join touches with the window
    cut in the ON clause — unmatched purchases ARE the organic rows,
    so no anti-join branch — and all three models come from one
    3-way explode over the single pair frame: events is scanned
    exactly twice (purchase side + touch side), vs 9 scans for the
    naive 4-way UNION formulation. The pair join shuffles once on
    user_id (pairs bounded by one user's 72h activity); per-purchase
    windows partition by purchase id; the rollup is |models| x |touch
    types| rows.
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
        F.col("event_type").alias("ttype"),
    )
    cond = (
        (purch["user_id"] == touch["user_id"])
        & (touch["tts"] < purch["pts"])
        & (
            F.unix_timestamp(purch["pts"]) - F.unix_timestamp(touch["tts"])
            <= ATTR_WINDOW_SECS
        )
    )
    wp = Window.partitionBy("pid")
    pairs = (
        purch.join(touch, cond, "left")
        .drop(touch["user_id"])
        .select(
            "pid",
            "pval",
            "tid",
            "ttype",
            F.row_number()
            .over(wp.orderBy(F.col("tts").asc_nulls_last(), F.col("tid")))
            .alias("rn_first"),
            F.row_number()
            .over(
                wp.orderBy(
                    F.col("tts").desc_nulls_last(), F.col("tid").desc()
                )
            )
            .alias("rn_last"),
            F.count("tid").over(wp).alias("k"),
        )
    )
    models = F.array(
        F.lit("first_touch"), F.lit("last_touch"), F.lit("linear")
    )
    credited = pairs.select(
        F.when(F.col("tid").isNull(), "organic")
        .otherwise(F.col("ttype"))
        .alias("touch_type"),
        "pval",
        "rn_first",
        "rn_last",
        "k",
        F.col("tid").isNull().alias("organic"),
        F.explode(models).alias("model"),
    ).select(
        "model",
        "touch_type",
        "pval",
        F.when(F.col("organic"), F.lit(1000000).cast("bigint"))
        .when(
            F.col("model") == "first_touch",
            F.when(F.col("rn_first") == 1, F.lit(1000000).cast("bigint")),
        )
        .when(
            F.col("model") == "last_touch",
            F.when(F.col("rn_last") == 1, F.lit(1000000).cast("bigint")),
        )
        .otherwise(F.expr("CAST(1000000 DIV k AS BIGINT)"))
        .alias("ppm"),
    ).filter(F.col("ppm").isNotNull())
    return credited.groupBy("model", "touch_type").agg(
        F.sum("ppm").cast("bigint").alias("credits_ppm"),
        F.round(
            F.sum(F.col("pval") * F.col("ppm")).cast("double") / 1000000, 4
        ).alias("credited_value"),
    )
