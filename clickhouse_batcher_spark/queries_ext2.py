"""Third coverage batch: union, grouping sets, deterministic
collection aggregates, and batch sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec_sum
from clickhouse_batcher_spark.tables import load_table


# ---------------------------------------------------------------------------
# UNION ALL (multiset union preserved exactly)
# ---------------------------------------------------------------------------
@query(
    "union_event_slices",
    oracle="""
    SELECT user_id, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, value FROM events WHERE value > 150.0
    """,
)
def union_event_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "value")
    big = events.filter(F.col("value") > 150.0).select("user_id", "value")
    return clicks.unionByName(big)


# ---------------------------------------------------------------------------
# GROUPING SETS (finer than rollup/cube)
# ---------------------------------------------------------------------------
@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Deterministic collection aggregate (sorted, joined to a string)
# ---------------------------------------------------------------------------
@query(
    "user_event_type_profile",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
    FROM events GROUP BY user_id
    """,
)
def user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types")
    )


# ---------------------------------------------------------------------------
# Batch sessionization: lag + gap-flag + running session index
# ---------------------------------------------------------------------------
SESSION_GAP_MIN = 30


@query(
    "user_sessions",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL THEN 1
             WHEN date_diff('second', lag(ts) OVER w, ts)
                  > {SESSION_GAP_MIN * 60} THEN 1
             ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    )
    flagged = events.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_s > SESSION_GAP_MIN * 60, 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Unpivot (wide -> long): stack() in Spark, UNION ALL oracle
# ---------------------------------------------------------------------------
@query(
    "customer_unpivot_measures",
    oracle="""
    SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def customer_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        " AS (measure, value)",
    )


# ---------------------------------------------------------------------------
# SCD2 history build: versioned rows with validity ranges from a
# change log (the events stream as a change feed per user).
# ---------------------------------------------------------------------------
# Open-ended (current) versions carry an end-of-time sentinel instead
# of NULL: NULL timestamps hit engine/pandas NaT comparison quirks in
# value hashing, and the sentinel is the conventional SCD2 encoding
# anyway.
_SCD2_EOT = "2200-01-01 00:00:00"  # within datetime64[ns] range (max 2262)


@query(
    "scd2_user_value_history",
    oracle=f"""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS valid_from,
      COALESCE(lead(CAST(ts AS TIMESTAMP)) OVER w, TIMESTAMP '{_SCD2_EOT}')
        AS valid_to,
      value,
      CASE WHEN lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL
           THEN 1 ELSE 0 END AS is_current
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    next_ts = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.coalesce(next_ts, F.lit(_SCD2_EOT).cast("timestamp")).alias("valid_to"),
        "value",
        F.when(next_ts.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill: every (hour, event_type) cell in the observed
# range, zero-filled where no events landed. The hour spine is a
# sequence explode from the global min/max (one tiny agg, broadcast
# cross join with the type dimension); counts left-join onto the spine.
# ---------------------------------------------------------------------------
@query(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type, COALESCE(c.cnt, 0) AS cnt
    FROM spine s CROSS JOIN types t
    LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Gap-fill with linear interpolation: the time-series repair operator.
# Where the zero-fill above treats a missing hour as "count 0", the
# value series needs the neighboring observations: interior gaps get
# the linear blend of the previous/next observed hourly average,
# edge gaps extend the nearest observation. Window machinery is
# last_value/first_value IGNORE NULLS over the spine — identical
# semantics in Spark and DuckDB.
#
# Determinism: observed hourly averages are decimal-sum based
# (dec_avg pattern); the interpolation is prev + (next - prev) * frac
# where frac divides hour-aligned epoch-second integers — a fixed
# 3-op IEEE sequence both engines execute identically.
#
# Scale: the spine is (hours x types) — tiny; the only data-sized
# shuffle is the hourly aggregation, map-side combined. Windows run
# per event_type over the spine, not over raw events.
# ---------------------------------------------------------------------------
@query(
    "events_hourly_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT s.hour, t.event_type, h.cnt, h.v
      FROM spine s CROSS JOIN types t
      LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
    ), nb AS (
      SELECT hour, event_type, cnt, v,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid
    )
    SELECT hour, event_type,
      CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt,
      v IS NOT NULL AS is_observed,
      CASE
        WHEN v IS NOT NULL THEN v
        WHEN pv IS NULL THEN nv
        WHEN nv IS NULL THEN pv
        ELSE pv + (nv - pv) *
          (CAST(CAST(epoch(hour) AS BIGINT) - CAST(epoch(ph) AS BIGINT)
                AS DOUBLE)
           / CAST(CAST(epoch(nh) AS BIGINT) - CAST(epoch(ph) AS BIGINT)
                  AS DOUBLE))
      END AS avg_value
    FROM nb
    """,
)
def events_hourly_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from clickhouse_batcher_spark.functions import dec

    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum(dec("value")).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("v"),
    )
    grid = (
        spine.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
    )
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    nb = grid.select(
        "hour",
        "event_type",
        "cnt",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.last(obs_hour, ignorenulls=True).over(w_back).alias("ph"),
        F.first(obs_hour, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return nb.select(
        "hour",
        "event_type",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        F.col("v").isNotNull().alias("is_observed"),
        interp.alias("avg_value"),
    )
