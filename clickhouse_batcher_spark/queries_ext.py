"""Extended core SQL surface: cube, pivot, analytic windows, global
top-N, JSON/scalar functions, exact percentiles, approximate distinct.

Same determinism rules as ``queries.py``: decimal-routed float sums,
total-ordered rankings, identical aliases both sides. The approximate
operator (HLL distinct) is rows-only — its whole point is
engine-specific sketching — with an error-bound test in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec, dec_sum
from clickhouse_batcher_spark.tables import load_table


# ---------------------------------------------------------------------------
# CUBE over derived columns
# ---------------------------------------------------------------------------
@query(
    "events_cube",
    oracle="""
    SELECT event_type, CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INT)
             AS hour_of_day,
           COUNT(*) AS cnt
    FROM events
    GROUP BY CUBE(event_type, CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INT))
    """,
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    )
    return events.cube("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# Pivot (oracle via FILTERed aggregates — the portable formulation)
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_pivot_by_type",
    oracle=f"""
    SELECT user_id,
      {", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
        for t in _EVENT_TYPES
      )}
    FROM events GROUP BY user_id
    """,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# Analytic windows: lag / lead / rank / running (exact) sum
# ---------------------------------------------------------------------------
@query(
    "events_analytics_window",
    oracle="""
    SELECT event_id, user_id, value,
      lag(value) OVER w AS prev_value,
      lead(value) OVER w AS next_value,
      CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
           AS BIGINT) AS value_rank,
      CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER
           (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def events_analytics_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    running = (
        F.sum(dec("value"))
        .over(w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w_time).alias("prev_value"),
        F.lead("value").over(w_time).alias("next_value"),
        F.rank().over(w_rank).cast("bigint").alias("value_rank"),
        running.alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Global top-N (orderBy + limit with total order)
# ---------------------------------------------------------------------------
@query(
    "top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# JSON + scalar function showcase
# ---------------------------------------------------------------------------
@query(
    "events_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           upper(event_type) AS type_uc,
           CAST(date_part('year', CAST(ts AS TIMESTAMP)) AS INT) AS y,
           CAST(date_part('month', CAST(ts AS TIMESTAMP)) AS INT) AS m,
           round(abs(value - 100.0), 2) AS dist_from_100
    FROM events
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.upper("event_type").alias("type_uc"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.round(F.abs(F.col("value") - 100.0), 2).alias("dist_from_100"),
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (both engines: linear interpolation)
# ---------------------------------------------------------------------------
@query(
    "quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS p50,
      quantile_cont(l_quantity, 0.9) AS p90,
      quantile_cont(l_quantity, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.expr("percentile(l_quantity, 0.99)").alias("p99"),
    )


