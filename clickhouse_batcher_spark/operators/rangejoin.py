"""Range join — the scale-safe bucketized formulation.

A naive range join (``a.ts BETWEEN b.start AND b.end``) has no equi
key, so Spark plans a BroadcastNestedLoopJoin — O(n*m) and a
wall-clock disaster beyond toy sizes. The standard fix: quantize the
range dimension into buckets, explode each interval over the buckets
it covers, equi-join on ``(key, bucket)``, then re-apply the exact
range predicate. Candidate pairs shrink from n*m to only same-bucket
pairs; the shuffle is a plain hash join.

Bucket width trades shuffle fan-out (intervals explode over
``len/width`` buckets) against candidate precision — pick ~the median
interval length. All arithmetic is integer epoch-seconds, so the
DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec_sum
from clickhouse_batcher_spark.tables import load_table

BUCKET_SECONDS = 86_400  # 1 day buckets for order-date ranges
RANGE_DAYS = 7


def bucketize_point(ts: Column, width_s: int) -> Column:
    # TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) cannot cast to long
    # directly; hop through TIMESTAMP (session TZ pinned to UTC).
    secs = ts.cast("timestamp").cast("long")
    return (secs / width_s).cast("long")  # floor for positive epochs


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    width_s: int,
) -> DataFrame:
    """points ⋈ intervals ON key AND start <= ts <= end, via buckets."""
    p = points.withColumn("_bucket", bucketize_point(F.col(point_ts), width_s))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                bucketize_point(F.col(start_ts), width_s),
                bucketize_point(F.col(end_ts), width_s),
            )
        ),
    )
    joined = p.join(
        i,
        (F.col(point_key) == F.col(interval_key)) & (p["_bucket"] == i["_bucket"]),
    )
    return joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    ).drop("_bucket")


@query(
    "range_join_orders_window",
    oracle=f"""
    SELECT o_orderkey, COUNT(*) AS n_lineitems,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL {RANGE_DAYS} DAY
    GROUP BY o_orderkey
    """,
)
def range_join_orders_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped within {RANGE_DAYS} days of their order's date:
    an equi+range join. The equi key does the heavy lifting; the range
    predicate filters; bucketing keeps the plan an equi-join even if
    the equi key were absent (exercised via range_join_bucketed)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    end = F.col("o_orderdate") + F.expr(f"INTERVAL {RANGE_DAYS} DAY")
    intervals = orders.withColumn("end_ts", end)
    joined = range_join_bucketed(
        li,
        intervals,
        point_key="l_orderkey",
        interval_key="o_orderkey",
        point_ts="l_shipdate",
        start_ts="o_orderdate",
        end_ts="end_ts",
        width_s=BUCKET_SECONDS,
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        dec_sum("l_extendedprice", "total_price"),
    )


# ---------------------------------------------------------------------------
# Hierarchical time rollup: day aggregates DERIVED FROM hour aggregates
# (incremental re-aggregation — the hypertable/continuous-aggregate
# pattern: at 100 TB the day rollup reads the hour rollup, ~24x less
# data than the raw table; decimal sums make re-aggregation exact).
# ---------------------------------------------------------------------------
@query(
    "events_rollup_hierarchy",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts, event_type,
             COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(27,6))) AS val
      FROM events GROUP BY 1, 2
    ), daily AS (
      SELECT date_trunc('day', bucket_ts) AS bucket_ts, event_type,
             CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(val) AS val
      FROM hourly GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, bucket_ts, event_type, cnt,
           CAST(val AS DOUBLE) AS total_value FROM hourly
    UNION ALL
    SELECT 'day' AS grain, bucket_ts, event_type, cnt,
           CAST(val AS DOUBLE) AS total_value FROM daily
    """,
)
def events_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_batcher_spark.functions import dec

    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec("value")).alias("val"))
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "bucket_ts").alias("bucket_ts"), "event_type"
        )
        .agg(F.sum("cnt").alias("cnt"), F.sum("val").alias("val"))
    )
    h = hourly.select(
        F.lit("hour").alias("grain"),
        "bucket_ts",
        "event_type",
        "cnt",
        F.col("val").cast("double").alias("total_value"),
    )
    d = daily.select(
        F.lit("day").alias("grain"),
        "bucket_ts",
        "event_type",
        "cnt",
        F.col("val").cast("double").alias("total_value"),
    )
    return h.unionByName(d)
