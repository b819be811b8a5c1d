"""Incremental rollup maintenance (materialized-view merge pattern).

A 100-TB pipeline never recomputes a daily rollup from raw events; it
keeps per-partition *partial aggregate states* and folds new data in
(the ClickHouse ``SummingMergeTree`` / materialized-view pattern, and
TimescaleDB's continuous aggregates). The relational requirement is
that the aggregate state is **mergeable**: ``merge(agg(A), agg(B)) ==
agg(A union B)``. Counts merge by sum; value sums merge exactly
because they are carried as DECIMAL(27,6) partials (``functions.dec``)
— double partials would make the merged result depend on which split
produced them.

``incremental_rollup_events`` demonstrates the full cycle: the
"existing" rollup state is built from events before ``SPLIT_DAY``,
the "arriving" increment from the rest, and the published rollup is
the merge. Its oracle is the *direct full recompute* — the equality
IS the mergeability proof, checked value-exact by the driver.

Scale: each partial aggregation is map-side-combined before its
shuffle, and the merge shuffles only rollup-key rows (days x types —
tiny). At 100 TB the "old" side is the stored state table (never
rescanned in production; scanned here only to construct the
demonstration), so maintaining the rollup costs one pass over the
increment alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec
from clickhouse_batcher_spark.tables import load_table

SPLIT_DAY = "2024-01-20"  # events before this day = existing state


def partial_rollup(events: DataFrame) -> DataFrame:
    """Mergeable per-(day, event_type) aggregate state.

    ``sum_state`` stays DECIMAL — the exact, order-independent carrier
    for the value sum; ``cnt`` merges by addition.
    """
    return (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("value")).alias("sum_state"),
        )
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Fold partial states into the published rollup (exact merge)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return (
        merged.groupBy("day", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_state").cast("double").alias("sum_value"),
        )
        .select("day", "event_type", "cnt", "sum_value")
    )


@query(
    "incremental_rollup_events",
    oracle="""
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged old-state + increment rollup == full recompute (oracle)."""
    events = load_table(spark, sf_dir, "events")
    split = F.lit(SPLIT_DAY).cast("date")
    old_state = partial_rollup(events.filter(F.to_date("ts") < split))
    increment = partial_rollup(events.filter(F.to_date("ts") >= split))
    return merge_rollups(old_state, increment)
