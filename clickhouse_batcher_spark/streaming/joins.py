"""Streaming joins: stream-static enrichment and stream-stream
interval joins.

- **stream-static**: each micro-batch joins against a batch dimension
  — the standard enrichment step between ingest and sink. The static
  side is AQE-broadcast per batch while it fits (opt-in hint for dims
  bounded by construction); no streaming state is needed.
- **stream-stream**: both sides buffered in the state store, bounded
  by watermarks + an event-time range condition; without the range
  bound the state would grow forever. Spark co-partitions both sides
  by the equi key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    dim_cols: list[str],
    hint_broadcast: bool = False,
) -> DataFrame:
    """Stream-static left join: events keep flowing even when the dim
    has no match (nulls, not drops).

    The dim side is UNHINTED by default — ``dim`` is caller-provided
    and may scale with the data (a forced broadcast of an O(SF) dim
    OOMs at 100 TB; AQE broadcasts it per micro-batch while it fits).
    Callers that know the dim is bounded by construction can pass
    ``hint_broadcast=True`` to skip the stats check."""
    projected = dim.select(dim_key, *dim_cols)
    dim_small = F.broadcast(projected) if hint_broadcast else projected
    return events.join(
        dim_small, events[stream_key] == dim_small[dim_key], "left"
    ).drop(dim_key)


def interval_self_join(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    within: str = "10 minutes",
) -> DataFrame:
    """Stream-stream self-join: pairs of events from the same key
    within ``within`` of each other (e.g. click->purchase funnels).
    Both sides watermarked; the interval condition bounds state."""
    left = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("event_id").alias("l_event_id"),
            F.col(ts_col).alias("l_ts"),
            F.col("event_type").alias("l_type"),
        )
    )
    right = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col("event_id").alias("r_event_id"),
            F.col(ts_col).alias("r_ts"),
            F.col("event_type").alias("r_type"),
        )
    )
    return left.join(
        right,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("l_event_id") < F.col("r_event_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )
