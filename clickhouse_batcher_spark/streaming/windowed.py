"""Event-time windowed aggregation over the ingest stream.

The reference has no event-time concept (processing-time flushes
only, ``hashes.go:38-45``); this module is the engine's extension
surface for it: watermarked tumbling/sliding windows and session
windows over a streaming source — the standard Structured Streaming
state-store operators, which shard state by group key across
executors (scales horizontally; no driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding) windowed count+sum with late-data bound.

    The watermark bounds state: groups older than max(event time) -
    watermark are finalized and evicted, so state size is O(active
    windows), not O(stream length) — the property that keeps this
    runnable forever at 100 TB/day.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on ingest: first occurrence of each key
    wins; duplicates arriving within the watermark horizon are dropped.

    State is one entry per key inside the horizon, sharded by key
    across executors — the watermark bounds it, which is what makes
    dedup-on-ingest feasible forever at 100 TB/day (an unbounded
    dropDuplicates would accumulate state for every key ever seen).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def ohlc_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Continuous OHLC bars: the streaming form of
    ``operators.chagg.events_ohlc_hourly``.

    min_by/max_by with a (ts, event_id) struct ordering key are
    mergeable aggregates, so each micro-batch folds into per-window
    state and the finalized bar is identical to a batch recompute over
    the same data (test_streaming asserts this equivalence). State is
    one row per (window, type) inside the watermark horizon — bounded
    forever, like every aggregate in this module.
    """
    ordkey = F.struct(ts_col, "event_id")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *group_cols)
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def hll_stream(
    events: DataFrame,
    key_col: str = "user_id",
    group_cols: tuple[str, ...] = ("event_type",),
    m: int = 256,
) -> DataFrame:
    """Streaming HyperLogLog state: per group, the per-register max-rho
    table of ``operators.sketch.hll_distinct_users`` maintained by
    Structured Streaming.

    MAX is a mergeable aggregate, so each micro-batch folds its rows
    into at most ``m`` state entries per group and the finalized
    registers equal a batch recompute over the same data exactly (the
    batch-equivalence test asserts this; the estimate is then pure
    arithmetic over the registers). State is m rows per group forever —
    the sketch's whole point: streaming COUNT(DISTINCT) at 100 TB/day
    costs m*groups state instead of one entry per key ever seen.
    """
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit("hll:"), F.col(key_col).cast("string")), 256),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        events.select(*group_cols, h.alias("hash"))
        .select(
            *group_cols,
            (F.col("hash") % m).alias("register"),
            F.expr(
                f"CASE WHEN hash div {m} = 0 THEN 53 "
                f"ELSE 53 - length(bin(hash div {m})) END"
            ).alias("rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(registers: DataFrame, group_cols: tuple[str, ...] = ("event_type",), m: int = 256) -> DataFrame:
    """Finish a register table (streamed or batch) into cardinality
    estimates — the same integer-exact harmonic-sum arithmetic as
    ``operators.sketch.hll_distinct_users``, so a streamed sketch and
    the batch query agree wherever their registers agree."""
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("registers_hit"),
        F.sum(F.expr("shiftleft(1L, cast(53 - mj AS INT))"))
        .cast("bigint")
        .alias("s_obs"),
    )
    s_scaled = (
        F.col("s_obs") + (F.lit(m) - F.col("registers_hit")) * F.lit(1 << 53)
    )
    raw = F.lit(4.2399330249068963e20) / s_scaled.cast("double")
    small = (raw <= F.lit(2.5 * m)) & (F.col("registers_hit") < F.lit(m))
    lin = F.round(
        F.lit(float(m))
        * F.log(F.lit(float(m)) / (F.lit(m) - F.col("registers_hit"))),
        6,
    )
    return agg.select(
        *group_cols,
        "registers_hit",
        F.when(small, lin).otherwise(raw).alias("hll_estimate"),
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key streaming deduplication with bounded state
    (``dropDuplicatesWithinWatermark``).

    The state store keeps one entry per key seen within the watermark
    horizon and evicts entries once the watermark passes them — state
    is O(keys per horizon), not O(stream length), which is what makes
    continuous dedup of a 100 TB/day feed feasible. Contrast with
    ``dropDuplicates`` on a stream, whose state grows forever.

    Guarantee: duplicates arriving within the watermark delay of the
    first occurrence are ALWAYS dropped; duplicates arriving later than
    the delay may be re-emitted (the documented semantics — pick the
    delay from the feed's real redelivery bound, e.g. the source's
    max replay window).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def cms_stream(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming Count-Min Sketch state: the (hash_row, bucket) counter
    table of ``operators.sketch`` maintained by Structured Streaming.

    SUM is a mergeable aggregate, so each micro-batch folds its rows
    into at most CMS_DEPTH x CMS_WIDTH state entries and the finalized
    counters equal a batch recompute exactly (asserted by the
    batch-equivalence test). Point estimates (min over the depth rows
    of a key's bucket counters) never undercount — the CMS guarantee —
    and state is a fixed 4x64 grid forever: streaming frequency
    tracking at 100 TB/day costs O(1) state, not one counter per key.

    The per-event fan-out is CMS_DEPTH rows BEFORE the aggregation,
    but map-side partial aggregation collapses them to the grid within
    each task, so only ≤ DEPTH*WIDTH rows per partition cross the wire.
    """
    from clickhouse_batcher_spark.operators.sketch import CMS_DEPTH, _bucket

    rows = events.select(
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row_id"),
        F.col(key_col).cast("string").alias("k"),
    )
    bucketed = rows.select(
        "row_id",
        F.when(F.col("row_id") == 0, _bucket(F.col("k"), "cms0|"))
        .when(F.col("row_id") == 1, _bucket(F.col("k"), "cms1|"))
        .when(F.col("row_id") == 2, _bucket(F.col("k"), "cms2|"))
        .otherwise(_bucket(F.col("k"), "cms3|"))
        .alias("bucket"),
    )
    return bucketed.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
