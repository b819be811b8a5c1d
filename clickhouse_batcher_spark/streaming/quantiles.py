"""Continuous quantiles: mergeable histogram-bin state + pure
rank finalize.

The continuous-aggregate pattern (the streaming face of
`operators/sketch.py`'s `quantile_state_merge_daily`, which proves the
same mergeability day-by-day in batch): each micro-batch contributes
per-(event_type, unit-bin) integer counts; counts ADD exactly, so any
micro-batch slicing folds to the same state; total-period
p50/p90/p99 are a pure finalize over the merged state under the same
integer ceil-rank rule as the batch operator. Stream == batch
equivalence is asserted in tests/test_streaming.py.

State size is (types x value-range) rows — independent of event
volume, the right shape for a live latency/value dashboard at
100 TB/day ingest. For an unbounded value domain, clamp or log-scale
the bin function; the rank rule is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partial_bin_counts(df: DataFrame) -> DataFrame:
    """Per-micro-batch mergeable state: integer counts by
    (event_type, floor(value) bin). Map-side combined."""
    return df.groupBy(
        "event_type", F.floor("value").cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def merge_bin_counts(states: DataFrame) -> DataFrame:
    """Merge partial states: integer bin counts add exactly."""
    return states.groupBy("event_type", "bin").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def finalize_quantiles(state: DataFrame) -> DataFrame:
    """Pure finalize: p50/p90/p99 bins from the merged histogram
    state — the identical ceil-rank rule (r_q = (q*n + 99) div 100,
    answer = smallest bin whose cumulative count reaches r_q) as
    `quantile_state_merge_daily`; the cumulative window runs over the
    bounded bin frame."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = state.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    rank = lambda qq: F.expr(f"({qq} * n + 99) DIV 100")  # noqa: E731
    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        *[
            F.min(F.when(F.col("cc") >= rank(qq), F.col("bin")))
            .cast("bigint")
            .alias(f"p{qq}_bin")
            for qq in (50, 90, 99)
        ],
    )
