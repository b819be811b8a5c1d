"""Continuous anomaly detection: mergeable hourly-total state +
pure z-score finalize.

The continuous-aggregate pattern (streaming face of
operators/rollup.py) applied to operators/timeseries.py's anomaly
report: each micro-batch contributes a per-(hour, type) DECIMAL
partial total; partials merge exactly (decimal addition is
order-independent, so which micro-batch slicing produced them is
unobservable); the z-score report is a pure finalize over the merged
state. Batch equivalence — streamed partials merged then finalized
== the one-shot batch operator — is asserted in
tests/test_streaming.py.

State size is (hours x types), independent of event volume: the
right shape for a dashboard refresh loop at 100 TB/day ingest. For
bounded state in an unbounded stream, age out hours beyond the
z-baseline horizon before merging (the finalize only needs the
hours you still want scored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_batcher_spark.functions import dec
from clickhouse_batcher_spark.operators.timeseries import (
    anomalies_from_hourly,
)


def partial_hourly_totals(df: DataFrame) -> DataFrame:
    """Per-micro-batch mergeable state: exact decimal value totals by
    (hour, event_type). Map-side combined; (hours x types) rows out."""
    return df.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.sum(dec("value")).cast("decimal(27,6)").alias("tot"))


def merge_hourly_totals(states: DataFrame) -> DataFrame:
    """Merge partial states: decimal sums add exactly, so any
    micro-batch slicing folds to the same state."""
    return states.groupBy("h", "event_type").agg(
        F.sum("tot").cast("decimal(27,6)").alias("tot")
    )


def finalize_anomalies(state: DataFrame) -> DataFrame:
    """Pure finalize: z-score report from the merged hourly state."""
    return anomalies_from_hourly(state)
