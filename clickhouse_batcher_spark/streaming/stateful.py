"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful processing at all (its worker holds only
the in-flight batch buffer, ``hashes.go:36``); this is the engine's
extension surface for arbitrary per-key streaming state — the pattern
to reach for when watermarked built-in aggregations can't express the
semantics (running totals exposed every batch, custom eviction,
session carry-over).

Scale: state lives in the executor state store, sharded by group key —
horizontal scaling with no driver involvement; state size is O(keys),
and a timeout (GroupStateTimeout) bounds it for churning key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "cnt BIGINT, total DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across
    micro-batches; emits the updated running totals for every user
    seen in each batch (update semantics)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cnt, total = state.get
        else:
            cnt, total = 0, 0.0
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [cnt], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming windowed funnel: the stateful-streaming face of
# operators/funnel.py. Per-user state carries the stage times
# (t1, t2, t3 as epoch micros); each micro-batch advances the cascade
# over its events in timestamp order. Matches the batch semantics
# exactly when per-user arrival is time-sliced (each batch's events
# are no earlier than the previous batch's) — the condition a
# watermarked, replayed source provides; a t1 arriving retroactively
# would require reprocessing, which is the batch operator's job.
# State is 3 longs per user — O(users), far below any event-count
# scale; emission is update-mode (latest cascade per user per batch),
# versioned so consumers can take the newest row per user.
# ---------------------------------------------------------------------------
FUNNEL_OUTPUT_SCHEMA = (
    "user_id BIGINT, t1_us BIGINT, t2_us BIGINT, t3_us BIGINT, "
    "version BIGINT"
)
FUNNEL_STATE_SCHEMA = "t1 BIGINT, t2 BIGINT, t3 BIGINT, version BIGINT"


def streaming_funnel(events: DataFrame, stages: tuple, window_s: int) -> DataFrame:
    """Per-user funnel stage times maintained across micro-batches."""
    s_view, s_click, s_buy = stages
    window_us = window_s * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t1, t2, t3, version = state.get if state.exists else (-1, -1, -1, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, etype in zip(pdf["ts"], pdf["event_type"]):
                us = int(ts.value // 1_000)  # pandas ns -> micros
                if etype == s_view and t1 < 0:
                    t1 = us
                elif (
                    etype == s_click
                    and t2 < 0
                    and t1 >= 0
                    and t1 < us <= t1 + window_us
                ):
                    t2 = us
                elif (
                    etype == s_buy
                    and t3 < 0
                    and t2 >= 0
                    and t2 < us <= t2 + window_us
                ):
                    t3 = us
        version += 1
        state.update((t1, t2, t3, version))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "t1_us": [t1],
                "t2_us": [t2],
                "t3_us": [t3],
                "version": [version],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
