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
