"""Property-based tests (hypothesis) for engine invariants.

The reference has no property tests (SURVEY §5); these cover the
engine's core guarantees: exact order-independent aggregation,
exactly-once sink delivery under arbitrary replay schedules, and
upsert algebra.

Spark jobs per example are expensive — example counts are small and
inputs are shrunk aggressively; the properties, not the volume, carry
the value.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from clickhouse_batcher_spark.functions import dec_sum
from clickhouse_batcher_spark.operators.merge import merge_upsert
from clickhouse_batcher_spark.sinks.parquet_sink import IdempotentParquetSink

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

money = st.decimals(
    min_value=Decimal("-999999.99"),
    max_value=Decimal("999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@given(values=st.lists(money, min_size=1, max_size=60), parts=st.integers(1, 8))
@settings(**SETTINGS)
def test_dec_sum_exact_and_partition_independent(spark, values, parts):
    """dec_sum == exact Decimal sum, for ANY partitioning of the data."""
    rows = [(float(v),) for v in values]
    df = spark.createDataFrame(rows, "v DOUBLE").repartition(parts)
    got = df.agg(dec_sum("v", "s")).collect()[0]["s"]
    expected = float(sum(Decimal(str(float(v))) for v in values))
    assert got == pytest.approx(expected, abs=0.0), (got, expected)


@given(
    schedule=st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 20)), min_size=1, max_size=8
    )
)
@settings(**SETTINGS)
def test_sink_exactly_once_under_any_replay_schedule(spark, tmp_path_factory, schedule):
    """Whatever sequence of (batch_id, payload) writes — including
    replays of committed ids with different payloads — the sink holds
    exactly the FIRST committed payload per distinct id."""
    root = tmp_path_factory.mktemp("sink")
    sink = IdempotentParquetSink(str(root))
    first_payload: dict[int, int] = {}
    for batch_id, n in schedule:
        df = spark.range(n).select(
            F.lit(batch_id).alias("bid"), F.col("id").alias("v")
        )
        wrote = sink.write_batch(df, batch_id)
        assert wrote == (batch_id not in first_payload)
        first_payload.setdefault(batch_id, n)
    total = sink.read(spark).count()
    assert total == sum(first_payload.values())


@given(
    target=st.dictionaries(st.integers(0, 9), st.integers(0, 100), max_size=8),
    updates=st.dictionaries(st.integers(0, 9), st.integers(0, 100), max_size=8),
)
@settings(**SETTINGS)
def test_merge_upsert_algebra(spark, target, updates):
    """keys(out) == keys(t) | keys(u); value = u wins where present."""
    if not target and not updates:
        return
    t = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)], "k INT, v INT"
    ).filter(F.col("k").isNotNull())
    u = spark.createDataFrame(
        [(k, v) for k, v in updates.items()] or [(None, None)], "k INT, v INT"
    ).filter(F.col("k").isNotNull())
    out = {r["k"]: r["v"] for r in merge_upsert(t, u, ["k"]).collect()}
    assert out == {**target, **updates}


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_zorder_key_injective_and_bounded(spark, pts):
    """Morton keys are injective on (a, b) pairs and bounded by
    4^bits; interleaving of zero is identity-ish (z(a,0) spreads a's
    bits to even positions only)."""
    from clickhouse_batcher_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(pts, "a long, b long")
    rows = df.select(
        "a", "b", zorder_key(F.col("a"), F.col("b"), 8).alias("z")
    ).collect()
    seen = {}
    for r in rows:
        assert 0 <= r["z"] < 4**8
        assert r["z"] not in seen or seen[r["z"]] == (r["a"], r["b"])
        seen[r["z"]] = (r["a"], r["b"])
    assert len(seen) == len(pts)


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), money), min_size=1, max_size=50
    ),
    parts=st.integers(2, 5),
)
@settings(**SETTINGS)
def test_rollup_merge_associative_any_split(spark, vals, parts):
    """merge(partials of ANY hash split) == single-state rollup, with
    decimal-exact sums (the mergeable-state property under random
    data, beyond the fixed date split of the catalog test)."""
    from clickhouse_batcher_spark.operators.rollup import (
        merge_rollups,
        partial_rollup,
    )

    rows = [
        (i, f"2024-01-{(k % 3) + 1:02d} 00:00:00", f"t{k}", float(v))
        for i, (k, v) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    pieces = [
        partial_rollup(df.filter(F.pmod(F.col("event_id"), F.lit(parts)) == i))
        for i in range(parts)
    ]
    merged = {
        (r["day"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in merge_rollups(*pieces).collect()
    }
    single = {
        (r["day"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in merge_rollups(partial_rollup(df)).collect()
    }
    assert merged == single
