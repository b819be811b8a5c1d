"""ClickHouse-aggregate parity ops: oracle parity + invariants."""

from __future__ import annotations

import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from parity import assert_parity

from clickhouse_batcher_spark.operators.chagg import SEQ_LEN


@pytest.mark.parametrize(
    "name",
    [
        "events_ohlc_hourly",
        "user_event_sequences",
        "user_retention_flags",
        "sequence_match_counts",
        "uniq_up_to_types_per_user",
        "user_active_interval_sum",
        "delta_sum_by_type",
        "bounding_ratio_by_user",
        "lineitem_weighted_price_median",
        "next_event_prediction",
        "event_type_user_entropy",
        "max_concurrent_intervals",
    ],
)
def test_chagg_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_ohlc_invariants(spark, sf_dir):
    """low <= open/close <= high per bar; event counts conserve."""
    from pyspark.sql import functions as F

    from clickhouse_batcher_spark.tables import load_table

    bars = catalog.QUERIES["events_ohlc_hourly"](spark, sf_dir)
    bad = bars.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
    )
    assert bad.count() == 0
    total = bars.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_sequences_are_prefixes(spark, sf_dir):
    """Each user's seq is exactly their first-min(K, n) event types in
    (ts, event_id) order — cross-checked row-by-row in pandas."""
    from clickhouse_batcher_spark.tables import load_table

    out = (
        catalog.QUERIES["user_event_sequences"](spark, sf_dir)
        .toPandas()
        .set_index("user_id")
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    for user_id, grp in ev.groupby("user_id"):
        expect = ">".join(grp["event_type"].head(SEQ_LEN))
        assert out.loc[user_id, "seq"] == expect
        assert out.loc[user_id, "n_events"] == len(grp)


def test_retention_flags_are_monotone(spark, sf_dir):
    """r0 >= r1 and r0 >= r2 (later stages are conjunctions with the
    entry condition), all bounded by n_users."""
    row = catalog.QUERIES["user_retention_flags"](spark, sf_dir).collect()[0]
    assert row["n_users"] >= row["r0"] >= row["r1"]
    assert row["r0"] >= row["r2"]


def test_sequence_match_subset_of_retention(spark, sf_dir):
    """A strict before/after match implies both stages occurred, so
    matched_users <= the retention r2 conjunction count."""
    m = catalog.QUERIES["sequence_match_counts"](spark, sf_dir).collect()[0]
    r = catalog.QUERIES["user_retention_flags"](spark, sf_dir).collect()[0]
    assert m["matched_users"] <= r["r2"]


def test_ema_parity(spark, sf_dir):
    assert_parity(spark, "events_ema_hourly_counts", sf_dir)


def test_ema_is_incremental_and_bounded(spark, sf_dir):
    """The fold IS the streaming update rule: replaying the series
    count-by-count in Python reproduces ema_fixed exactly, and the
    EMA stays within [min, max] of the scaled counts."""
    from pyspark.sql import functions as F

    from clickhouse_batcher_spark.operators.chagg import EMA_SCALE
    from clickhouse_batcher_spark.tables import load_table

    out = {
        r["event_type"]: (r["ema_fixed"], r["n_hours"])
        for r in catalog.QUERIES["events_ema_hourly_counts"](spark, sf_dir).collect()
    }
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type", "hour")
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append(r["cnt"])
    for etype, counts in series.items():
        state = counts[0] * EMA_SCALE
        for c in counts[1:]:
            state = (c * EMA_SCALE + 3 * state) // 4
        assert out[etype] == (state, len(counts))
        assert min(counts) * EMA_SCALE <= state <= max(counts) * EMA_SCALE
