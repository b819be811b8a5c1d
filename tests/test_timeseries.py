"""Timeseries operators: WMA smoothing, z-score anomalies, Markov
transitions — semantic unit tests + DuckDB parity."""

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.tables import load_table
from tests.parity import assert_parity

TS_QUERIES = [
    "events_hourly_wma",
    "events_hourly_anomalies",
    "event_transition_matrix",
    "events_rolling_median_12h",
    "events_cusum_changepoint",
    "events_hourly_acf",
    "markov_kstep_distribution",
    "events_dominant_period",
    "events_holt_forecast_daily",
]


@pytest.mark.parametrize("name", TS_QUERIES)
def test_timeseries_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_wma_constant_series_is_identity(spark, sf_dir):
    """A constant hourly series must smooth to exactly itself,
    whatever the gap pattern (weights renormalize)."""
    from clickhouse_batcher_spark.operators.timeseries import (
        events_hourly_wma,
    )

    out = events_hourly_wma(spark, sf_dir)
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # row set == observed (type, hour) pairs
    assert out.count() == hourly.count()
    assert (
        out.join(hourly, ["event_type", "hour"], "left_anti").count() == 0
    )
    # hand-check one type against a pandas recompute of the same math
    pdf = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("tot"))
        .toPandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    got = {
        r["hour"]: r["wma_value"]
        for r in out.filter(F.col("event_type") == "click").collect()
    }
    totals = {row.hour: float(row.tot) for row in pdf.itertuples(index=False)}
    import datetime

    for h, tot in list(totals.items())[:50]:
        num = den = 0.0
        for d in range(12):
            hh = h - datetime.timedelta(hours=d)
            if hh in totals:
                num += totals[hh] * (12 - d)
                den += 12 - d
        assert math.isclose(got[h], num / den, rel_tol=1e-9), h


def test_anomalies_planted_outlier(spark):
    """A 100x spike hour must be flagged; flat hours must not."""
    from clickhouse_batcher_spark.operators import timeseries as ts

    rows = []
    eid = 0
    for hr in range(48):
        v = 5000.0 if hr == 37 else 50.0
        rows.append((eid, f"2024-03-01 {hr % 24:02d}:30:00", hr, "t", v))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id LONG, ts_s STRING, user_id LONG, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    # exercise the operator body against an in-memory table
    hourly = df.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("tot"))
    t = hourly.select(
        "h",
        "event_type",
        F.col("tot").cast("decimal(18,6)").alias("x"),
        F.floor("tot").cast("bigint").alias("xi"),
    )
    m = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("xi").cast("double").alias("s1"),
        F.sum(F.col("xi").cast("decimal(19,0)") * F.col("xi"))
        .cast("double")
        .alias("s2"),
    )
    j = t.join(m, "event_type")
    nd = F.col("n_hours").cast("double")
    var_num = nd * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("xi").cast("double") - F.col("s1") / nd) / F.sqrt(
        var_num / (nd * nd)
    )
    flagged = (
        j.filter(F.abs(z) >= ts.ANOM_Z)
        .select(F.hour("h").alias("hr"))
        .collect()
    )
    assert [r["hr"] for r in flagged] == [13]  # hr 37 % 24


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from clickhouse_batcher_spark.operators.timeseries import (
        event_transition_matrix,
    )

    out = event_transition_matrix(spark, sf_dir)
    sums = (
        out.groupBy("prev_type")
        .agg(
            F.sum("prob").alias("p"),
            F.sum("n_transitions").alias("n"),
        )
        .collect()
    )
    assert len(sums) > 0
    for r in sums:
        assert math.isclose(r["p"], 1.0, rel_tol=1e-9), r
    # total transitions == total events - distinct users with >=1 event
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in sums) == n_events - n_users


def test_purchase_attribution_semantics(spark, sf_dir):
    """Hand-built sequences: in-window touch, out-of-window (organic),
    purchase-run carry-through, and first-event purchase."""
    from unittest.mock import patch

    from clickhouse_batcher_spark.operators import attribution as A

    rows = [
        # user 1: click 1h before purchase -> attributed to click
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 01:00:00", 1, "purchase", 10.0),
        # user 2: view 100h before purchase -> organic (out of 72h)
        (3, "2024-01-01 00:00:00", 2, "view", 0.0),
        (4, "2024-01-05 04:00:00", 2, "purchase", 20.0),
        # user 3: view, then TWO purchases -> both credited to view
        (5, "2024-01-02 00:00:00", 3, "view", 0.0),
        (6, "2024-01-02 01:00:00", 3, "purchase", 5.0),
        (7, "2024-01-02 02:00:00", 3, "purchase", 7.0),
        # user 4: purchase with no prior events -> organic
        (8, "2024-01-03 00:00:00", 4, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts_s STRING, user_id LONG, event_type STRING,"
        " value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    with patch.object(A, "load_table", lambda *_: df):
        out = {
            r["touch_type"]: (
                r["n_purchases"],
                r["attributed_value"],
                r["avg_secs_to_touch"],
            )
            for r in A.purchase_attribution(spark, sf_dir).collect()
        }
    assert out["click"] == (1, 10.0, 3600.0)
    assert out["view"] == (2, 12.0, (3600 + 7200) / 2)
    assert out["organic"][0] == 2 and out["organic"][1] == 21.0
    assert out["organic"][2] is None


def test_attribution_parity(spark, sf_dir):
    assert_parity(spark, "purchase_attribution", sf_dir)


def test_cusum_changepoint_matches_python_argmax(spark, sf_dir):
    """Independent recompute: the located break must be the argmax of
    the integer-scaled cumulative deviation, earliest hour on ties,
    and the two side means must average the split exactly."""
    from clickhouse_batcher_spark.catalog import QUERIES
    from clickhouse_batcher_spark.tables import load_table as _lt

    hourly = (
        _lt(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
        )
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append((r["h"], r["count"]))
    got = {
        r["event_type"]: r
        for r in QUERIES["events_cusum_changepoint"](spark, sf_dir).collect()
    }
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        tot = sum(c for _, c in pts)
        cusum, peak, peak_h, peak_i = 0, None, None, None
        for i, (h, c) in enumerate(pts):
            cusum += n * c - tot
            if peak is None or abs(cusum) > abs(peak):
                peak, peak_h, peak_i = cusum, h, i
        r = got[et]
        assert r["n_hours"] == n
        assert r["change_hour"] == peak_h
        assert r["peak_cusum_scaled"] == peak
        before = [c for _, c in pts[: peak_i + 1]]
        after = [c for _, c in pts[peak_i + 1 :]]
        assert r["mean_before"] == pytest.approx(sum(before) / len(before))
        if after:
            assert r["mean_after"] == pytest.approx(sum(after) / len(after))


def test_events_hourly_seasonality_recount(spark, sf_dir):
    """Sequential recount; per type the ppm indexes average ~1e6
    (within integer-floor slack) and counts sum to the type total."""
    from collections import Counter

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.tables import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour(F.col("ts").cast("timestamp")).alias("h")
    ).collect()
    c = Counter((r.event_type, r.h) for r in rows)
    tot = Counter(r.event_type for r in rows)
    got = {
        (r.event_type, r.hod): (r.n_events, r.seasonality_ppm)
        for r in catalog.QUERIES["events_hourly_seasonality"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(c)
    for key, n in c.items():
        et = key[0]
        assert got[key] == (n, n * 24 * 1_000_000 // tot[et]), key
    for et in tot:
        s = sum(v for (t, _), (v, _) in got.items() if t == et)
        assert s == tot[et]


def test_user_lifecycle_stages_recompute(spark, sf_dir):
    """Sequential recompute of recency/tenure/stage from the raw
    events; stages partition the user set."""
    from collections import defaultdict

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.operators.cohort import (
        LIFECYCLE_CHURN_DAYS,
        LIFECYCLE_LAPSED_DAYS,
        LIFECYCLE_NEW_DAYS,
    )
    from clickhouse_batcher_spark.tables import load_table

    rows = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).collect()
    tmax_day = max(r.ts for r in rows).date()
    per = defaultdict(list)
    for r in rows:
        per[r.user_id].append(r.ts)
    got = {
        r.user_id: r
        for r in catalog.QUERIES["user_lifecycle_stages"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(per)
    for uid, ts_list in per.items():
        rec = (tmax_day - max(ts_list).date()).days
        ten = (tmax_day - min(ts_list).date()).days
        days = len({t.date() for t in ts_list})
        if ten < LIFECYCLE_NEW_DAYS:
            stage = "new"
        elif rec > LIFECYCLE_CHURN_DAYS:
            stage = "churned"
        elif rec > LIFECYCLE_LAPSED_DAYS:
            stage = "lapsed"
        else:
            stage = "active"
        r = got[uid]
        assert (
            r.n_events,
            r.active_days,
            r.recency_days,
            r.tenure_days,
            r.stage,
        ) == (len(ts_list), days, rec, ten, stage), uid


def test_events_hourly_acf_matches_numpy(spark, sf_dir):
    """Exact recompute: the integer-ppm ACF equals the classic
    numpy sample ACF (biased, full-series variance) on the gap-filled
    hourly series, to the 1-ppm truncation."""
    import numpy as np

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.operators.timeseries import ACF_MAX_LAG
    from clickhouse_batcher_spark.tables import load_table

    rows = {
        r["lag"]: r
        for r in catalog.QUERIES["events_hourly_acf"](spark, sf_dir).collect()
    }
    assert sorted(rows) == list(range(1, ACF_MAX_LAG + 1))

    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    hrs = np.array(
        [int(r["ts"].timestamp()) // 3600 for r in ev], dtype=np.int64
    )
    h0, h1 = hrs.min(), hrs.max()
    c = np.bincount(hrs - h0, minlength=h1 - h0 + 1).astype(np.int64)
    n, s = len(c), int(c.sum())
    a = (n * c - s).astype(object)  # python ints: no overflow
    den = sum(x * x for x in a)
    for k in range(1, ACF_MAX_LAG + 1):
        num = sum(a[t] * a[t + k] for t in range(n - k))
        r = rows[k]
        assert r["n_hours"] == n and r["n_pairs"] == n - k
        expect = (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
        assert r["acf_ppm"] == expect, (k, r["acf_ppm"], expect)
        assert -1_000_000 <= r["acf_ppm"] <= 1_000_000


def test_markov_kstep_mass_and_float_agreement(spark, sf_dir):
    """Truncation leaks <= k^2 scale-units of mass per step, and the integer
    8-step vector sits within 1e-6 (relative) of a float power
    iteration from the same transition counts."""
    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.operators.timeseries import (
        MARKOV_SCALE,
        MARKOV_STEPS,
        event_transition_matrix,
    )

    rows = catalog.QUERIES["markov_kstep_distribution"](
        spark, sf_dir
    ).collect()
    k = len(rows)
    total = sum(r["p_scaled"] for r in rows)
    assert total <= MARKOV_SCALE
    # <=1 unit lost per (i,j) term per step: k*k terms per step
    assert total >= MARKOV_SCALE - MARKOV_STEPS * k * k
    for r in rows:
        assert r["p_ppm"] == r["p_scaled"] // 1_000_000
        assert r["n_steps"] == MARKOV_STEPS

    tm = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    uni = sorted({p for p, _ in tm})
    uset = set(uni)
    closed = {(p, c): n for (p, c), n in tm.items() if c in uset}
    rtot = {i: sum(n for (p, _), n in closed.items() if p == i) for i in uni}
    pvec = dict.fromkeys(uni, 1.0 / len(uni))
    for _ in range(MARKOV_STEPS):
        nxt = dict.fromkeys(uni, 0.0)
        for (i, j), n in closed.items():
            nxt[j] += pvec[i] * n / rtot[i]
        pvec = nxt
    for r in rows:
        assert abs(r["p_scaled"] / MARKOV_SCALE - pvec[r["event_type"]]) < 1e-6
