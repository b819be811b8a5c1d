"""LTTB downsampling: kernel vs an independent sequential reference,
end-to-end vs a DuckDB-side recompute, and structural invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from clickhouse_batcher_spark.catalog import QUERIES
from clickhouse_batcher_spark.operators.lttb import (
    LTTB_POINTS,
    lttb_select,
)
from tests.parity import duckdb_connection


def ref_lttb(x, y, n_out):
    """Textbook sequential LTTB (Steinarsson 2013), plain Python."""
    n = len(x)
    if n_out >= n or n_out <= 2:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    edges = [int(np.round(1 + i * every)) for i in range(n_out - 1)]
    out = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo = edges[b + 1]
        nhi = edges[b + 2] if b + 2 < len(edges) else n
        if nhi > nlo:
            # np.mean, matching the kernel's summation order bit-for-bit
            ax = float(np.mean(x[nlo:nhi]))
            ay = float(np.mean(y[nlo:nhi]))
        else:
            ax, ay = x[n - 1], y[n - 1]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (x[prev] - ax) * (y[i] - y[prev])
                - (x[prev] - x[i]) * (ay - y[prev])
            )
            if area > best_area:
                best, best_area = i, area
        out.append(best)
        prev = best
    out.append(n - 1)
    return out


def test_kernel_matches_sequential_reference():
    rng = np.random.default_rng(42)
    for n, n_out in [(500, 60), (61, 60), (1000, 13), (59, 60), (3, 2)]:
        x = np.sort(rng.uniform(0, 1e6, n))
        y = rng.normal(0, 10, n)
        got = lttb_select(x, y, n_out).tolist()
        want = ref_lttb(x.tolist(), y.tolist(), n_out)
        assert got == want, (n, n_out)


def test_kernel_tie_break_is_first_max():
    # Constant series: every area is 0, so each bucket keeps its FIRST
    # point — fully deterministic tie handling.
    x = np.arange(100, dtype=np.float64)
    y = np.zeros(100)
    idx = lttb_select(x, y, 10)
    assert idx.tolist() == ref_lttb(x.tolist(), y.tolist(), 10)
    assert idx[0] == 0 and idx[-1] == 99
    assert all(a < b for a, b in zip(idx, idx[1:]))


def _bars_oracle(sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(
            """
            SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                     AS hour,
                   CAST(SUM(CAST(round(value, 6) AS DECIMAL(27,6)))
                        AS DOUBLE) / COUNT(*) AS bar_value
            FROM events GROUP BY 1, 2
            """
        ).df()
    finally:
        con.close()


def test_operator_matches_duckdb_recompute(spark, sf_dir):
    got = (
        QUERIES["events_lttb_downsample"](spark, sf_dir)
        .toPandas()
        .sort_values(["event_type", "pos"])
        .reset_index(drop=True)
    )
    bars = _bars_oracle(sf_dir)
    frames = []
    for et, g in bars.groupby("event_type", sort=True):
        g = g.sort_values("hour", kind="mergesort").reset_index(drop=True)
        x = g["hour"].astype("int64").to_numpy().astype(np.float64)
        y = g["bar_value"].to_numpy()
        idx = ref_lttb(x.tolist(), y.tolist(), LTTB_POINTS)
        sel = g.iloc[idx][["event_type", "hour", "bar_value"]].copy()
        sel["pos"] = np.arange(len(idx), dtype=np.int32)
        frames.append(sel)
    want = (
        pd.concat(frames)
        .sort_values(["event_type", "pos"])
        .reset_index(drop=True)
    )
    got["hour"] = got["hour"].astype("datetime64[us]")
    want["hour"] = want["hour"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_operator_invariants(spark, sf_dir):
    out = QUERIES["events_lttb_downsample"](spark, sf_dir).toPandas()
    bars = _bars_oracle(sf_dir)
    for et, g in out.groupby("event_type"):
        g = g.sort_values("pos")
        src = bars[bars["event_type"] == et]
        n_bars = len(src)
        assert len(g) == min(LTTB_POINTS, n_bars)
        assert g["pos"].tolist() == list(range(len(g)))
        hours = g["hour"].tolist()
        assert hours == sorted(hours)
        assert hours[0] == src["hour"].min()
        assert hours[-1] == src["hour"].max()
        # Every selected point is a real bar.
        merged = g.merge(src, on=["event_type", "hour"], suffixes=("", "_s"))
        assert len(merged) == len(g)
        assert np.allclose(merged["bar_value"], merged["bar_value_s"])
