"""Largest-Triangle-Three-Buckets downsampling (ClickHouse
``largestTriangleThreeBuckets(n)(x, y)``).

The reference's ClickHouse backend ships LTTB as a first-class
aggregate for chart-resolution timeseries downsampling (Steinarsson,
"Downsampling Time Series for Visual Representation", 2013). LTTB is
inherently sequential — each bucket's chosen point depends on the
point chosen in the PREVIOUS bucket — so it cannot be a relational
composition; this is exactly the prompt's case (b): an
``applyInPandas`` kernel per series with the distributed plumbing
(pre-aggregation, partitioning, schema) kept in DataFrame land.

Scale design (100 TB):

- The kernel NEVER sees raw events. Each series is pre-aggregated to
  hourly bars first (decimal-exact means, one map-side-combinable
  shuffle), so the per-group payload handed to Python is bounded by
  the time span in hours, not the row count — 10 years ≈ 87.6k
  points ≈ 1.4 MB per series.
- For series whose *bar* count still exceeds a single task, the
  standard hierarchical refinement applies unchanged: LTTB per time
  slice, then LTTB over the concatenated slice outputs — same kernel,
  one extra groupBy level. Not needed at bar granularity here.
- Determinism: bars are sorted by hour inside the kernel, areas
  compare with strict ``>`` (first maximum wins), and the bar means
  are decimal-rounded before the float kernel — so the selected
  subset is a pure function of the data, independent of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

LTTB_POINTS = 60

_OUT_SCHEMA = (
    "event_type string, hour timestamp, bar_value double, pos int"
)


def _build_lttb_select():
    """Factory: the kernel ships to Python workers inside the
    applyInPandas closure, so it must be a LOCAL def (cloudpickle
    serializes module-level functions by reference and this package is
    not importable on executor workers when the driver runs from a
    different cwd — operators/multimodal.py's round-3 lesson)."""

    def lttb_select(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
        """Indices of the LTTB-selected points (reference sequential
        form).

        Buckets split the interior points evenly; the first and last
        points are always kept. For each bucket, the point maximizing
        the triangle area with (previous selected point, mean of the
        NEXT bucket) is chosen; ties keep the earliest point
        (strict >)."""
        import numpy as np

        n = len(x)
        if n_out >= n or n_out <= 2:
            return np.arange(n)
        # Interior bucket boundaries over points 1..n-2, evenly spaced.
        edges = (
            np.linspace(1, n - 1, n_out - 1).round().astype(np.int64)
        )
        out = [0]
        prev = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            if hi <= lo:  # unreachable for n > n_out; defensive
                continue
            nlo, nhi = edges[b + 1], (
                edges[b + 2] if b + 2 < len(edges) else n
            )
            # Average of the next bucket (the last bucket averages to
            # the final point itself).
            ax = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
            ay = y[nlo:nhi].mean() if nhi > nlo else y[n - 1]
            px, py = x[prev], y[prev]
            # Triangle area (×2) for every candidate in this bucket.
            area = np.abs(
                (px - ax) * (y[lo:hi] - py) - (px - x[lo:hi]) * (ay - py)
            )
            prev = lo + int(np.argmax(area))  # argmax: first max wins
            out.append(prev)
        out.append(n - 1)
        return np.asarray(out, dtype=np.int64)

    return lttb_select


# driver-side alias (tests and the reference recompute use it)
lttb_select = _build_lttb_select()


@query("events_lttb_downsample", oracle=None)  # sequential: rows-only
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the hourly mean-value series downsampled to
    ``LTTB_POINTS`` visually-representative points.

    Pipeline: decimal-exact hourly bars (pure DataFrame aggregation)
    -> one ``applyInPandas`` group per series running the sequential
    LTTB kernel. The driver records a rows-only check; pytest pins the
    kernel against an independent sequential reference, recomputes the
    full operator from DuckDB-side bars, and asserts the endpoint /
    monotonicity / containment invariants (tests/test_lttb.py).
    """
    bars = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(27,6)"))
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("bar_value")
        )
    )
    select = _build_lttb_select()  # local def -> shipped by value
    points = LTTB_POINTS

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("hour", kind="mergesort").reset_index(
            drop=True
        )
        x = pdf["hour"].astype("int64").to_numpy().astype(np.float64)
        y = pdf["bar_value"].to_numpy()
        idx = select(x, y, points)
        out = pdf.iloc[idx][["event_type", "hour", "bar_value"]].copy()
        out["pos"] = np.arange(len(idx), dtype=np.int32)
        return out

    return bars.groupBy("event_type").applyInPandas(
        downsample, schema=_OUT_SCHEMA
    )
