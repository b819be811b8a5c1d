"""Distributed multi-feature OLS (ClickHouse
``stochasticLinearRegression`` analogue, solved exactly).

ClickHouse fits linear models with per-block SGD merged across parts;
on Spark the honest equivalent is the closed-form normal-equations
solve over distributed moment sums — deterministic, one pass, no
learning-rate tuning. Same bounded-driver pattern as
``operators.pca``: each partition emits ONE row of integer moment
partials, the driver solves a (p x p) system, p = 4.

Determinism: every feature is integer-valued (intercept, props-k,
hour, day-of-week) and y rounds to 6 decimals, so X'X and X'y
accumulate as EXACT int64 sums — the totals are independent of
partitioning and row order, and the single NumPy solve of identical
integers is bit-stable. (`simpleLinearRegression` has the hash-exact
single-feature closed form; this is the multi-feature companion,
rows-only because a 4x4 solve is not SQL.)

At 100 TB: the scan dominates; partials are 4x4+4 ints per partition,
driver work is O(partitions). int64 headroom: |x| <= 99, |y6| <= ~1e8
=> per-row products <= 1e10; overflow would need ~1e8 rows per
partition — size partitions below that (or lift to Python ints in the
kernel, same plan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

FEATURES = ("intercept", "k", "hour", "dow")
_P = len(FEATURES)
_Y_SCALE = 1_000_000


def _design(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.lit(1).cast("long").alias("x0"),
        F.get_json_object("props", "$.k").cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
        F.dayofweek("ts").cast("long").alias("x3"),
        F.round(F.col("value"), 6).alias("y"),
    )


def _moment_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        X = pdf[["x0", "x1", "x2", "x3"]].to_numpy(dtype=np.int64)
        y6 = np.rint(pdf["y"].to_numpy() * _Y_SCALE).astype(np.int64)
        xtx = X.T @ X  # exact: int64 products of small ints
        xty = X.T @ y6
        yty = int(y6 @ y6)
        yield pd.DataFrame(
            {
                "n": [len(X)],
                "xtx": [xtx.ravel().tolist()],
                "xty": [xty.tolist()],
                "yty": [yty],
            }
        )


def ols_fit(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, float, int]:
    """(beta p-vector, r_squared, n) from exact integer moment sums."""
    parts = (
        _design(spark, sf_dir)
        .mapInPandas(
            _moment_partials,
            schema="n long, xtx array<long>, xty array<long>, yty long",
        )
        .collect()
    )
    if not parts:
        raise ValueError("empty events table")
    n = sum(p["n"] for p in parts)
    xtx = np.zeros((_P, _P), dtype=np.int64)
    xty = np.zeros(_P, dtype=np.int64)
    yty = 0
    for p in parts:  # integer adds: order-independent, exact
        xtx += np.asarray(p["xtx"], dtype=np.int64).reshape(_P, _P)
        xty += np.asarray(p["xty"], dtype=np.int64)
        yty += p["yty"]
    beta6 = np.linalg.solve(xtx.astype(np.float64), xty.astype(np.float64))
    beta = beta6 / _Y_SCALE
    # R^2 from the same exact moments: SSE = y'y - beta6'X'y (scaled),
    # SST = y'y - n*mean^2.
    sse = (yty - float(beta6 @ xty)) / _Y_SCALE**2
    sst = (yty - float(xty[0]) ** 2 / n) / _Y_SCALE**2
    r2 = 1.0 - sse / sst if sst > 0 else 0.0
    return beta, r2, int(n)


@query("events_ols_fit", oracle=None)  # 4x4 linear solve: not SQL
def events_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit value ~ intercept + k + hour + dayofweek over all events;
    one row per coefficient plus the shared fit stats.

    Rows-only by design; pytest pins the coefficients against
    NumPy lstsq on the collected design matrix and asserts exact
    invariance to repartitioning (integer moment sums).
    """
    beta, r2, n = ols_fit(spark, sf_dir)
    rows = [
        (f, float(round(b, 6)), float(round(r2, 6)), n)
        for f, b in zip(FEATURES, beta)
    ]
    return spark.createDataFrame(
        rows, "feature STRING, beta DOUBLE, r_squared DOUBLE, n BIGINT"
    )
