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
=> X'X / X'y per-row products <= 1e10, safe to ~1e8 rows/partition;
y'y rows are ~1e16 each, so that term accumulates through chunked
dots into an exact Python int and travels as a string (int64 wrapped
at sf0.01 already — the round-7 r^2 fix).
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


def _build_moment_partials():
    """Factory: the kernel must be a LOCAL def so cloudpickle ships it
    by value — a module-level function pickles by reference and the
    package is not importable on executor workers when the driver runs
    from another cwd (the round-3 ModuleNotFoundError class; this one
    survived because the grading driver itself runs from the repo
    root)."""
    y_scale = _Y_SCALE

    def moment_partials(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = pdf[["x0", "x1", "x2", "x3"]].to_numpy(dtype=np.int64)
            y6 = np.rint(pdf["y"].to_numpy() * y_scale).astype(np.int64)
            xtx = X.T @ X  # exact: int64 products of small ints
            xty = X.T @ y6
            # y6^2 is ~1e16 per row, so a whole-batch int64 dot product
            # overflows (round-7 fix: the old int(y6 @ y6) wrapped
            # negative at sf>=0.01 and silently zeroed r^2). Chunked
            # int64 dots (512 * 1e16 < 2^63) accumulated into a Python
            # int stay exact at any scale; the partial travels as a
            # string because a partition total itself exceeds int64.
            yty = 0
            for i in range(0, len(y6), 512):
                c = y6[i : i + 512]
                yty += int(c @ c)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "xtx": [xtx.ravel().tolist()],
                    "xty": [xty.tolist()],
                    "yty": [str(yty)],
                }
            )

    return moment_partials


def ols_fit(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, float, int]:
    """(beta p-vector, r_squared, n) from exact integer moment sums."""
    parts = (
        _design(spark, sf_dir)
        .mapInPandas(
            _build_moment_partials(),
            schema="n long, xtx array<long>, xty array<long>, yty string",
        )
        .collect()
    )
    if not parts:
        raise ValueError("empty events table")
    n = sum(p["n"] for p in parts)
    # Driver totals accumulate as PYTHON ints (object dtype): each
    # partition's partial fits int64 by the rows/partition bound, but
    # the cross-partition total does not — X'y rows are ~1e10, so an
    # np.int64 accumulator wraps silently (no OverflowError) at ~1e9
    # TOTAL rows, the same wraparound class as the y'y term below.
    xtx = np.zeros((_P, _P), dtype=object)
    xty = np.zeros(_P, dtype=object)
    yty = 0
    for p in parts:  # integer adds: order-independent, exact
        xtx += np.asarray(
            [int(v) for v in p["xtx"]], dtype=object
        ).reshape(_P, _P)
        xty += np.asarray([int(v) for v in p["xty"]], dtype=object)
        yty += int(p["yty"])
    beta6 = np.linalg.solve(xtx.astype(np.float64), xty.astype(np.float64))
    beta = beta6 / _Y_SCALE
    # R^2 from the same exact moments: SSE = y'y - beta6'X'y (scaled),
    # SST = y'y - n*mean^2.
    sse = (yty - float(beta6 @ xty)) / _Y_SCALE**2
    sst = (yty - float(xty[0]) ** 2 / n) / _Y_SCALE**2
    r2 = 1.0 - sse / sst if sst > 0 else 0.0
    return beta, r2, int(n)


def _det4_sql(m: list[list[str]]) -> str:
    """Leibniz expansion of a 4x4 determinant over SQL expressions —
    24 signed products, generated mechanically."""
    import itertools

    terms = []
    for perm in itertools.permutations(range(4)):
        inv = sum(
            1
            for a in range(4)
            for b in range(a + 1, 4)
            if perm[a] > perm[b]
        )
        sign = "+" if inv % 2 == 0 else "-"
        terms.append(f"{sign} {' * '.join(m[i][perm[i]] for i in range(4))}")
    return "(" + " ".join(terms) + ")"


def _ols_oracle() -> str:
    """The 4x4 normal-equations solve IS SQL-expressible: exact
    HUGEINT moment sums (identical integers to the Spark kernel's
    int64 partials), then Cramer's rule — five Leibniz determinants —
    in DOUBLE. Cramer vs NumPy's LU differ only in float rounding
    (~1e-11 relative at these condition numbers); the round-to-6
    output contract absorbs it.
    """
    a = [[f"a{min(i, j)}{max(i, j)}" for j in range(4)] for i in range(4)]
    d = _det4_sql(a)
    d_i = [
        _det4_sql(
            [
                [f"b{i}" if j == k else a[i][j] for j in range(4)]
                for i in range(4)
            ]
        )
        for k in range(4)
    ]
    moment_cols = ", ".join(
        f"CAST(SUM(x{i}*x{j}) AS DOUBLE) AS a{i}{j}"
        for i in range(4)
        for j in range(i, 4)
    )
    b_cols = ", ".join(
        f"CAST(SUM(x{i}*y6) AS DOUBLE) AS b{i}" for i in range(4)
    )
    beta_cols = ", ".join(
        f"({d_i[k]}) / ({d}) AS beta6_{k}" for k in range(4)
    )
    rows = " UNION ALL ".join(
        f"SELECT '{f}' AS feature, ROUND(beta6_{k} / {_Y_SCALE}, 6) AS beta,"
        f" ROUND(r2, 6) AS r_squared, n FROM fit"
        for k, f in enumerate(FEATURES)
    )
    return f"""
    WITH design AS (
      SELECT CAST(1 AS BIGINT) AS x0,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS x1,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x2,
             CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS x3,
             CAST(round(round(value, 6) * {_Y_SCALE}) AS BIGINT) AS y6
      FROM events
    ),
    m AS (
      SELECT COUNT(*) AS n, {moment_cols}, {b_cols},
             CAST(SUM(y6*y6) AS DOUBLE) AS yty
      FROM design
    ),
    beta AS (SELECT n, yty, b0, b1, b2, b3, {beta_cols} FROM m),
    fit AS (
      SELECT n, beta6_0, beta6_1, beta6_2, beta6_3,
             1.0 - ((yty - (beta6_0*b0 + beta6_1*b1 + beta6_2*b2
                            + beta6_3*b3)) / {_Y_SCALE}.0 / {_Y_SCALE})
                   / ((yty - b0*b0 / n) / {_Y_SCALE}.0 / {_Y_SCALE}) AS r2
      FROM beta
    )
    {rows}
    """


@query("events_ols_fit", oracle=_ols_oracle())
def events_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit value ~ intercept + k + hour + dayofweek over all events;
    one row per coefficient plus the shared fit stats.

    Oracled since round 7: the moment sums are exact integers on both
    sides, and the oracle solves the same 4x4 system by Cramer's rule
    in SQL (``_ols_oracle``). pytest additionally pins the
    coefficients against NumPy lstsq on the collected design matrix
    and asserts exact invariance to repartitioning.
    """
    beta, r2, n = ols_fit(spark, sf_dir)
    rows = [
        (f, float(round(b, 6)), float(round(r2, 6)), n)
        for f, b in zip(FEATURES, beta)
    ]
    return spark.createDataFrame(
        rows, "feature STRING, beta DOUBLE, r_squared DOUBLE, n BIGINT"
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (round-8): the median-of-pairwise-slopes
# estimator (Theil 1950 / Sen 1968) — the robust companion to the OLS
# fit above; a single anomalous day moves OLS but not the pairwise
# median (breakdown point ~29%). Slopes run over the per-type DAILY
# count series, so the pair expansion is bounded by the observation
# window in days squared — a collection-time constant, independent of
# event volume (the k-core / KM boundedness argument). The median is
# SELECTED, not interpolated: order by (slope, d1, d2) and take the
# lower-median row — deterministic in both engines, no float
# interpolation to diverge.
# ---------------------------------------------------------------------------


@query(
    "events_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, a.d AS d1, b.d AS d2,
        CAST(b.c - a.c AS DOUBLE)
          / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope
      FROM daily a
      JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
    ),
    nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily
      GROUP BY 1
    ),
    ranked AS (
      SELECT event_type, slope,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY slope, d1, d2) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM pairs
    )
    SELECT r.event_type, nd.n_days, CAST(r.n_pairs AS BIGINT) AS n_pairs,
           r.slope AS ts_slope
    FROM ranked r JOIN nd ON nd.event_type = r.event_type
    WHERE r.rn = (r.n_pairs + 1) // 2
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the Theil-Sen slope of the daily-count series
    (lower median of all pairwise slopes, ties broken on day pair)."""
    from pyspark.sql.window import Window

    from clickhouse_batcher_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("c").alias("c2"),
    )
    pairs = (
        a.join(b, (a["event_type"] == b["et2"]) & (a["d1"] < b["d2"]))
        .select(
            "event_type",
            "d1",
            "d2",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / F.datediff("d2", "d1").cast("double")
            ).alias("slope"),
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wc = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_pairs"),
    ).filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
    return ranked.join(nd, "event_type").select(
        "event_type",
        "n_days",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("slope").alias("ts_slope"),
    )
