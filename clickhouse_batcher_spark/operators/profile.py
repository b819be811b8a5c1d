"""Data profiling: per-column statistics in one pass.

The ANALYZE/data-quality step of a pipeline: row counts, null counts,
distinct counts, min/max — emitted long-form (column, metric, value)
so any table profiles into the same schema. One aggregation pass over
the table (all statistics computed in a single projection; Catalyst
collapses them into one hash-agg), values rendered as strings for a
stable cross-type schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

PROFILE_COLS = ("event_id", "user_id", "event_type", "value")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form profile: (column, metric, value STRING).

    Floating columns render min/max through DECIMAL: double->string
    formatting is engine-specific (Java shortest-roundtrip vs C
    printf), decimal->string is plain digits everywhere.
    """
    aggs = []
    for c in cols:
        is_float = dict(df.dtypes)[c] in ("double", "float")
        mcol = F.col(c).cast("decimal(18,2)") if is_float else F.col(c)
        aggs += [
            F.count(F.lit(1)).cast("string").alias(f"{c}::rows"),
            F.sum(F.col(c).isNull().cast("long")).cast("string").alias(f"{c}::nulls"),
            F.countDistinct(c).cast("string").alias(f"{c}::distinct"),
            F.min(mcol).cast("string").alias(f"{c}::min"),
            F.max(mcol).cast("string").alias(f"{c}::max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}::{m}`"
        for c in cols
        for m in ("rows", "nulls", "distinct", "min", "max")
    )
    n = len(cols) * 5
    return wide.selectExpr(
        f"stack({n}, {stack_args}) AS (column_name, metric, value)"
    )


@query(
    "profile_events",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name, '{m}' AS metric,
               CAST({expr} AS VARCHAR) AS value FROM events
        """
        for c in PROFILE_COLS
        for m, expr in (
            ("rows", "COUNT(*)"),
            ("nulls", f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"),
            ("distinct", f"COUNT(DISTINCT {c})"),
            (
                "min",
                f"MIN(CAST({c} AS DECIMAL(18,2)))" if c == "value" else f"MIN({c})",
            ),
            (
                "max",
                f"MAX(CAST({c} AS DECIMAL(18,2)))" if c == "value" else f"MAX({c})",
            ),
        )
    ),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return profile_columns(events, list(PROFILE_COLS))


# ---------------------------------------------------------------------------
# Benford first-digit audit (data-quality / fabrication screen)
# ---------------------------------------------------------------------------
# Expected Benford first-digit mass log10(1 + 1/d), as exact ppm
# literals (floor(log10(1+1/d) * 1e6)) so neither engine evaluates a
# logarithm:
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def _benford_oracle() -> str:
    values_rows = ", ".join(
        f"({d}, {p})" for d, p in _BENFORD_PPM.items()
    )
    return f"""
    WITH fd AS (
      SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice > 0 GROUP BY 1
    ), tot AS (SELECT SUM(n) AS t FROM fd),
    exp AS (SELECT * FROM (VALUES {values_rows}) AS v(digit, exp_ppm))
    SELECT exp.digit,
      COALESCE(fd.n, 0) AS n_orders,
      CAST(COALESCE(fd.n, 0) * 1000000 // tot.t AS BIGINT) AS obs_ppm,
      CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
      CAST(ABS(COALESCE(fd.n, 0) * 1000000 // tot.t - exp.exp_ppm)
           AS BIGINT) AS abs_dev_ppm
    FROM exp LEFT JOIN fd ON fd.digit = exp.digit CROSS JOIN tot
    """


@query("orders_benford_deviation", oracle=_benford_oracle())
def orders_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the classic fabricated/corrupted-amounts screen an
    ingest-quality audit runs over money columns (synthetic uniform
    data deviates loudly; organic multiplicative data tracks the
    log10(1+1/d) masses).

    Exactness: the first digit comes from the CENT-integer's decimal
    string (no float log), expected masses are precomputed integer ppm
    literals, observed shares are integer ppm by truncating division —
    no transcendental evaluated by either engine. One groupBy to 9
    rows; the 9-row expected table broadcast-joins on."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    # money -> DECIMAL(18,2) -> exact cent integer (never a raw
    # double->int cast: DuckDB rounds where Spark truncates)
    fd = orders.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spark_exp = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "digit BIGINT, exp_ppm BIGINT"
    )
    tot = fd.agg(F.sum("n").alias("t"))
    return (
        spark_exp.join(fd, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(COALESCE(n, 0) * 1000000 DIV t AS BIGINT)"
            ).alias("obs_ppm"),
            F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
            F.expr(
                "CAST(ABS(COALESCE(n, 0) * 1000000 DIV t - exp_ppm)"
                " AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
    )
