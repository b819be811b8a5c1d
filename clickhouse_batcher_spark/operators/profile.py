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
