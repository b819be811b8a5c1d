"""Skew-safe aggregation: two-phase salted groupBy.

When one key owns a disproportionate share of rows (the classic hot
user / hot document), a single groupBy sends that key's entire volume
to one reducer. Salting splits each key into ``salt_buckets`` partial
groups aggregated in parallel, then merges the partials — the same
partial/final shape Spark already uses map-side, made explicit so the
*reduce* side also fans out. AQE's skew-join handling covers joins;
this covers aggregations.

The salt is ``spark_partition_id() % buckets``: zero extra hashing,
naturally co-located with the data, and the merge phase is
salt-value-independent — results are identical to the direct groupBy
(property-tested), only the shuffle shape changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_batcher_spark.functions import dec


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(key).agg(exact sum(value), count) via salted two-phase.

    Returns columns: key_cols + [sum_value DOUBLE, cnt BIGINT].
    """
    salted = df.withColumn(
        "_salt", F.spark_partition_id() % salt_buckets
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(dec(value_col)).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").cast("bigint").alias("cnt"),
    )
