"""Physical layout helpers: partitioned and bucketed table writes.

At 100 TB the difference between a full scan and a pruned scan is the
layout, not the query:

- **partition columns** (low cardinality, e.g. month) become
  directories; Catalyst turns predicates on them into
  ``PartitionFilters`` — entire directories never open.
- **bucketing** (high-cardinality join/agg keys) pre-shuffles data at
  write time; joins and aggs between tables bucketed on the same key
  run with NO Exchange — the shuffle is paid once at ingest instead of
  per query.

Both are write-path decisions the ingest pipeline makes; readers stay
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_month(
    df: DataFrame, ts_col: str, path: str, *, mode: str = "overwrite"
) -> None:
    """Land a fact table partitioned by (year, month) of ``ts_col``."""
    (
        df.withColumn("_year", F.year(ts_col))
        .withColumn("_month", F.month(ts_col))
        .write.mode(mode)
        .partitionBy("_year", "_month")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("basePath", path).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (co-located joins on
    ``bucket_col``). Requires a warehouse (saveAsTable), since bucket
    metadata lives in the catalog."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
