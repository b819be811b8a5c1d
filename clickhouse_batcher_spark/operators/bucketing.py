"""Bucketed-table co-located joins: the shuffle-elimination layout.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem,
events x sessions) is the exchange: both sides shuffle on the join
key every time the join runs. Hive-bucketed tables move that cost to
WRITE time, once: `bucketBy(n, key).sortBy(key)` hashes rows into a
fixed number of per-partition bucket files, and Spark's scan reports
the resulting HashPartitioning(key, n) as its output partitioning —
so a join of two tables bucketed on the same key with the same bucket
count plans as a SortMergeJoin with NO Exchange on either side (and
with sortBy, no per-task Sort either). The same layout serves every
subsequent join/aggregation on that key for free.

This module is the engine's write-side API for that layout plus the
join helper; `tests/test_bucketing.py` asserts the no-Exchange plan
AND result equality with the shuffled join — the plan contract is
tested, not assumed.

Sizing rule for 100 TB (documented, not enforced): pick bucket count
so each bucket file lands in the 128 MB - 1 GB band after compression
(e.g. 100 TB / 512 MB ≈ 200k buckets is too many FILES per write
task — bucket the TABLE's natural grain, typically 1024-8192 buckets,
and let partition columns (date) divide the rest). Bucket counts must
MATCH across tables that join (Spark only elides the exchange on
equal counts; a 2x mismatch still shuffles the smaller side).

Reference scope: the reference delegates all query execution to
ClickHouse, whose MergeTree ORDER BY key is the analogous co-location
device (SURVEY.md §2.2 scans/joins); this is the Spark-native
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Hive-bucketed (and per-bucket sorted)
    managed table. Sorting at write time is what lets the bucketed
    SortMergeJoin skip the per-task Sort too."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables. The plan contract
    (asserted in tests): SortMergeJoin with no Exchange above either
    scan. Broadcast is suppressed via a join hint so the layout is
    actually exercised even when one side is tiny."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
