"""Scalar-function helpers shared by operators and the query catalog.

Two concerns drive this module:

1. **Oracle parity** — every helper has deterministic, engine-portable
   semantics so the same logic can be written in ANSI SQL for DuckDB
   and hash-match the Spark result (the driver's correctness gate).
   Floating-point aggregates are the classic trap: summing doubles is
   order-dependent, and Spark and DuckDB will not sum in the same
   order. ``dec_sum``/``dec_avg`` route sums through DECIMAL, which is
   exact and order-independent, then cast back to DOUBLE.

2. **Scale** — everything here is built-in ``pyspark.sql.functions``
   (JVM-side, whole-stage-codegen'd). No Python UDFs.

The reference's only scalar computation is the SHA-256 content hash
carried in its ``sha256sum`` column (``hashes.go:25``);
``sha256_hex`` reproduces it engine-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for sums over billions of rows of money-scale
# values without overflow: 38 total digits, 6 fractional.
_DEC = "DECIMAL(27,6)"


def dec(col: Column | str) -> Column:
    """Cast a double column to exact decimal (order-independent math)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC)


def dec_sum(col: Column | str, alias: str) -> Column:
    """Exact SUM of a double column, returned as DOUBLE.

    SUM over DECIMAL is exact => independent of partitioning / shuffle
    order => identical on Spark and DuckDB. The final cast to DOUBLE is
    a single deterministic conversion of an identical decimal value.
    """
    return dec_sum_expr(dec(col)).alias(alias)


def dec_sum_expr(dec_col: Column) -> Column:
    return F.sum(dec_col).cast("double")


def dec_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum-based AVG: (decimal sum as double) / (count as double).

    Both operands are bit-identical across engines, and double division
    is deterministic IEEE-754, so the quotient matches exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c).cast("double")).alias(alias)


def sha256_hex(col: Column | str) -> Column:
    """Lowercase hex SHA-256 of a string/binary column.

    Engine-side reproduction of the reference's ``sha256sum`` input
    column (``hashes.go:25``). DuckDB oracle: ``sha256(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text, empty strings removed.

    DuckDB oracle equivalent:
    ``list_filter(string_split_regex(lower(x), '\\s+'), t -> t <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def portable_hash64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit hash of a string as a non-negative BIGINT.

    Built from SHA-256 so the value is stable across Spark versions,
    JVMs, and engines (unlike ``xxhash64``/``hash`` whose seeds and
    algorithms are engine-specific). Used by MinHash / SimHash /
    fingerprinting where reproducibility matters more than speed; still
    fully JVM-side and codegen-friendly.
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c) if salt else c
    # 15 hex chars = 60 bits: fits a signed 64-bit int, always >= 0.
    return F.conv(F.substring(F.sha2(salted, 256), 1, 15), 16, 10).cast("bigint")


def with_global_index(
    df,
    cols: list,
    index_name: str = "_gidx",
    num_partitions: int | None = None,
):
    """Exact 0-based global row index in the total order given by
    ``cols`` — WITHOUT a single-partition global sort.

    ``cols`` must define a total order (include a unique tiebreaker),
    or indices within a tie group are arbitrary.

    The classic distributed pattern: ``repartitionByRange`` range-sorts
    across partitions (partition p holds strictly lower keys than
    p+1), per-partition ``row_number`` numbers locally in parallel,
    and a broadcast cumulative partition-count offset lifts the local
    number to the exact global index. Costs one range shuffle plus one
    hash shuffle on the partition id — both fully parallel — where the
    naive ``Window.orderBy(cols)`` funnels every row through ONE task
    (WindowExec warns "Moving all data to a single partition"), which
    is the canonical 100-TB scale-killer. The index itself is
    boundary-independent, so range-sampling variation cannot change
    the result.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_gidx_pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("_gidx_pid").agg(F.count(F.lit(1)).alias("_gidx_cnt"))
    # The offsets frame has at most num_partitions rows; a global
    # window over it is bounded and cheap.
    wo = Window.orderBy("_gidx_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_gidx_pid",
        F.coalesce(F.sum("_gidx_cnt").over(wo), F.lit(0)).cast("bigint").alias("_gidx_off"),
    )
    wp = Window.partitionBy("_gidx_pid").orderBy(*cols)
    numbered = ranged.withColumn("_gidx_rn", F.row_number().over(wp))
    out = numbered.join(F.broadcast(offsets), "_gidx_pid").withColumn(
        index_name,
        (F.col("_gidx_off") + F.col("_gidx_rn") - F.lit(1)).cast("bigint"),
    )
    return out.drop("_gidx_pid", "_gidx_rn", "_gidx_off")


def with_global_cumsum(
    df,
    values,
    cols: list,
    cumsum_name: str = "_gcsum",
    num_partitions: int | None = None,
):
    """Exact INCLUSIVE running sum(s) in the total order given by
    ``cols`` — the two-level sibling of ``with_global_index`` (range
    shuffle + per-partition running sums + broadcast partition SUM
    offsets) replacing the single-partition ``Window.orderBy``
    cumulative sum, the other canonical 100-TB scale-killer.

    ``values`` is a single column name (output named ``cumsum_name``)
    or a ``{value_col: output_name}`` mapping — every requested
    running sum rides the SAME range shuffle and window pass.
    ``cols`` must define a total order (unique tiebreaker included).
    NULL values contribute 0 by contract (the running sum is the
    total of non-nulls so far — never a NULL output). Integer/decimal
    sums are exact under any partitioning, so the result is
    partitioning-independent; for doubles prefer routing through
    decimal first (the repo-wide determinism contract).
    """
    from pyspark.sql.window import Window

    if isinstance(values, str):
        values = {values: cumsum_name}
    names = list(values.items())
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_gcs_pid", F.spark_partition_id()
    )
    partials = ranged.groupBy("_gcs_pid").agg(
        *[
            F.sum(F.coalesce(F.col(v), F.lit(0))).alias(f"_gcs_sum_{i}")
            for i, (v, _) in enumerate(names)
        ]
    )
    # <= num_partitions rows: the global window here is bounded.
    wo = Window.orderBy("_gcs_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_gcs_pid",
        *[
            F.coalesce(F.sum(f"_gcs_sum_{i}").over(wo), F.lit(0)).alias(
                f"_gcs_off_{i}"
            )
            for i in range(len(names))
        ],
    )
    wp = (
        Window.partitionBy("_gcs_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = ranged.select(
        "*",
        *[
            F.sum(F.coalesce(F.col(v), F.lit(0))).over(wp).alias(f"_gcs_run_{i}")
            for i, (v, _) in enumerate(names)
        ],
    )
    out = run.join(F.broadcast(offsets), "_gcs_pid")
    for i, (_, name) in enumerate(names):
        out = out.withColumn(
            name, F.col(f"_gcs_off_{i}") + F.col(f"_gcs_run_{i}")
        )
    return out.drop(
        "_gcs_pid",
        *[f"_gcs_run_{i}" for i in range(len(names))],
        *[f"_gcs_off_{i}" for i in range(len(names))],
    )


def with_global_cummax(
    df,
    values,
    cols: list,
    cummax_name: str = "_gcmax",
    num_partitions: int | None = None,
    exclusive: bool = False,
):
    """Exact running MAX(s) in the total order given by ``cols`` — the
    max-monoid sibling of ``with_global_cumsum`` (range shuffle +
    per-partition running max + broadcast preceding-partition max
    offsets), again replacing the single-partition ``Window.orderBy``
    running aggregate at scale.

    ``exclusive=True`` gives the STRICTLY-PRECEDING running max (NULL
    for the global first row): per-partition windows end at -1 and the
    partition offset is the max over strictly earlier partitions, so
    exclusivity survives partition boundaries exactly. MAX is an
    order-insensitive monoid, so the result is partitioning-
    independent for any comparable type (no decimal routing needed).
    ``cols`` must define a total order (unique tiebreaker included).
    """
    from pyspark.sql.window import Window

    if isinstance(values, str):
        values = {values: cummax_name}
    names = list(values.items())
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_gcm_pid", F.spark_partition_id()
    )
    partials = ranged.groupBy("_gcm_pid").agg(
        *[
            F.max(F.col(v)).alias(f"_gcm_max_{i}")
            for i, (v, _) in enumerate(names)
        ]
    )
    # <= num_partitions rows: the global window here is bounded.
    wo = Window.orderBy("_gcm_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_gcm_pid",
        *[
            F.max(f"_gcm_max_{i}").over(wo).alias(f"_gcm_off_{i}")
            for i in range(len(names))
        ],
    )
    end = -1 if exclusive else 0
    wp = (
        Window.partitionBy("_gcm_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    run = ranged.select(
        "*",
        *[
            F.max(F.col(v)).over(wp).alias(f"_gcm_run_{i}")
            for i, (v, _) in enumerate(names)
        ],
    )
    out = run.join(F.broadcast(offsets), "_gcm_pid")
    for i, (_, name) in enumerate(names):
        out = out.withColumn(
            name,
            # greatest() skips NULLs only when one side is NULL on
            # some engines; be explicit so exclusive-first-row NULLs
            # propagate and mixed NULL/value takes the value.
            F.when(F.col(f"_gcm_run_{i}").isNull(), F.col(f"_gcm_off_{i}"))
            .when(F.col(f"_gcm_off_{i}").isNull(), F.col(f"_gcm_run_{i}"))
            .otherwise(
                F.greatest(F.col(f"_gcm_run_{i}"), F.col(f"_gcm_off_{i}"))
            ),
        )
    return out.drop(
        "_gcm_pid",
        *[f"_gcm_run_{i}" for i in range(len(names))],
        *[f"_gcm_off_{i}" for i in range(len(names))],
    )
