"""Table loading and registration for the driver testdata layout.

One parquet file per table under ``<sf_dir>/<name>.parquet``
(``TESTDATA.md``). Loading is lazy and declarative: a plain
``spark.read.parquet`` scan so Catalyst keeps predicate pushdown,
column pruning and partition pruning. At 100 TB each table would be a
partitioned/bucketed directory tree instead of a single file — the
reader is agnostic to that (the path just becomes a directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small relative to the fact tables
# (region/nation are fixed-size; customer/supplier/part grow ~linearly
# but stay orders of magnitude below lineitem/orders/events). These
# are the broadcast-join candidates at any scale factor.
SMALL_DIMS = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _tune_session(spark: SparkSession) -> None:
    """If the session still has Spark's stock 200 shuffle partitions
    (wrong for every local run: 25x over-parallelized per stage), set
    it to the actual parallelism. Touches nothing a user configured
    explicitly — 200 is only ever the untouched default."""
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune_session(spark)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects natively. Read it as epoch-nanos LONG and truncate to
        # Spark's microsecond timestamps with integer division (a
        # double division would lose precision above 2^53 ns). The
        # DuckDB oracle side mirrors this with CAST(ts AS TIMESTAMP)
        # (ns -> us truncation), so both engines see identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the spark.sql surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
