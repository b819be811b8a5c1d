"""SparkSession factory with scale-minded defaults.

Local testing runs on ``local[N]`` but every default here is chosen to
also be correct on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) so plans re-optimize with real statistics;
- shuffle partitions sized from the env (cores locally; on a cluster
  this would be ~2-3x total cores, and AQE coalesces down);
- session timezone pinned to UTC so results are reproducible and
  oracle-comparable (DuckDB timestamps are UTC-naive);
- Arrow enabled for any pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def tune_session(spark: SparkSession) -> None:
    """Idempotent tuning for externally-built sessions (e.g. the
    driver's): if the session still has Spark's stock 200 shuffle
    partitions (25x over-parallelized for every local run), set it to
    the actual parallelism. Touches nothing a user configured
    explicitly — 200 is only ever the untouched default. Sessions from
    :func:`get_session` already size this correctly."""
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass
    # The TIMESTAMP_NTZ branch in tables._normalize_ts reinterprets
    # NTZ wall-clock as an instant in the SESSION timezone; that is
    # only oracle-exact when the session runs UTC. get_session pins
    # it, but externally-built sessions (the driver's) inherit the
    # JVM default — pin it here too, with the same only-if-untouched
    # rule as above: if the conf still equals the JVM default TZ the
    # user never chose it explicitly.
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
        jvm_default = spark._jvm.java.util.TimeZone.getDefault().getID()
        if tz == jvm_default and tz != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def get_session(
    app_name: str = "clickhouse_batcher_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a
    real cluster the master/resource settings come from spark-submit;
    everything set here is cluster-safe.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
