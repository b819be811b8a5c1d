"""The reference's own test scenario, engine-side (FIXTURES.md §1/§3).

Mirrors ``TestRepository_save`` / ``TestRepository_processLimitHashes``
(hashes_test.go): generate limits_hashes rows the way ``produceLimits``
does, ingest through the idempotent sink, then assert the reference's
verification queries — full count, filtered count == 1 per row,
predicate delete — behave identically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_batcher_spark.sinks.delete import delete_where
from clickhouse_batcher_spark.sinks.parquet_sink import IdempotentParquetSink
from clickhouse_batcher_spark.streaming.batcher import BatcherConfig, MicroBatcher

LIMITS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("amount", T.LongType(), False),  # uint32 range
        T.StructField("msg", T.BinaryType(), True),
        T.StructField("sha256sum", T.StringType(), False),
    ]
)

UINT32_MAX = 2**32 - 1


def limits_rows(spark, count: int, user_id: str = "test_user_001"):
    """produceLimits analogue (hashes_test.go:205-225): sha256sum=str(i),
    amount=i, msg=NULL."""
    return spark.range(1, count + 1).select(
        F.lit(user_id).alias("user_id"),
        F.col("id").alias("amount"),
        F.lit(None).cast("binary").alias("msg"),
        F.col("id").cast("string").alias("sha256sum"),
    )


def test_golden_count_and_row_fidelity(spark, tmp_path):
    """rows-in == rows-in-sink exactly; each row exists exactly once
    (hashes_test.go:130-131, 191-203)."""
    count = 5000
    df = limits_rows(spark, count)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))

    src = str(tmp_path / "src")
    df.repartition(5).write.parquet(src)
    batcher = MicroBatcher(
        sink, BatcherConfig(trigger_interval="500 milliseconds", max_files_per_trigger=2)
    )
    batcher.run_until_drained(
        batcher.file_source(spark, src, LIMITS_SCHEMA), str(tmp_path / "ckpt")
    )

    stored = sink.read(spark)
    assert stored.count() == count

    # Q2 analogue: conjunctive-equality lookup finds each row exactly once.
    probe = stored.filter(
        (F.col("user_id") == "test_user_001")
        & (F.col("amount") == 42)
        & (F.col("sha256sum") == "42")
    )
    assert probe.count() == 1
    # msg round-trips as NULL (hashes_test.go:210)
    assert probe.collect()[0]["msg"] is None

    # no row duplicated: (amount, sha256sum) unique
    assert stored.select("amount", "sha256sum").distinct().count() == count


def test_predicate_delete_clears_user(spark):
    """clearLimitsHashes analogue (hashes_test.go:235-239)."""
    df = limits_rows(spark, 100).unionByName(
        limits_rows(spark, 50, user_id="other_user")
    )
    remaining = delete_where(df, F.col("user_id") == "test_user_001")
    assert remaining.count() == 50
    assert remaining.filter(F.col("user_id") == "test_user_001").count() == 0


def test_uint32_amount_range_semantics(spark):
    """SURVEY §1.2: amount is uint32 on LongType with a range check."""
    ok = spark.createDataFrame(
        [("u", 0, None, "h"), ("u", UINT32_MAX, None, "h2")], LIMITS_SCHEMA
    )
    bad = spark.createDataFrame(
        [("u", -1, None, "h"), ("u", UINT32_MAX + 1, None, "h2")], LIMITS_SCHEMA
    )
    in_range = F.col("amount").between(0, UINT32_MAX)
    assert ok.filter(~in_range).count() == 0
    assert bad.filter(~in_range).count() == 2


def test_sha256sum_reproducible_engine_side(spark):
    """The reference receives sha256sum as input (hashes.go:25); the
    engine can derive it: sha2(msg) matches a Python-computed digest."""
    import hashlib

    payload = b"limit payload 123"
    df = spark.createDataFrame(
        [("u", 1, payload, hashlib.sha256(payload).hexdigest())], LIMITS_SCHEMA
    )
    derived = df.select(
        (F.sha2(F.col("msg"), 256) == F.col("sha256sum")).alias("match")
    )
    assert derived.collect()[0]["match"] is True


def test_reference_queries_run_as_clickhouse_sql(spark, tmp_path):
    """The reference's verification queries in their ORIGINAL dialect:
    `SELECT count() FROM limits_hashes ...` (hashes_test.go:191-233,
    verbatim ClickHouse SQL) must run against the ingested sink through
    the chsql switching path and return the golden counts."""
    from clickhouse_batcher_spark.plans.chsql import translate

    count = 1000
    df = limits_rows(spark, count)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))

    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)
    batcher = MicroBatcher(sink, BatcherConfig(max_files_per_trigger=1))
    batcher.run_until_drained(
        batcher.file_source(spark, src, LIMITS_SCHEMA), str(tmp_path / "ckpt")
    )
    sink.read(spark).createOrReplaceTempView("limits_hashes")

    # hashes_test.go:227-233 — the full count.
    q1 = translate("SELECT count() FROM limits_hashes")
    assert spark.sql(q1).collect()[0][0] == count

    # hashes_test.go:191-203 — per-row conjunctive filtered count == 1.
    q2 = translate(
        "SELECT count() FROM limits_hashes "
        "WHERE user_id = 'test_user_001' AND sha256sum = '42' AND amount = 42"
    )
    assert spark.sql(q2).collect()[0][0] == 1

    # A dialect-heavy analytics query over the same sink.
    q3 = translate(
        "SELECT uniqExact(user_id), argMax(sha256sum, amount), "
        "sumIf(amount, amount <= 10) FROM limits_hashes"
    )
    row = spark.sql(q3).collect()[0]
    assert tuple(row) == (1, str(count), 55)
