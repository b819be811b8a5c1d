"""Live-ClickHouse integration tests — docker-gated, skip-if-absent.

The reference's strongest coverage is dockertest against a real
server: a golden-count matrix over trigger regimes
(``hashes_test.go:87-113``) and per-row fidelity readback
(``hashes_test.go:136-189``). No server or JDBC driver jar exists in
the CI sandbox, so every test here gates on BOTH and skips cleanly
otherwise. To run them for real:

    docker run -d --name ch -p 8123:8123 clickhouse/clickhouse-server
    pytest tests/test_clickhouse_live.py \
        --deselect-none  # with the ClickHouse JDBC jar on the Spark
                         # classpath, e.g. via spark.jars in conftest
                         # or SPARK_SUBMIT_OPTS=--jars=clickhouse-jdbc-all.jar

Environment overrides: CLICKHOUSE_HOST / CLICKHOUSE_HTTP_PORT /
CLICKHOUSE_JDBC_URL / CLICKHOUSE_USER / CLICKHOUSE_PASSWORD.
"""

from __future__ import annotations

import os
import socket

import pytest

from clickhouse_batcher_spark.plans.ddl import clickhouse_migrations
from clickhouse_batcher_spark.sinks.clickhouse import (
    ClickHouseSink,
    ClickHouseSinkConfig,
)
from clickhouse_batcher_spark.streaming.batcher import BatcherConfig, MicroBatcher

CH_HOST = os.environ.get("CLICKHOUSE_HOST", "localhost")
CH_PORT = int(os.environ.get("CLICKHOUSE_HTTP_PORT", "8123"))
CH_URL = os.environ.get(
    "CLICKHOUSE_JDBC_URL", f"jdbc:clickhouse://{CH_HOST}:{CH_PORT}/default"
)
CH_USER = os.environ.get("CLICKHOUSE_USER", "default")
CH_PASSWORD = os.environ.get("CLICKHOUSE_PASSWORD", "")

ROW_SCHEMA = "user_id STRING, amount BIGINT, msg STRING, sha256sum STRING"


def _server_reachable() -> bool:
    try:
        with socket.create_connection((CH_HOST, CH_PORT), timeout=1.5):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _server_reachable(),
    reason=f"no live ClickHouse server at {CH_HOST}:{CH_PORT} "
    "(start one: docker run -d -p 8123:8123 clickhouse/clickhouse-server)",
)


def _sink_config(**overrides) -> ClickHouseSinkConfig:
    return ClickHouseSinkConfig(
        url=CH_URL, user=CH_USER, password=CH_PASSWORD, **overrides
    )


@pytest.fixture(scope="module")
def ch_conn(spark):
    """Raw JDBC connection via py4j for DDL + readback assertions
    (Spark's JDBC source cannot run arbitrary statements)."""
    try:
        spark._jvm.java.lang.Class.forName("com.clickhouse.jdbc.ClickHouseDriver")
    except Exception:
        pytest.skip("ClickHouse JDBC driver jar not on the Spark classpath")
    conn = spark._jvm.java.sql.DriverManager.getConnection(
        CH_URL, CH_USER, CH_PASSWORD
    )
    yield conn
    conn.close()


def _exec(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _scalar(conn, sql: str) -> int:
    st = conn.createStatement()
    try:
        rs = st.executeQuery(sql)
        assert rs.next()
        return int(rs.getLong(1))
    finally:
        st.close()


@pytest.fixture()
def fresh_tables(ch_conn):
    """Apply the engine's own migrations (plans/ddl.py), then start
    each test from empty tables — the reference's clearLimitsHashes."""
    for mig in clickhouse_migrations():
        _exec(ch_conn, mig.sql)
    _exec(ch_conn, "TRUNCATE TABLE limits_hashes")
    _exec(ch_conn, "TRUNCATE TABLE batch_ledger")
    return ch_conn


def _hash_rows(spark, n: int, tag: str):
    """n deterministic limits_hashes rows (the reference's produceLimits)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(F.lit(f"user_{tag}_"), F.col("id")).alias("user_id"),
            (F.col("id") % 100000).cast("bigint").alias("amount"),
            F.concat(F.lit("msg_"), F.col("id")).alias("msg"),
            F.sha2(F.concat(F.lit(tag), F.col("id").cast("string")), 256).alias(
                "sha256sum"
            ),
        )
    )


# Golden-count matrix mirroring hashes_test.go:87-113: exact row
# conservation across a size-capped regime (many small batches), a
# time-only regime (one big flush), and a mixed regime.
@pytest.mark.parametrize(
    "n_rows,n_files,max_files",
    [(10_000, 8, 1), (8_000, 8, 100), (5_000, 6, 2)],
    ids=["size_capped", "single_flush", "mixed"],
)
def test_live_golden_count(
    spark, fresh_tables, tmp_path, n_rows, n_files, max_files
):
    src = str(tmp_path / "src")
    rows = _hash_rows(spark, n_rows, f"gc{n_files}x{max_files}")
    rows.repartition(n_files).write.mode("overwrite").parquet(src)

    sink = ClickHouseSink(_sink_config())
    batcher = MicroBatcher(
        sink,
        BatcherConfig(
            trigger_interval="1 second", max_files_per_trigger=max_files
        ),
    )
    source = batcher.file_source(spark, src, rows.schema)
    batcher.run_until_drained(source, str(tmp_path / "ckpt"))

    got = _scalar(fresh_tables, "SELECT count(*) FROM limits_hashes")
    assert got == n_rows  # exact: no loss, no duplication


def test_live_row_fidelity_readback(spark, fresh_tables):
    """hashes_test.go:136-189: every saved row must be retrievable by
    (user_id, amount, sha256sum) — field-level delivery fidelity, not
    just a count."""
    cases = [
        ("test_user_001_Bchs76uZfZ", 112233, "m1"),
        ("test_user_001_OYQUaaHwpm", 102103, "m2"),
        ("test_user_002_nmJZMXfS7B", 2002, "m3"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(cases, "user_id STRING, amount BIGINT, msg STRING")
    df = df.withColumn("sha256sum", F.sha2(F.col("msg"), 256))
    expected = {
        (r["user_id"], r["amount"], r["sha256sum"]) for r in df.collect()
    }
    sink = ClickHouseSink(_sink_config())
    assert sink.write_batch(df, batch_id=0) is True
    for user_id, amount, sha in expected:
        got = _scalar(
            fresh_tables,
            "SELECT count(*) FROM limits_hashes "
            f"WHERE user_id = '{user_id}' AND amount = {amount} "
            f"AND sha256sum = '{sha}'",
        )
        assert got == 1, (user_id, amount, sha)


def test_live_replay_is_idempotent(spark, fresh_tables):
    """The ledger replaces the reference's in-memory isSent flag
    (hashes.go:70-83): a committed batch id is skipped on replay, even
    by a FRESH sink instance that must discover it from the server."""
    df = _hash_rows(spark, 500, "replay")
    sink = ClickHouseSink(_sink_config())
    assert sink.write_batch(df, batch_id=7) is True
    assert sink.write_batch(df, batch_id=7) is False  # in-memory skip
    fresh = ClickHouseSink(_sink_config())
    assert fresh.write_batch(df, batch_id=7) is False  # ledger skip
    got = _scalar(fresh_tables, "SELECT count(*) FROM limits_hashes")
    assert got == 500
    assert fresh.next_batch_id(spark) == 8
