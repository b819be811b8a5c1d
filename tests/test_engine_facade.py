"""BatcherEngine facade: the reference's API surface end-to-end."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from clickhouse_batcher_spark import BatcherEngine, EngineConfig
from clickhouse_batcher_spark.plans.migrations import Migration
from clickhouse_batcher_spark.sinks.parquet_sink import IdempotentParquetSink

SCHEMA = "user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING"


def _row(i: int, user: str = "test_user_001") -> tuple:
    return (user, i, None, str(i))


def test_save_async_size_flush_and_queries(spark, tmp_path):
    """SaveAsync -> size-capped flushes -> Q1/Q2/Q3 verification."""
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(
        spark, sink, SCHEMA, EngineConfig(max_batch_rows=1000)
    )
    eng.connect()
    for i in range(1, 2501):
        eng.save_async(_row(i))
    eng.close()  # flush tail

    assert eng.count() == 2500  # Q1 golden count
    assert sink.committed_batches() == [0, 1, 2]  # 2 size-capped + tail
    # Q2: each row exists exactly once
    assert eng.filtered_count(user_id="test_user_001", amount=42, sha256sum="42") == 1
    # Q3: predicate delete
    remaining = eng.delete_where(F.col("amount") <= 500)
    assert remaining.count() == 2000


def test_disabled_engine_drops_rows(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(spark, sink, SCHEMA, EngineConfig(enabled=False))
    assert eng.save_async(_row(1)) is False
    eng.close()
    assert sink.committed_batches() == []


def test_timer_flush(spark, tmp_path):
    """The reference's ticker path: rows flush without hitting the cap."""
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(
        spark,
        sink,
        SCHEMA,
        EngineConfig(max_batch_rows=1_000_000, flush_interval_s=0.5),
    )
    for i in range(1, 51):
        eng.save_async(_row(i))
    eng.start_auto_flush()
    deadline = time.time() + 10
    while time.time() < deadline and not sink.committed_batches():
        time.sleep(0.2)
    eng.stop_auto_flush()
    assert sink.committed_batches()  # flushed by timer, not by cap
    assert eng.count() == 50


def test_engine_migrations_and_sql(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(
        spark,
        sink,
        SCHEMA,
        EngineConfig(
            migrations=[
                Migration(1, "v", "CREATE OR REPLACE TEMP VIEW eng_v AS SELECT 7 AS x")
            ],
            migration_state_path=str(tmp_path / "mig.json"),
        ),
    )
    assert eng.up_migrations() == [1]
    assert eng.sql("SELECT x FROM eng_v").collect()[0][0] == 7
    assert eng.up_migrations() == []


def test_engine_streaming_path(spark, sf_dir, tmp_path):
    """ProcessHashes analogue through the facade."""
    from clickhouse_batcher_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(spark, sink, events.schema, EngineConfig())
    q = eng.process_stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert eng.count() == events.count()


def test_new_engine_on_existing_sink_does_not_lose_data(spark, tmp_path):
    """Regression: a fresh engine must resume batch ids after the
    sink's ledger, not restart at 0 (which the ledger would skip as a
    replay -> silent data loss)."""
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng1 = BatcherEngine(spark, sink, SCHEMA, EngineConfig())
    for i in range(1, 101):
        eng1.save_async(_row(i))
    eng1.close()
    assert eng1.count() == 100

    eng2 = BatcherEngine(
        spark, IdempotentParquetSink(str(tmp_path / "sink")), SCHEMA, EngineConfig()
    )
    for i in range(101, 151):
        eng2.save_async(_row(i))
    eng2.close()
    assert eng2.count() == 150  # not 100: second engine's batch landed


def test_empty_batch_not_committed(spark, tmp_path):
    """Reference empty-skip (hashes.go:79): an empty batch writes no
    data, no marker — the id stays free for a later real batch."""
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    empty = spark.createDataFrame([], SCHEMA)
    assert sink.write_batch(empty, batch_id=0) is False
    assert sink.committed_batches() == []
    full = spark.createDataFrame([_row(1)], SCHEMA)
    assert sink.write_batch(full, batch_id=0) is True  # id not burned


def test_compact_ids_disjoint_from_live_producer(spark, tmp_path):
    """Regression (round-2 advice): compact() used to mint
    max(old_ids)+1 — exactly the id a live producer would use next, so
    that producer's batch was silently skipped as a replay. Compacted
    batches now live in a negative id space."""
    sink = IdempotentParquetSink(str(tmp_path / "sink"))
    eng = BatcherEngine(spark, sink, SCHEMA, EngineConfig(max_batch_rows=10))
    for i in range(1, 21):
        eng.save_async(_row(i))  # batches 0 and 1
    new_id = sink.compact(spark, target_files=1)
    assert new_id < 0  # disjoint from any producer id
    # The live engine keeps counting 0,1,2... — its next batch must
    # land, not be swallowed by a marker compact() just minted.
    for i in range(21, 31):
        eng.save_async(_row(i))
    eng.close()
    assert eng.count() == 30
    # A second compaction mints a fresh negative id below the first.
    assert sink.compact(spark, target_files=1) < new_id


def test_clickhouse_next_batch_id_resumes_from_ledger():
    """Regression (round-2 advice): a fresh engine over an existing
    ClickHouse ledger must resume past max(batch_id), not restart at 0
    (write_batch would skip 0 as a replay -> silent data loss)."""
    from clickhouse_batcher_spark.sinks.clickhouse import (
        ClickHouseSink,
        ClickHouseSinkConfig,
    )

    class FakeReader:
        """Models the bounded ledger protocol: the first read is the
        server-side MAX("batch_id") probe (one row), the second is the
        filter-pushed recent-window scan."""

        def __init__(self):
            self.collects = 0

        def format(self, *_): return self
        def options(self, **_): return self
        def load(self): return self
        def filter(self, *_): return self
        def select(self, *_): return self

        def collect(self):
            # collect 1 = ping (SELECT 1), 2 = MAX("batch_id") probe,
            # 3+ = the filter-pushed recent-window id scan.
            self.collects += 1
            if self.collects == 1:
                return [(1,)]
            if self.collects == 2:
                return [(3,)]
            return [(0,), (3,), (2,)]

    class FakeSpark:
        read = FakeReader()

    sink = ClickHouseSink(ClickHouseSinkConfig())
    assert sink.next_batch_id(FakeSpark()) == 4
    # The engine consumes the hook LAZILY (round-3 advice): construction
    # must be side-effect-free — no JDBC ping until connect/first flush.
    class ExplodingSpark:
        @property
        def read(self):
            raise AssertionError("engine construction touched the sink")

    eng = BatcherEngine(ExplodingSpark(), sink, SCHEMA, EngineConfig())
    assert eng._next_batch_id is None
    eng.spark = FakeSpark()
    assert eng._resolve_next_batch_id() == 4
    assert eng._next_batch_id == 4


def test_clickhouse_disabled_sink_is_inert_on_resume():
    """Round-3 advice: a disabled sink (connect.go:28-36 gate) must not
    ping or read its ledger from next_batch_id — it never writes, so
    its resume point is trivially 0 and construction stays offline."""
    from clickhouse_batcher_spark.sinks.clickhouse import (
        ClickHouseSink,
        ClickHouseSinkConfig,
    )

    class ExplodingSpark:
        @property
        def read(self):
            raise AssertionError("disabled sink performed JDBC I/O")

    sink = ClickHouseSink(ClickHouseSinkConfig(enabled=False))
    assert sink.next_batch_id(ExplodingSpark()) == 0
    eng = BatcherEngine(ExplodingSpark(), sink, SCHEMA, EngineConfig())
    assert eng._resolve_next_batch_id() == 0


def test_multisink_next_batch_id_covers_every_child(spark, tmp_path):
    from clickhouse_batcher_spark.sinks.base import MultiSink

    a = IdempotentParquetSink(str(tmp_path / "a"))
    b = IdempotentParquetSink(str(tmp_path / "b"))
    df = spark.createDataFrame([_row(1)], SCHEMA)
    a.write_batch(df, 0)
    a.write_batch(df, 1)
    b.write_batch(df, 0)
    assert MultiSink([a, b]).next_batch_id(spark) == 2


def test_clickhouse_ping_retry_then_success(monkeypatch):
    """connect.go:56-64 semantics: up to 4 attempts, then success."""
    from clickhouse_batcher_spark.sinks.clickhouse import (
        ClickHouseSink,
        ClickHouseSinkConfig,
    )

    attempts = {"n": 0}

    class FakeReader:
        def format(self, *_): return self
        def options(self, **_): return self
        def load(self):
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise RuntimeError("connection refused")
            return self
        def collect(self): return []

    class FakeSpark:
        read = FakeReader()

    sink = ClickHouseSink(ClickHouseSinkConfig(ping_interval_s=0.01))
    assert sink.ping(FakeSpark()) is True
    assert attempts["n"] == 3


def test_clickhouse_ping_exhausts_retries(monkeypatch):
    from clickhouse_batcher_spark.sinks.clickhouse import (
        ClickHouseSink,
        ClickHouseSinkConfig,
    )

    class FailReader:
        def format(self, *_): return self
        def options(self, **_): return self
        def load(self): raise RuntimeError("down")

    class FakeSpark:
        read = FailReader()

    sink = ClickHouseSink(
        ClickHouseSinkConfig(ping_count=2, ping_interval_s=0.01)
    )
    import pytest as _pytest

    with _pytest.raises(ConnectionError, match="after 2 attempts"):
        sink.ping(FakeSpark())
