"""ClickHouse JDBC sink: batched, idempotent, retry-guarded append.

Spark-first restatement of the reference's connection + delivery layer:

- DSN/config -> JDBC options (``connect.go:37-53``): compression
  (LZ4, ``hashes_test.go:306-308``), query timeout
  (``hashes_test.go:302-304``), bounded connection parallelism
  (pool limits, ``hashes_test.go:311-313`` -> ``numPartitions``).
- ping-with-retry before first use (``connect.go:38-41, 56-64``):
  up to ``ping_count`` attempts, ``ping_interval_s`` apart, via a
  1-row JDBC probe.
- ``enabled`` gate (``connect.go:28-36``, ``hashes.go:12-15``):
  a disabled sink silently drops batches, as the reference does.
- exactly-once: a ``batch_ledger`` table keyed on ``batch_id``
  replaces the in-memory ``isSent`` flag (``hashes.go:70-83``) —
  ClickHouse has no transactions, so the ledger row is written after
  the data insert and replays of committed ids are skipped; an
  uncommitted replay re-inserts into a fresh part and relies on
  ClickHouse ``insert_deduplication`` (identical block hash) or a
  ReplacingMergeTree key to collapse duplicates.

No ClickHouse server (or its JDBC driver jar) exists in the test
container, so connectivity is exercised only when the driver jar is on
the classpath; unit tests cover option construction, the enabled gate,
and ledger semantics against a local stand-in.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from clickhouse_batcher_spark.sinks.base import BatchSink


@dataclass
class ClickHouseSinkConfig:
    url: str = "jdbc:clickhouse://localhost:8123/default"
    table: str = "limits_hashes"
    user: str = "default"
    password: str = ""
    enabled: bool = True
    # Reference operating constants.
    ping_count: int = 4          # connect.go:38-41
    ping_interval_s: float = 1.0
    query_timeout_s: int = 60    # hashes_test.go:302-304
    compression: str = "lz4"     # hashes_test.go:306-308
    max_connections: int = 10    # hashes_test.go:311-313 -> numPartitions
    batch_size: int = 10_000     # hashes.go:68 flush threshold
    ledger_table: str = "batch_ledger"
    extra_options: dict[str, str] = field(default_factory=dict)

    def jdbc_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "driver": "com.clickhouse.jdbc.ClickHouseDriver",
            "batchsize": str(self.batch_size),
            "isolationLevel": "NONE",  # ClickHouse has no transactions
            "numPartitions": str(self.max_connections),
            "queryTimeout": str(self.query_timeout_s),
            "compress_algorithm": self.compression,
        }
        opts.update(self.extra_options)
        return opts


class ClickHouseSink(BatchSink):
    def __init__(self, config: ClickHouseSinkConfig) -> None:
        self.config = config
        self._pinged = False
        self._committed: set[int] | None = None

    # -- connectivity ---------------------------------------------------
    def ping(self, spark) -> bool:
        """Bounded-retry 1-row probe, mirroring connect.go:56-64."""
        last_err: Exception | None = None
        for attempt in range(self.config.ping_count):
            try:
                (
                    spark.read.format("jdbc")
                    .options(**{**self.config.jdbc_options(), "query": "SELECT 1"})
                    .load()
                    .collect()
                )
                self._pinged = True
                return True
            except Exception as exc:  # noqa: BLE001 - retry any driver error
                last_err = exc
                if attempt + 1 < self.config.ping_count:
                    time.sleep(self.config.ping_interval_s)
        raise ConnectionError(
            f"clickhouse ping failed after {self.config.ping_count} attempts"
        ) from last_err

    # -- ledger ---------------------------------------------------------
    def _load_committed(self, spark) -> set[int]:
        if self._committed is None:
            try:
                rows = (
                    spark.read.format("jdbc")
                    .options(
                        **{
                            **self.config.jdbc_options(),
                            "dbtable": self.config.ledger_table,
                        }
                    )
                    .load()
                    .select("batch_id")
                    .collect()
                )
                self._committed = {int(r[0]) for r in rows}
            except Exception:  # table absent on first run
                self._committed = set()
        return self._committed

    # -- sink -----------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        if not self.config.enabled:
            return False  # reference gate: disabled pipeline drops rows
        spark = df.sparkSession
        if not self._pinged:
            self.ping(spark)
        if batch_id in self._load_committed(spark):
            return False
        (
            df.write.format("jdbc")
            .options(**self.config.jdbc_options())
            .mode("append")
            .save()
        )
        ledger_row = spark.createDataFrame(
            [(int(batch_id),)], "batch_id BIGINT"
        )
        (
            ledger_row.write.format("jdbc")
            .options(
                **{**self.config.jdbc_options(), "dbtable": self.config.ledger_table}
            )
            .mode("append")
            .save()
        )
        self._committed.add(int(batch_id))
        return True
