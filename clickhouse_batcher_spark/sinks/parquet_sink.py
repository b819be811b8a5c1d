"""Idempotent parquet sink: batch-partitioned append with a ledger.

Layout::

    <root>/data/_batch_id=<N>/part-*.parquet   -- one dir per batch
    <root>/_ledger/<N>                         -- commit marker

Exactly-once logic (replaces the reference's racy in-memory ``isSent``
flag, ``hashes.go:70-83``):

- a batch is *committed* iff its ledger marker exists;
- ``write_batch`` on a committed batch_id is a no-op (replay-safe);
- an uncommitted replay **overwrites** that batch's partition
  directory, so a crash between data-write and marker-write heals on
  retry instead of duplicating rows (the reference's TOCTOU window).

Scale: the data dir is a normal partitioned parquet dataset — at
100 TB this is exactly how a streaming ingest lands on a data lake
(partition per micro-batch, compaction downstream). The ledger is one
tiny marker file per batch; readers never touch it. Writing uses the
executors (distributed); only the marker touch is driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.sinks.base import BatchSink


class IdempotentParquetSink(BatchSink):
    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")
        self.data_dir = f"{self.root}/data"
        self.ledger_dir = f"{self.root}/_ledger"
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- ledger ---------------------------------------------------------
    def _marker(self, batch_id: int) -> str:
        return f"{self.ledger_dir}/{int(batch_id)}"

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def committed_batches(self) -> list[int]:
        return sorted(int(p) for p in os.listdir(self.ledger_dir))

    # -- sink -----------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        if self.is_committed(batch_id):
            return False  # replay of a committed batch: exactly-once no-op
        batch_dir = f"{self.data_dir}/_batch_id={int(batch_id)}"
        # Overwrite (not append) the single batch partition: heals
        # partial writes from a crashed earlier attempt. Row count is
        # observed DURING the write — a pre-write isEmpty() would be a
        # second scan of the source (and double numInputRows in
        # streaming metrics).
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(batch_dir)
        if obs.get["rows"] == 0:
            # reference empty-skip (hashes.go:79): no data, no marker —
            # the id stays free for a later real batch
            import shutil

            shutil.rmtree(batch_dir, ignore_errors=True)
            return False
        with open(self._marker(batch_id), "w") as fh:
            fh.write("committed")
        return True

    # -- read-back ------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """Read back every committed batch (uncommitted dirs excluded)."""
        committed = self.committed_batches()
        if not committed:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        df = (
            spark.read.option("basePath", self.data_dir)
            .parquet(*[f"{self.data_dir}/_batch_id={b}" for b in committed])
        )
        return df.drop("_batch_id") if "_batch_id" in df.columns else df

    def count(self, spark: SparkSession) -> int:
        return self.read(spark).agg(F.count(F.lit(1))).collect()[0][0]


    # -- maintenance ----------------------------------------------------
    def compact(self, spark: SparkSession, target_files: int = 8) -> int:
        """Consolidate all committed batch directories into one compacted
        batch. Micro-batch ingest leaves one small directory per batch;
        compaction rewrites them as ``target_files`` files under a fresh
        batch id and retires the old ids — the standard small-files
        maintenance job, run out-of-band (streaming ingest can continue
        appending new batch ids meanwhile; only the ids captured at the
        start are retired).

        Compacted batches live in a DISJOINT id space — negative ids
        counting down from -1. Producers (engine resume, streaming
        epochs) only ever allocate ids >= 0, so a compaction running
        concurrently with live ingest can never mint an id the stream
        is about to use (which would make ``is_committed`` silently
        swallow that stream batch while its checkpoint advanced —
        permanent row loss).

        Crash-safe ordering: write compacted data, commit its marker,
        then drop old markers before old data — a crash in between
        leaves either extra (ignored) data dirs or a fully valid state,
        never missing rows.
        """
        import shutil

        old_ids = self.committed_batches()
        if not old_ids:
            return 0
        new_id = min(0, min(old_ids)) - 1
        df = spark.read.option("basePath", self.data_dir).parquet(
            *[f"{self.data_dir}/_batch_id={b}" for b in old_ids]
        )
        if "_batch_id" in df.columns:
            df = df.drop("_batch_id")
        df.coalesce(target_files).write.mode("overwrite").parquet(
            f"{self.data_dir}/_batch_id={new_id}"
        )
        with open(self._marker(new_id), "w") as fh:
            fh.write("compacted")
        for b in old_ids:
            os.remove(self._marker(b))
        for b in old_ids:
            shutil.rmtree(f"{self.data_dir}/_batch_id={b}", ignore_errors=True)
        return new_id
