"""Per-batch ingest metrics — the reference's structured debug events.

The reference logs ``"hashes batch saved, len=N"`` per flush
(``hashes.go:84``). The Spark-native equivalent is a
``StreamingQueryListener``: progress events carry rows-per-batch,
batch duration, and source/sink state, with no instrumentation inside
the hot path.
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("clickhouse_batcher_spark.ingest")


class IngestMetricsListener(StreamingQueryListener):
    """Collects (batch_id, num_input_rows, duration_ms) per progress
    event and logs the reference-style line."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        logger.info("ingest query started: %s", event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": p.durationMs.get("triggerExecution"),
        }
        self.batches.append(rec)
        # The reference's debug line, hashes.go:84.
        logger.info("batch saved, len=%d", p.numInputRows)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        logger.info("ingest query terminated: %s", event.id)

    @property
    def total_rows(self) -> int:
        return sum(b["num_input_rows"] for b in self.batches)
