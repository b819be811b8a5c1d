"""Streaming at-ingestion quality gate.

The reference engine's whole job is micro-batched ingestion
(`hashes.go:33-66` — size-or-time flush into ClickHouse); a training
-data pipeline's ingestion adds one step to that loop: score each
arriving document and keep/flag it BEFORE it lands. This module
composes the engine's two quality signals — the Gopher structural
rule and the distilled NB classifier (operators/classifier.py) —
into a `readStream` -> `foreachBatch` gate, the same shape as the
near-dup gates in `streaming/neardup.py`.

The model is trained ONCE on a reference corpus (`nb_train`, a
256-row broadcastable LLR table + 1-row prior) and applied unchanged
to every micro-batch (`nb_score`). Because scores are decimal-exact,
the gate's verdicts are bit-identical to scoring the same documents
in one batch job — pinned by the stream==batch equivalence test, cut
-invariant by construction (per-doc scores never cross batch
boundaries).

Scale: the model is constant-size (broadcast); each micro-batch does
one token explode + one broadcast join + one doc-keyed sum — no
state store, no growth. Output is parquet partitioned by `_batch_id`
(the `foreachBatch` idempotence convention used engine-wide).
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import DataFrame, SparkSession

from clickhouse_batcher_spark.operators.classifier import (
    nb_score,
    nb_train,
)


def train_gate_model(reference_docs: DataFrame):
    """Train the gate's model on the reference corpus; the caller
    should cache/materialize both frames (they are tiny)."""
    return nb_train(reference_docs)


def score_batch(
    batch: DataFrame, llr: DataFrame, pri: DataFrame
) -> DataFrame:
    """Verdict frame for one micro-batch: (doc_id, teacher_keep,
    n_tokens, nb_logodds, nb_keep)."""
    return nb_score(batch, llr, pri)


def _write_batch_scores(llr, pri, out_dir, batch: DataFrame, batch_id: int):
    (
        score_batch(batch, llr, pri)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/_batch_id={batch_id}")
    )


def run_streaming_quality_gate(
    spark: SparkSession,
    src_dir: str,
    schema,
    llr: DataFrame,
    pri: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a file-source document stream through the quality gate
    (availableNow, so tests and backfills terminate)."""
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    (
        source.writeStream.foreachBatch(
            partial(_write_batch_scores, llr, pri, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# The full at-ingestion pipeline: quality gate -> self-indexing dedup
# gate, composed in ONE foreachBatch — the reference's micro-batch
# ingest loop (hashes.go:33-66) with the two curation stages a
# training-data pipeline runs before rows land. Rejected documents
# never reach the dedup index (the real pipelines' property: junk
# must not shadow later good near-dups), and the dedup stage inherits
# the self-indexing gate's replay safety unchanged.
# ---------------------------------------------------------------------------
def _pipeline_batch(
    llr,
    pri,
    verdicts_dir: str,
    dedup_out_dir: str,
    index_dir: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    from clickhouse_batcher_spark.streaming.neardup import _ingest_batch

    verdicts = score_batch(batch, llr, pri).cache()
    verdicts.write.mode("overwrite").parquet(
        f"{verdicts_dir}/_batch_id={batch_id}"
    )
    kept_ids = verdicts.filter("teacher_keep").select("doc_id")
    kept = batch.join(kept_ids, "doc_id")
    _ingest_batch(index_dir, dedup_out_dir, kept, batch_id)
    verdicts.unpersist()


def run_streaming_ingest_pipeline(
    spark: SparkSession,
    src_dir: str,
    schema,
    llr: DataFrame,
    pri: DataFrame,
    verdicts_dir: str,
    dedup_out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Quality-gate then dedup-gate every micro-batch; both outputs
    are parquet partitioned by ``_batch_id`` (replay-idempotent)."""
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    query = (
        source.writeStream.foreachBatch(
            partial(
                _pipeline_batch,
                llr,
                pri,
                verdicts_dir,
                dedup_out_dir,
                index_dir,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()


# ---------------------------------------------------------------------------
# Streaming quality-drift monitor: per-micro-batch PSI vs a baseline
# ---------------------------------------------------------------------------
# The batch-side analogue is operators/classifier.quality_psi_by_source
# (per SOURCE vs the corpus); here the comparison is per MICRO-BATCH vs
# the training-time baseline — the monitor that catches a feed whose
# quality distribution drifts away from what the gate's model was
# trained on (retrain trigger), hours before aggregate keep-rates move.
PSI_ALERT = 0.25  # the classic "major shift" threshold
_PSI_BINS = 10


def baseline_bin_counts(verdicts: DataFrame) -> dict[int, int]:
    """10-bin sigmoid(log-odds) histogram of a scored reference frame
    — the drift baseline. Bounded collect (10 rows)."""
    from pyspark.sql import functions as F

    rows = (
        verdicts.select(
            F.least(
                F.floor(
                    F.round(
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.col("nb_logodds"))),
                        6,
                    ).cast("decimal(9,6)")
                    * 10
                ),
                F.lit(_PSI_BINS - 1),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .count()
        .collect()
    )
    return {int(r["bin"]): int(r["count"]) for r in rows}


def psi_vs_baseline(
    batch_counts: dict[int, int], base_counts: dict[int, int]
) -> float:
    """Exact-decimal PSI between two bin-count dicts (Laplace +1
    smoothing; per-bin terms rounded to 6 then decimal-summed — the
    same determinism contract as quality_psi_by_source)."""
    import math
    from decimal import Decimal

    n_b = sum(batch_counts.values())
    n_0 = sum(base_counts.values())
    total = Decimal(0)
    for b in range(_PSI_BINS):
        p = (batch_counts.get(b, 0) + 1) / (n_b + _PSI_BINS)
        q = (base_counts.get(b, 0) + 1) / (n_0 + _PSI_BINS)
        total += Decimal(str(round((p - q) * math.log(p / q), 6)))
    return float(total)


def _monitor_batch(
    llr,
    pri,
    base_counts: dict[int, int],
    monitor_dir: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    spark = batch.sparkSession
    verdicts = score_batch(batch, llr, pri)
    counts = baseline_bin_counts(verdicts)  # same binning as baseline
    n_docs = sum(counts.values())
    psi = psi_vs_baseline(counts, base_counts)
    row = [(int(batch_id), n_docs, psi, psi > PSI_ALERT)]
    spark.createDataFrame(
        row, "batch_id BIGINT, n_docs BIGINT, psi DOUBLE, alert BOOLEAN"
    ).write.mode("overwrite").parquet(
        f"{monitor_dir}/_batch_id={batch_id}"
    )


def run_streaming_drift_monitor(
    spark: SparkSession,
    src_dir: str,
    schema,
    llr: DataFrame,
    pri: DataFrame,
    base_counts: dict[int, int],
    monitor_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Score each arriving micro-batch with the frozen gate model and
    emit ONE (batch_id, n_docs, psi, alert) row per batch vs the
    training-time baseline histogram. Deterministic (identical bin
    counts => identical PSI), replay-idempotent via the _batch_id
    partition convention, and state-free: the baseline is a 10-entry
    dict in the closure, each batch reduces to 10 bin counts."""
    from functools import partial as _partial

    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    (
        source.writeStream.foreachBatch(
            _partial(_monitor_batch, llr, pri, base_counts, monitor_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
