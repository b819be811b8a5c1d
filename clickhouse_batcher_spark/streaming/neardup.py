"""Streaming incremental near-duplicate detection.

The batch MinHash-LSH detector (operators/dedup.py) answers "which
pairs in the corpus are near-dups"; an INGESTION pipeline needs the
incremental question instead: as new documents stream in, which of
them collide with the EXISTING corpus index? That is the
at-ingestion dedup gate every large training-data pipeline runs
(reject or flag near-dups before they ever land), restated
Spark-first: a static band-signature index on one side, a
``readStream`` file source on the other, and a per-micro-batch
equi-join on ``(band_id, band_sig)`` inside ``foreachBatch``.

Shares ``band_signatures`` with the batch path, so a document gets
the SAME signature whether indexed in batch or scored in-flight —
the property the batch-equivalence test pins.

Scale: the index side is a parquet-backed (band, sig) -> doc relation
keyed exactly like the stream side's join key; at 100 TB both sides
are hash-partitioned on the band key, and each micro-batch joins only
its own (small) signature set — no state store growth, because the
index is external (appended by the same pipeline's committed batches)
rather than held in streaming state.
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.operators.dedup import (
    band_signatures,
    shingle_set,
    tokenized_corpus,
)


def build_band_index(docs: DataFrame) -> DataFrame:
    """Band-signature index of the existing corpus:
    (band_id, band_sig, doc_id)."""
    return band_signatures(shingle_set(tokenized_corpus(docs))).select(
        "band_id", "band_sig", F.col("doc_id").alias("index_doc_id")
    )


def match_against_index(batch: DataFrame, index: DataFrame) -> DataFrame:
    """Band-collision matches of incoming docs against the index:
    (doc_id, index_doc_id) distinct pairs. The verification step
    (shingle Jaccard, as in the batch detector) is the caller's
    choice — candidates are already rare."""
    sigs = band_signatures(shingle_set(tokenized_corpus(batch)))
    return (
        sigs.join(index, ["band_id", "band_sig"])
        .select("doc_id", "index_doc_id")
        .distinct()
    )


def _write_batch_matches(
    index: DataFrame, out_dir: str, batch: DataFrame, batch_id: int
) -> None:
    """foreachBatch callback (runs on the driver; module-level so no
    closure captures leak into pickled state): join one micro-batch
    against the index and land its matches under a batch-id path —
    overwrite-by-batch-id makes replays idempotent."""
    (
        match_against_index(batch, index)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/_batch_id={batch_id}")
    )


def run_streaming_neardup(
    spark: SparkSession,
    src_dir: str,
    schema,
    index: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain a document file-source, appending per-batch band matches
    to ``out_dir`` exactly once (batch id in the output path makes the
    write idempotent under foreachBatch replays)."""
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )

    query = (
        source.writeStream.foreachBatch(partial(_write_batch_matches, index, out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()
