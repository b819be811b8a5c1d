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
    band_signatures_inline,
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
    # narrow per-row signatures: a micro-batch is far below the
    # vocab-broadcast crossover the batch pipeline is shaped for
    sigs = band_signatures_inline(batch)
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

    # availableNow: batches run back-to-back (maxFilesPerTrigger still
    # caps each one) and the query self-terminates — no per-batch
    # trigger-period idle, which was ~10% of gate wall time
    query = (
        source.writeStream.foreachBatch(partial(_write_batch_matches, index, out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()


# --- self-building index: the full at-ingestion dedup loop -----------------
def _ingest_batch(
    index_dir: str, out_dir: str, batch: DataFrame, batch_id: int
) -> None:
    """One micro-batch of the self-indexing gate: match the batch
    against every PREVIOUSLY committed batch's signatures plus itself,
    then commit this batch's own signatures to the index.

    Replay safety: both writes are overwrite-by-batch-id, and the
    index read filters ``_batch_id < batch_id`` — a replayed batch
    never sees the signatures its crashed predecessor may have half
    committed, so the output is bit-identical under any replay
    schedule."""
    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    # band_signatures_inline: bit-identical signatures, zero shuffles —
    # the batch pipeline's vocab distinct + broadcast + per-doc MIN
    # aggregation cost this gate ~2.5 s of fixed latency per
    # micro-batch (67% of wall time, round-8 profile)
    sigs = band_signatures_inline(batch).cache()

    # Probe the index through Spark's own filesystem layer (an absent
    # or empty index raises at read time) — a driver-local os.path
    # check would silently miss an object-store index_dir and score
    # every batch only against itself.
    try:
        prior = (
            spark.read.schema(
                # explicit schema: skips per-batch parquet footer
                # inference over an index whose partition count grows
                # with every committed batch
                "doc_id BIGINT, band_id INT, band_sig STRING, "
                "_batch_id INT"
            )
            .option("basePath", index_dir)
            .parquet(f"{index_dir}/_batch_id=*")
            .filter(F.col("_batch_id") < F.lit(batch_id))
            .select("band_id", "band_sig", F.col("doc_id").alias("index_doc_id"))
        )
    except AnalysisException:
        prior = None

    a = sigs.alias("a")
    b = sigs.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("a.doc_id").alias("index_doc_id"),
        )
    )
    matches = within
    if prior is not None:
        matches = matches.unionByName(
            sigs.join(prior, ["band_id", "band_sig"]).select(
                "doc_id", "index_doc_id"
            )
        )
    matches.distinct().write.mode("overwrite").parquet(
        f"{out_dir}/_batch_id={batch_id}"
    )
    sigs.select("doc_id", "band_id", "band_sig").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/_batch_id={batch_id}")
    sigs.unpersist()


def run_streaming_neardup_selfindex(
    spark: SparkSession,
    src_dir: str,
    schema,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """The complete at-ingestion dedup gate: documents stream in, each
    micro-batch is scored against everything ingested before it (plus
    within-batch), and its signatures join the index for the batches
    after it. The union of all per-batch outputs is exactly the batch
    detector's band-collision pair set over the same corpus — the
    equivalence the test pins — regardless of how the stream was cut
    into batches.

    Scale: the index is an ordinary parquet table partitioned by
    batch; both join sides hash on the band key, no streaming state
    grows, and compaction of old index partitions is the standard
    small-file problem (sources/layout.py), not a state-store one."""
    source = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    query = (
        source.writeStream.foreachBatch(
            partial(_ingest_batch, index_dir, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        query.stop()
