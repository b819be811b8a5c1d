"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats media as ``BinaryType`` payload columns with typed
metadata — the reference's nullable ``msg []byte`` column
(``hashes_test.go:210``, FIXTURES.md §1) generalized to image/audio/
video blobs. Since no media libraries exist in this container, the
*decode* step is a deterministic fake behind the real Spark plumbing
(``mapInPandas`` with Arrow batches, explicit output schema, partition
-preserving) — swap the nested ``fake_decode`` for a PIL/librosa call and
nothing else changes.

The synthetic media table derives deterministically from
``documents``: payload = UTF-8 bytes of the text, media_type from
doc_id, frame/sample counts from content length — so metadata
operators remain DuckDB-oracle-checkable.

Scale notes: payloads stay in executor memory only per-batch
(``mapInPandas`` streams Arrow record batches); metadata-only queries
never deserialize payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import sha256_hex
from clickhouse_batcher_spark.tables import load_table

MEDIA_TYPES = ("image", "audio", "video")
FRAME_SAMPLE_EVERY = 7
FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: (doc_id, media_type, payload, n_frames)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 30 + 1).cast("bigint").alias("n_frames"),
    )


# ---------------------------------------------------------------------------
# Metadata extraction (payload never decoded; column-pruned reads)
# ---------------------------------------------------------------------------
@query(
    "media_metadata",
    oracle="""
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS media_type,
      octet_length(encode(text)) AS n_bytes,
      sha256(text) AS payload_sha256,
      n_chars % 30 + 1 AS n_frames
    FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        sha256_hex("payload").alias("payload_sha256"),
        "n_frames",
    )


# ---------------------------------------------------------------------------
# Frame sampling: one output row per sampled frame index
# ---------------------------------------------------------------------------
@query(
    "media_frame_sample",
    oracle=f"""
    SELECT doc_id, unnest(generate_series(0, n_frames - 1, {FRAME_SAMPLE_EVERY}))
           AS frame_idx
    FROM (SELECT doc_id, n_chars % 30 + 1 AS n_frames FROM documents
          WHERE doc_id % 3 = 2) v
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                (F.col("n_frames") - 1).cast("int"),
                F.lit(FRAME_SAMPLE_EVERY),
            )
        ).alias("frame_idx_i"),
    ).select("doc_id", F.col("frame_idx_i").cast("bigint").alias("frame_idx"))


# ---------------------------------------------------------------------------
# Decode / feature extraction: real mapInPandas plumbing, fake kernel
# ---------------------------------------------------------------------------
DECODE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    f"features ARRAY<DOUBLE>"
)


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: payload bytes -> fixed-dim feature vector.

    The decode kernel is a deterministic stand-in for a media decoder:
    a real deployment swaps it for PIL/torchvision/librosa frame or
    spectrogram features (this container has no media libs; raising
    NotImplementedError would poison every downstream test). The
    Spark-side contract — schema, Arrow batching, distribution — is
    the real, swappable part.

    Both functions are NESTED so cloudpickle serializes them BY VALUE:
    a module-level helper would pickle by reference and require the
    ``clickhouse_batcher_spark`` package to be importable on executor
    Python workers, which the driver contract does not guarantee
    (round-3 verify caught exactly that ModuleNotFoundError).
    """
    feature_dim = FEATURE_DIM

    def fake_decode(payload: bytes) -> list[float]:
        n = len(payload)
        if n == 0:
            return [0.0] * feature_dim
        step = max(1, n // feature_dim)
        feats = [
            float(sum(payload[i : i + step]) % 997) for i in range(0, n, step)
        ]
        feats = feats[:feature_dim]
        return feats + [0.0] * (feature_dim - len(feats))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(fake_decode),
                }
            )

    return media.mapInPandas(decode, schema=DECODE_SCHEMA)


@query("media_decode_features")  # rows-only: kernel is a documented fake
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_features(media_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# Resize / re-encode: payload -> payload transformation with updated
# metadata. Kernel is a deterministic fake (no image libs in this
# container): "resizing" to WxH keeps a proportional byte prefix —
# the Spark contract (binary in/out, metadata columns, Arrow batching)
# is the real, swappable part.
# ---------------------------------------------------------------------------
RESIZE_W, RESIZE_H = 64, 64


def resize_media(media: DataFrame) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            target = (n_bytes * (RESIZE_W * RESIZE_H) // (256 * 256)).clip(lower=16)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": [
                        p[: int(t)] for p, t in zip(pdf["payload"], target)
                    ],
                    "width": RESIZE_W,
                    "height": RESIZE_H,
                    "orig_bytes": n_bytes,
                }
            )

    return media.mapInPandas(
        kernel,
        schema=(
            "doc_id BIGINT, media_type STRING, payload BINARY, "
            "width INT, height INT, orig_bytes BIGINT"
        ),
    )


@query("media_resize")  # rows-only: fake kernel; plumbing tested
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_media(
        media_table(spark, sf_dir).filter(F.col("media_type") == "image")
    )
