"""Corpus-level preparation operators: RAG chunking + frequency-based
quality signals.

Two operations a training-data / retrieval pipeline needs beyond the
per-document text surface (``operators/text.py``):

- **Chunking**: split each document into overlapping fixed-size token
  windows (the RAG / context-window preparation step). Pure column
  expressions — tokenize once, generate chunk starts with
  ``sequence``, ``explode``, ``slice`` + ``concat_ws``; one narrow
  explode, no shuffle, no Python.
- **Rare-token ratio**: per-document fraction of tokens whose GLOBAL
  corpus frequency is at or below a threshold — a corpus-statistics
  quality score (documents dominated by rare tokens are noise/OCR
  garbage candidates). Token-level global counts + a broadcast-size
  join back; the ratio is a single IEEE division of exact integer
  counts, so it is deterministic under any partitioning.

Scale: chunking is embarrassingly parallel per document. The rare-
token path shuffles once to count distinct tokens (vocabulary-sized,
zipf-bounded — small relative to the corpus) and joins token->count
back to the exploded token stream; at 100 TB that join key set is
still vocabulary-sized, so Spark's AQE picks a broadcast join. Counts
aggregate map-side first (partial aggregation), so the shuffle moves
vocabulary rows, not token occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import tokens
from clickhouse_batcher_spark.operators.text import SQL_TOKENS
from clickhouse_batcher_spark.tables import load_table

CHUNK_TOKENS = 64   # tokens per chunk
CHUNK_STRIDE = 48   # start-to-start distance => 16-token overlap
RARE_MAX_COUNT = 2  # global frequency <= this => "rare"


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (RAG document preparation)
# ---------------------------------------------------------------------------
@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    n AS (
      SELECT doc_id, toks, len(toks) AS n_toks,
             1 + (greatest(0, len(toks) - {CHUNK_TOKENS})
                  + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} AS n_chunks
      FROM t
    ), c AS (
      SELECT doc_id, toks, n_toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM n
    )
    SELECT doc_id, chunk_idx,
           len(list_slice(toks, 1 + chunk_idx * {CHUNK_STRIDE},
                          least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS},
                                n_toks))) AS n_chunk_tokens,
           array_to_string(
             list_slice(toks, 1 + chunk_idx * {CHUNK_STRIDE},
                        least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS},
                              n_toks)), ' ') AS chunk_text
    FROM c
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per overlapping token window per document.

    ``n_chunks = 1 + ceil(max(0, n - CHUNK) / STRIDE)`` — every doc
    yields at least one chunk (possibly short); the last chunk is
    clipped at the document end, never padded. Tie of engines: Spark
    ``slice(toks, start, CHUNK)`` clips exactly like the DuckDB
    ``list_slice`` with a ``least``-bounded end index.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    n_toks = F.size("toks")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.lit(0), n_toks - CHUNK_TOKENS) + (CHUNK_STRIDE - 1))
        / CHUNK_STRIDE
    ).cast("int")
    c = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx_i"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_idx_i") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx_i").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Rare-token quality ratio (global corpus statistics joined per doc)
# ---------------------------------------------------------------------------
@query(
    "docs_rare_token_ratio",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
    vocab AS (SELECT token, COUNT(*) AS global_count FROM occ GROUP BY token),
    j AS (
      SELECT o.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN v.global_count <= {RARE_MAX_COUNT}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      FROM occ o JOIN vocab v ON o.token = v.token
      GROUP BY o.doc_id
    )
    SELECT doc_id, n_tokens, n_rare,
           CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS rare_ratio
    FROM j
    """,
)
def docs_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of tokens with global corpus frequency <=
    ``RARE_MAX_COUNT``. The vocabulary aggregate is tiny next to the
    corpus (zipf), so the count-back join broadcasts; the ratio is one
    exact-integer division (deterministic under partitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    vocab = occ.groupBy("token").agg(F.count(F.lit(1)).alias("global_count"))
    j = (
        occ.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("global_count") <= RARE_MAX_COUNT, 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
            "rare_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training documents that share n-gram
# shingles with an evaluation/benchmark set — the step that keeps eval
# data out of a training corpus. The benchmark set here is the
# deterministic slice doc_id % 29 == 0 (a stand-in for "docs matching
# the benchmark index"; swap the predicate for a real benchmark join).
#
# Scale: the benchmark shingle set is small by nature (benchmarks are
# thousands of docs, corpora billions), so the contamination check is
# a broadcast semi-structure: shingle equi-join against the broadcast
# benchmark set, then a per-doc count — no all-pairs anything.
# ---------------------------------------------------------------------------
CONTAM_BENCH_MOD = 29     # benchmark membership: doc_id % 29 == 0
CONTAM_MIN_SHARED = 2     # shared distinct shingles => contaminated


@query(
    "decontaminate_docs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS tokens FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(generate_series(1, len(tokens) - 2),
               i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))
          AS shingle
      FROM t WHERE len(tokens) >= 3
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    )
    SELECT s.doc_id, COUNT(*) AS n_shared,
           COUNT(*) >= {CONTAM_MIN_SHARED} AS contaminated
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % {CONTAM_BENCH_MOD} <> 0
    GROUP BY s.doc_id
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(train_doc_id, n_shared_shingles, contaminated) for every train
    doc sharing at least one 3-token shingle with the benchmark slice.
    Per-doc shingles are distinct and the benchmark set is distinct,
    so the join has multiplicity 1 and COUNT(*) counts shared DISTINCT
    shingles."""
    from clickhouse_batcher_spark.operators.dedup import shingle_set

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_set(
        docs.repartition(spark.sparkContext.defaultParallelism).select(
            "doc_id", tokens("text").alias("tokens")
        )
    ).cache()
    bench = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.select(
        "doc_id",
        "n_shared",
        (F.col("n_shared") >= CONTAM_MIN_SHARED).alias("contaminated"),
    )
