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
from clickhouse_batcher_spark.operators import memo
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
    # Contamination-hits memo (round-13): decontamination_report
    # re-derived this whole shingle+join pipeline for its per-source
    # rollup; materialize once per (session, sf_dir) — clearCache-proof
    # localCheckpoint, same discipline as dedup._SHINGLE_MEMO.
    return memo.get_or_build(
        _DECONTAM_MEMO, spark, sf_dir,
        lambda: _decontaminate_docs_build(spark, sf_dir),
    )


_DECONTAM_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


def _decontaminate_docs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_batcher_spark.operators.dedup import shingle_set

    docs = load_table(spark, sf_dir, "documents")
    # Eagerly materialized (round-14): the bench-side distinct and the
    # hits join BOTH reference this frame; the former lazy .cache()
    # raced its two consumers inside one action (the memo's own build
    # job), so only an up-front materialization removes the duplicate
    # tokenize+shingle work.
    sh = memo.materialize(
        shingle_set(
            docs.repartition(spark.sparkContext.defaultParallelism).select(
                "doc_id", tokens("text").alias("tokens")
            )
        )
    )
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


# ---------------------------------------------------------------------------
# BM25 lexical retrieval: score every document against a fixed query
# term set and keep the global top-k. The classic sparse-retrieval
# operator of a RAG / data-curation pipeline (the lexical complement
# of the dense retrieval in operators/similarity.py).
#
# Plan shape (scale-first): per-term tf is an in-row array scan (zero
# shuffle); the corpus statistics (N, avgdl, per-term df) reduce to ONE
# row via a map-side-combined aggregate; that row is broadcast back and
# the score is pure per-row arithmetic; the global top-k is
# TakeOrderedAndProject (per-partition heap + driver merge of k rows,
# never a full sort). At 100 TB the only shuffle is the single
# stats row.
#
# Determinism: tf/df/N/dl are exact integers; avgdl/idf/score are IEEE
# doubles computed with the SAME operation order in Spark and DuckDB,
# so the bits match and the driver's value-hash agrees. Ties break by
# doc_id.
# ---------------------------------------------------------------------------
BM25_TERMS = ("join", "hash", "window", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 50


def _bm25_score_sql(term: str) -> str:
    """Per-term BM25 contribution, mirrored exactly by the Spark expr."""
    return (
        f"ln(1.0 + (n_docs - df_{term} + 0.5) / (df_{term} + 0.5))"
        f" * (tf_{term} * ({BM25_K1} + 1.0))"
        f" / (tf_{term} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
    )


@query(
    "bm25_retrieval_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), tf AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
        {", ".join(f"CAST(len(list_filter(toks, x -> x = '{tm}')) AS DOUBLE) AS tf_{tm}" for tm in BM25_TERMS)}
      FROM t
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avgdl,
        {", ".join(f"CAST(SUM(CASE WHEN tf_{tm} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{tm}" for tm in BM25_TERMS)}
      FROM tf
    ), scored AS (
      SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
             round({" + ".join(_bm25_score_sql(tm) for tm in BM25_TERMS)}, 6)
               AS score
      FROM tf CROSS JOIN stats
    )
    SELECT doc_id, n_tokens, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOP_K}
    """,
)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global BM25 top-k over ``documents`` for ``BM25_TERMS``.

    Lucene-style idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive, so high-df terms still contribute). Arithmetic mirrors
    the oracle's operation order; the score is rounded to 6 decimals
    because ``ln`` differs in the last ULP between the JVM and libm
    (same convention as ``cos_sim`` in operators/similarity.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    # NB: the predicate must be built by a factory, not a default-arg
    # lambda — F.filter calls two-parameter lambdas as (element, index).
    def _is_term(tm):
        return lambda x: x == F.lit(tm)

    tf_cols = [
        F.size(F.filter(F.col("toks"), _is_term(tm)))
        .cast("double")
        .alias(f"tf_{tm}")
        for tm in BM25_TERMS
    ]
    tf = docs.select(tokens("text").alias("toks"), F.col("doc_id")).select(
        "doc_id", F.size("toks").cast("double").alias("dl"), *tf_cols
    )
    stats = tf.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("bigint").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{tm}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{tm}")
            for tm in BM25_TERMS
        ],
    )

    def term_score(tm: str):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{tm}") + F.lit(0.5))
            / (F.col(f"df_{tm}") + F.lit(0.5))
        )
        return (
            idf
            * (F.col(f"tf_{tm}") * F.lit(BM25_K1 + 1.0))
            / (
                F.col(f"tf_{tm}")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                )
            )
        )

    score = term_score(BM25_TERMS[0])
    for tm in BM25_TERMS[1:]:
        score = score + term_score(tm)
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.col("dl").cast("bigint").alias("n_tokens"),
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# Gopher-style document quality filter (Rae et al. 2021, "Scaling
# Language Models" appendix A1.1 — public rule family): reject docs by
# cheap structural signals before any model-based scoring. Thresholds
# are calibrated to this synthetic corpus (10-99 token docs, shared
# alphabetic vocabulary) so the output has a real pass/fail mix; a
# production run swaps the constants, not the plan.
#
# Pure per-row column expressions over the token array — zero shuffle
# at any corpus size. Ratios are single IEEE divisions of exact
# integer counts (bit-identical in Spark and DuckDB).
# ---------------------------------------------------------------------------
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 5.5
GOPHER_STOPWORDS = ("a", "the", "of", "and", "is")
GOPHER_MIN_STOPWORDS = 2   # distinct stopwords required
GOPHER_MIN_TTR = 0.25      # type-token ratio (repetition guard)


@query(
    "quality_filter_gopher",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        len(toks) AS n_tokens,
        CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
        len(list_distinct(list_filter(toks,
            x -> x IN ({", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)}))))
          AS n_stopwords,
        CAST(len(list_distinct(toks)) AS DOUBLE)
          / CAST(len(toks) AS DOUBLE) AS type_token_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, mean_token_len, n_stopwords, type_token_ratio,
      (n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS})
        AS r_word_count,
      (mean_token_len >= {GOPHER_MIN_MEAN_LEN}
       AND mean_token_len <= {GOPHER_MAX_MEAN_LEN}) AS r_mean_len,
      n_stopwords >= {GOPHER_MIN_STOPWORDS} AS r_stopwords,
      type_token_ratio >= {GOPHER_MIN_TTR} AS r_repetition,
      ((n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS})
       AND (mean_token_len >= {GOPHER_MIN_MEAN_LEN}
            AND mean_token_len <= {GOPHER_MAX_MEAN_LEN})
       AND n_stopwords >= {GOPHER_MIN_STOPWORDS}
       AND type_token_ratio >= {GOPHER_MIN_TTR}) AS keep
    FROM m
    """,
)
def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc structural quality rules + final keep/reject verdict."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks"))
    n_tokens = F.size("toks").cast("bigint")
    sum_len = F.aggregate(
        F.transform(F.col("toks"), lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_len = sum_len.cast("bigint").cast("double") / F.size("toks").cast(
        "double"
    )
    n_stop = F.size(
        F.array_distinct(
            F.filter(F.col("toks"), lambda x: x.isin(*GOPHER_STOPWORDS))
        )
    ).cast("bigint")
    ttr = F.size(F.array_distinct("toks")).cast("double") / F.size(
        "toks"
    ).cast("double")
    m = t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        n_stop.alias("n_stopwords"),
        ttr.alias("type_token_ratio"),
    )
    r_wc = (F.col("n_tokens") >= GOPHER_MIN_TOKENS) & (
        F.col("n_tokens") <= GOPHER_MAX_TOKENS
    )
    r_ml = (F.col("mean_token_len") >= GOPHER_MIN_MEAN_LEN) & (
        F.col("mean_token_len") <= GOPHER_MAX_MEAN_LEN
    )
    r_sw = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    r_rep = F.col("type_token_ratio") >= GOPHER_MIN_TTR
    return m.select(
        "doc_id",
        "n_tokens",
        "mean_token_len",
        "n_stopwords",
        "type_token_ratio",
        r_wc.alias("r_word_count"),
        r_ml.alias("r_mean_len"),
        r_sw.alias("r_stopwords"),
        r_rep.alias("r_repetition"),
        (r_wc & r_ml & r_sw & r_rep).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Unigram log-probability scoring: the statistical-LM quality signal
# (CCNet-style pipelines rank documents by LM perplexity; the unigram
# model is the distributed, model-free stand-in — swap a KenLM Pandas
# UDF in deployment, the plan shape stays: broadcast stats, per-row
# score). Low average token log-probability = document full of
# corpus-atypical tokens (OCR noise, boilerplate, wrong language).
#
# Determinism: a float SUM over a doc's tokens is shuffle-order-
# dependent, so each token's ln(p) is rounded to 6 decimals and cast
# to DECIMAL(27,6) BEFORE summing — the decimal sum is exact and
# order-independent (same trick as functions.dec_sum), and the final
# division is one IEEE op. ln() rounding convention as elsewhere
# (JVM/libm last-ULP drift).
#
# Scale: vocabulary aggregate (zipf-small) + 1-row total, both
# broadcast back to the token stream; per-doc agg shuffles doc rows
# once. Same shape as docs_rare_token_ratio.
# ---------------------------------------------------------------------------
@query(
    "docs_unigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    occ AS (SELECT doc_id, unnest(toks) AS token FROM t),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT o.doc_id,
             CAST(round(ln(CAST(v.cnt AS DOUBLE) / CAST(tot.total AS DOUBLE)),
                        6) AS DECIMAL(27,6)) AS lp
      FROM occ o JOIN vocab v ON o.token = v.token CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus unigram
    distribution (higher = more typical)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    vocab = occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("total"))
    lp = F.round(
        F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 6
    ).cast("decimal(27,6)")
    scored = (
        occ.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("lp").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_logprob"
        ),
    )


# ---------------------------------------------------------------------------
# Per-document token entropy (vocabulary-diversity quality signal)
# ---------------------------------------------------------------------------
@query(
    "docs_token_entropy",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKENS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        list_transform(list_distinct(toks),
                       u -> len(list_filter(toks, x -> x = u))) AS cnts
      FROM t
    )
    SELECT doc_id, n_tokens, n_distinct_tokens,
      -1.0 * CAST(coalesce(list_sum(list_transform(cnts,
        c -> CAST(round((CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                        * ln(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)),
                  6) AS DECIMAL(27,6)))), 0) AS DOUBLE) AS token_entropy
    FROM m
    """,
)
def docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's unigram distribution.

    Low entropy = a few tokens dominate (boilerplate / repeated
    phrases); the natural companion to ``type_token_ratio`` in the
    Gopher filter and the repetition signals in ``operators/ngrams``.

    Zero-shuffle: counting runs in-row over ``array_distinct`` (same
    bounded O(d*u) trade-off as the repetition signals). Each term
    ``p*ln(p)`` is rounded to 6 decimals (the repo-wide transcendental
    convention — JVM vs libm differ in the last ULP) and summed as
    DECIMAL(27,6), so the per-document sum is order-independent and
    engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )

    def count_of(u):
        return F.size(F.filter(F.col("toks"), lambda x: x == u))

    cnts = F.transform(F.array_distinct("toks"), count_of)
    p_of = lambda c: c.cast("double") / F.col("n_tokens").cast("double")  # noqa: E731
    terms = F.transform(
        cnts,
        lambda c: F.round(p_of(c) * F.log(p_of(c)), 6).cast("decimal(27,6)"),
    )
    ent = (
        F.lit(-1.0)
        * F.coalesce(
            F.aggregate(
                terms,
                F.lit(0).cast("decimal(27,6)"),
                lambda acc, x: (acc + x).cast("decimal(27,6)"),
            ),
            F.lit(0).cast("decimal(27,6)"),
        ).cast("double")
    )
    return t.select(
        "doc_id",
        "n_tokens",
        F.size(F.array_distinct("toks")).cast("bigint").alias(
            "n_distinct_tokens"
        ),
        ent.alias("token_entropy"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM log-probability (the stronger perplexity proxy)
# ---------------------------------------------------------------------------
@query(
    "docs_bigram_logprob",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS pair
      FROM t WHERE len(toks) >= 2
    ), occ AS (
      SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM bg
    ), big AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY 1, 2
    ), uni AS (
      SELECT w1, SUM(c2) AS c1 FROM big GROUP BY 1
    ), scored AS (
      SELECT o.doc_id,
        CAST(round(ln(CAST(b.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE)), 6)
             AS DECIMAL(27,6)) AS lp
      FROM occ o
      JOIN big b ON o.w1 = b.w1 AND o.w2 = b.w2
      JOIN uni u ON o.w1 = u.w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_bigram_logprob
    FROM scored GROUP BY doc_id
    """,
)
def docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean conditional bigram log-probability under the
    corpus bigram MLE, P(w2|w1) = C(w1,w2)/C(w1, ·) — a sharper
    perplexity proxy than the unigram score (it penalizes improbable
    SEQUENCES, not just rare words; shuffled text scores low here but
    identically to the original under the unigram model).

    Determinism mirrors `docs_unigram_logprob`: each token-pair
    logprob rounds to 6 decimals and sums exactly as decimal; the only
    unrounded float op is the final mean. Scale shape: bigram pairs
    are a same-size explode of the token stream, the LM tables are
    corpus-bounded aggregates joined back by key (no broadcast of the
    unbounded bigram table — AQE picks the strategy), and everything
    combines map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    zipped = t.select(
        "doc_id",
        F.arrays_zip(
            F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("a"),
            F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("b"),
        ).alias("pairs"),
    )
    occ = zipped.select(
        "doc_id", F.explode("pairs").alias("pair")
    ).select(
        "doc_id",
        F.col("pair.a").alias("w1"),
        F.col("pair.b").alias("w2"),
    )
    big = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lp = F.round(
        F.log(F.col("c2").cast("double") / F.col("c1").cast("double")), 6
    ).cast("decimal(27,6)")
    scored = occ.join(big, ["w1", "w2"]).join(uni, "w1").select(
        "doc_id", lp.alias("lp")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("lp").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_bigram_logprob"
        ),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw
# document by how much more likely its hashed-feature profile is
# under a TARGET corpus' distribution than under the RAW corpus' own:
#
#   log w(doc) = sum over tokens of ln(p_target(bucket) / p_raw(bucket))
#
# with features hashed into a FIXED bucket space, so both models stay
# constant-size vectors no matter how large the corpus grows. Target
# here = the English slice (the "looks like my target domain" proxy
# available on this synthetic corpus); features = unigrams hashed into
# DSIR_BUCKETS buckets with the repo's portable sha-bucket; +1
# Laplace smoothing on both distributions.
#
# Determinism: each bucket's log-ratio is rounded to 6 decimals and
# summed as DECIMAL(27,6) per document (the docs_unigram_logprob
# discipline) — shuffle-order independent, engine-exact.
#
# Scale: the two distributions are DSIR_BUCKETS-row aggregates
# broadcast back to the token stream; the per-doc sum is the one
# data-sized shuffle (map-side combinable). DSIR's published setting
# uses ~1e4-1e6 hashed bigram buckets — still broadcast-sized.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 256
_DSIR_SALT = "dsir"


def _dsir_bucket_sql(expr: str) -> str:
    from clickhouse_batcher_spark.operators.sampling import _sql_bucket

    return _sql_bucket(expr, buckets=DSIR_BUCKETS, salt=_DSIR_SALT)


def _dsir_oracle() -> str:
    b = _dsir_bucket_sql("token")
    n = DSIR_BUCKETS
    return f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    bk AS (SELECT doc_id, lang, {b} AS bucket FROM occ),
    raw AS (SELECT bucket, COUNT(*) AS c FROM bk GROUP BY bucket),
    tgt AS (SELECT bucket, COUNT(*) AS c FROM bk WHERE lang = 'en' GROUP BY bucket),
    tots AS (SELECT (SELECT SUM(c) FROM raw) AS rt,
                    (SELECT COALESCE(SUM(c), 0) FROM tgt) AS tt),
    lr AS (
      SELECT raw.bucket,
        CAST(round(ln(
          ((CAST(COALESCE(tgt.c, 0) AS DOUBLE) + 1) / (CAST(tt AS DOUBLE) + {n}))
          / ((CAST(raw.c AS DOUBLE) + 1) / (CAST(rt AS DOUBLE) + {n}))
        ), 6) AS DECIMAL(27,6)) AS lr
      FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tots
    )
    SELECT bk.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(lr.lr) AS DOUBLE) AS dsir_logweight
    FROM bk JOIN lr ON lr.bucket = bk.bucket
    GROUP BY bk.doc_id
    """


@query("dsir_importance_weights", oracle=None)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DSIR log importance weight of the raw corpus against the
    English-slice target (higher = resample this doc more)."""
    # Weights memo (round-13): dsir_resample_docs references this frame
    # TWICE (the row set and its max-logweight aggregate) and runs back
    # to back with this query in bench/driver windows; materialize once
    # per (session, sf_dir) — clearCache-proof localCheckpoint, same
    # discipline as dedup._SHINGLE_MEMO.
    return memo.get_or_build(
        _DSIR_W_MEMO, spark, sf_dir,
        lambda: _dsir_importance_weights_build(spark, sf_dir),
    )


_DSIR_W_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


def _dsir_importance_weights_build(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("token")
    )
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(_DSIR_SALT), F.col("token")), 256), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        % DSIR_BUCKETS
    )
    bk = occ.select("doc_id", "lang", bucket.alias("bucket"))
    raw = bk.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        bk.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    tots = raw.join(tgt, "bucket", "left").agg(
        F.sum("c_raw").alias("rt"),
        F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("tt"),
    )
    n = float(DSIR_BUCKETS)
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("c_tgt"), F.lit(0)).cast("double") + 1)
                        / (F.col("tt").cast("double") + n)
                    )
                    / (
                        (F.col("c_raw").cast("double") + 1)
                        / (F.col("rt").cast("double") + n)
                    )
                ),
                6,
            )
            .cast("decimal(27,6)")
            .alias("lr"),
        )
    )
    return (
        bk.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("lr").cast("double").alias("dsir_logweight"),
        )
    )


from clickhouse_batcher_spark.catalog import ORACLES as _ORACLES2  # noqa: E402

_ORACLES2["dsir_importance_weights"] = " ".join(_dsir_oracle().split())


# ---------------------------------------------------------------------------
# Tokenizer fertility by language: tokens produced per character —
# the standard multilingual-tokenizer health metric (a tokenizer
# trained on English "over-segments" other scripts; fertility spikes
# flag languages that need vocab budget). One aggregate, zero joins.
# ---------------------------------------------------------------------------
@query(
    "token_fertility_by_lang",
    oracle=f"""
    WITH t AS (
      SELECT lang, n_chars, len({SQL_TOKENS}) AS n_toks FROM documents
    )
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      CAST(SUM(n_toks) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE)
        AS tokens_per_char
    FROM t GROUP BY lang
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-character by language (single exact division at the
    end — no float accumulation)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", "n_chars", F.size(tokens("text")).alias("n_toks"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            (
                F.sum("n_toks").cast("double")
                / F.sum("n_chars").cast("double")
            ).alias("tokens_per_char"),
        )
    )


# ---------------------------------------------------------------------------
# C4-style cleaning rules (Raffel et al. 2020, "Exploring the Limits
# of Transfer Learning" §2.2): line-level — keep lines that end in
# terminal punctuation, have >= 5 words, and don't mention
# javascript; page-level — drop pages with < 3 sentences, any
# "lorem ipsum", or a curly brace. The complement to the Gopher
# STRUCTURAL rules already in this module (C4 is line-oriented where
# Gopher is token-distribution-oriented); the synthetic corpus has no
# punctuation, so the planted-corpus pytest is what exercises each
# rule's firing — the catalog entry proves the plan shape and the
# oracle parity on real inputs.
#
# Zero-shuffle: every rule is a per-row array/regexp expression.
# ---------------------------------------------------------------------------
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def c4_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the C4 rule columns to ``docs`` (input-agnostic)."""
    lines = F.split(F.col(text_col), r"\n")
    is_kept = (
        lambda ln: ln.rlike(r'[.!?"]\s*$')
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != ""))
           >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(ln).contains("javascript")
    )
    n_lines = F.size(lines)
    n_kept = F.size(F.filter(lines, is_kept))
    n_sentences = F.size(F.split(F.col(text_col), r"[.!?]")) - 1
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{") | F.col(text_col).contains("}")
    return docs.select(
        "*",
        n_lines.cast("bigint").alias("n_lines"),
        n_kept.cast("bigint").alias("n_kept_lines"),
        n_sentences.cast("bigint").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        (
            (n_sentences >= C4_MIN_SENTENCES)
            & (n_kept > 0)
            & ~has_lorem
            & ~has_brace
        ).alias("keep"),
    )


@query(
    "quality_filter_c4",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
        CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        CAST(len(list_filter(string_split(text, chr(10)),
          ln -> regexp_matches(ln, '[.!?"]\\s*$')
            AND len(list_filter(string_split_regex(ln, '\\s+'),
                                w -> w <> '')) >= {C4_MIN_WORDS_PER_LINE}
            AND NOT contains(lower(ln), 'javascript')
        )) AS BIGINT) AS n_kept_lines,
        CAST(len(string_split_regex(text, '[.!?]')) - 1 AS BIGINT)
          AS n_sentences,
        contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
        (contains(text, '{{') OR contains(text, '}}')) AS has_curly_brace
      FROM documents
    )
    SELECT doc_id, n_lines, n_kept_lines, n_sentences,
           has_lorem_ipsum, has_curly_brace,
           (n_sentences >= {C4_MIN_SENTENCES} AND n_kept_lines > 0
            AND NOT has_lorem_ipsum AND NOT has_curly_brace) AS keep
    FROM sig
    """,
)
def quality_filter_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return c4_signals(docs).select(
        "doc_id", "n_lines", "n_kept_lines", "n_sentences",
        "has_lorem_ipsum", "has_curly_brace", "keep",
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the smoothing
# family KenLM implements — CCNet's perplexity filter uses a KenLM
# 5-gram; this is the same estimator at bigram order, closed-form
# from corpus counts so it stays hash-exact):
#
#   P_KN(w2|w1) = max(c(w1,w2) - D, 0) / c(w1,.)
#               + D * N1+(w1,.) / c(w1,.) * P_cont(w2)
#   P_cont(w2)  = N1+(.,w2) / N1+(.,.)
#
# with discount D = 0.75, N1+ the distinct-continuation counts. Unlike
# the MLE bigram model (`docs_bigram_logprob`), every probability is
# nonzero, so the score is defined for unseen-within-doc pairs too,
# and frequent-but-predictable words are discounted by their
# continuation diversity — the property that made KN the standard.
#
# Determinism: D = 0.75 is exactly representable; P_KN is one IEEE
# expression over exact integer counts (bit-identical across
# engines); each pair's ln rounds to 6 and sums as DECIMAL(27,6).
# Scale: identical shape to docs_bigram_logprob — corpus-bounded LM
# tables joined back to the pair stream, map-side-combined per-doc
# sums; the two continuation tables are rollups of the SAME bigram
# aggregate (no extra corpus scan).
# ---------------------------------------------------------------------------
KN_DISCOUNT = 0.75


@query(
    "docs_kn_bigram_logprob",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), occ AS (
      SELECT doc_id,
             unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]))
               AS pair
      FROM t WHERE len(toks) >= 2
    ), o2 AS (
      SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM occ
    ), big AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM o2 GROUP BY 1, 2
    ), uni AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS nfol
      FROM big GROUP BY 1
    ), cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS nprec FROM big GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big
    ), scored AS (
      SELECT o2.doc_id,
        CAST(round(ln(
          greatest(CAST(b.c2 AS DOUBLE) - {KN_DISCOUNT}, 0)
            / CAST(u.c1 AS DOUBLE)
          + ({KN_DISCOUNT} * CAST(u.nfol AS DOUBLE)
             / CAST(u.c1 AS DOUBLE))
            * (CAST(k.nprec AS DOUBLE) / CAST(tot.n_types AS DOUBLE))
        ), 6) AS DECIMAL(27,6)) AS lp
      FROM o2
      JOIN big b ON o2.w1 = b.w1 AND o2.w2 = b.w2
      JOIN uni u ON o2.w1 = u.w1
      JOIN cont k ON o2.w2 = k.w2
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_kn_logprob
    FROM scored GROUP BY doc_id
    """,
)
def docs_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean interpolated-Kneser-Ney bigram log-probability
    (D = 0.75) — the CCNet-style LM filter signal, closed-form from
    the corpus's own bigram counts."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= 2
    )
    occ = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("a"),
                F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("b"),
            )
        ).alias("pair"),
    ).select(
        "doc_id",
        F.col("pair.a").alias("w1"),
        F.col("pair.b").alias("w2"),
    )
    big = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = big.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nfol"),
    )
    cont = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("nprec")
    )
    tot = big.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    d = KN_DISCOUNT
    p_kn = (
        F.greatest(F.col("c2").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + (d * F.col("nfol").cast("double") / F.col("c1").cast("double"))
        * (F.col("nprec").cast("double") / F.col("n_types").cast("double"))
    )
    scored = (
        occ.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(p_kn), 6).cast("decimal(27,6)").alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (
            F.sum("lp").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_kn_logprob"),
    )


# ---------------------------------------------------------------------------
# DSIR importance RESAMPLING — the execution step the weights exist
# for (Xie et al. 2023 §3: sample raw docs with probability
# proportional to their importance weight). Deterministic engine
# restatement: acceptance probability = exp(logweight - max_logweight)
# (self-normalized so the best-matched doc is kept with p = 1),
# rounded to 6 (the repo's transcendental convention) and compared
# against the doc's sha-bucket in [0, 1) — a replayable Bernoulli
# thinning, no RNG.
#
# Scale: composes the DSIR weight aggregate (broadcast 256-bucket
# model) with ONE extra 1-row max broadcast; acceptance is a per-row
# expression. The exact-decimal compare (prob * 1e6 vs integer
# bucket) keeps the kept SET engine-exact, not just the counts.
# ---------------------------------------------------------------------------
_DSIR_RS_SALT = "dsirrs"
_DSIR_RS_SPACE = 1_000_000


def _dsir_resample_oracle() -> str:
    # 8 hex digits (32 bits), NOT the 4-digit _sql_bucket: a 16-bit
    # prefix maxes at 65535, so "% 1e6" would squash every bucket
    # below 0.066 and the thinning would keep ~everything (found by
    # the recompute test keeping 500/500).
    h = (
        f"substring(sha256('{_DSIR_RS_SALT}' || "
        f"CAST(doc_id AS VARCHAR)), 1, 8)"
    )
    digit = (
        lambda i: f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    )
    val = " + ".join(f"{digit(i)} * {16 ** (8 - i)}" for i in range(1, 9))
    hb = f"(({val}) % {_DSIR_RS_SPACE})"
    return f"""
    WITH w AS ({_dsir_oracle()}),
    m AS (SELECT MAX(dsir_logweight) AS mx FROM w),
    s AS (
      SELECT w.doc_id, w.n_tokens, w.dsir_logweight,
        CAST(round(exp(w.dsir_logweight - m.mx), 6) AS DECIMAL(10,6))
          AS p6,
        {hb} AS hb
      FROM w CROSS JOIN m
    )
    SELECT doc_id, n_tokens, dsir_logweight,
           CAST(p6 AS DOUBLE) AS accept_prob
    FROM s
    WHERE hb < p6 * {_DSIR_RS_SPACE}
    """


@query("dsir_resample_docs", oracle=None)
def dsir_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents DSIR keeps: deterministic Bernoulli thinning with
    p = exp(logweight - max logweight) via the portable sha-bucket —
    the resampled-toward-target corpus as an actual row set."""
    w = dsir_importance_weights(spark, sf_dir)
    m = w.agg(F.max("dsir_logweight").alias("mx"))
    # 8 hex digits — see the oracle-side comment (4 digits max at
    # 65535 and would defeat the %1e6 thinning)
    hb = (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.lit(_DSIR_RS_SALT),
                        F.col("doc_id").cast("string"),
                    ),
                    256,
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _DSIR_RS_SPACE
    )
    p6 = F.round(F.exp(F.col("dsir_logweight") - F.col("mx")), 6).cast(
        "decimal(10,6)"
    )
    s = w.crossJoin(F.broadcast(m)).select(
        "doc_id",
        "n_tokens",
        "dsir_logweight",
        p6.alias("p6"),
        hb.alias("hb"),
    )
    return s.filter(
        F.col("hb") < F.col("p6") * _DSIR_RS_SPACE
    ).select(
        "doc_id",
        "n_tokens",
        "dsir_logweight",
        F.col("p6").cast("double").alias("accept_prob"),
    )


_ORACLES2["dsir_resample_docs"] = " ".join(_dsir_resample_oracle().split())


# ---------------------------------------------------------------------------
# Zipf power-law fit per language (corpus-mixture diagnostic)
# ---------------------------------------------------------------------------
@query(
    "token_zipf_fit",
    oracle=f"""
    WITH occ AS (
      SELECT lang, unnest({SQL_TOKENS}) AS token FROM documents
    ), vocab AS (
      SELECT lang, token, COUNT(*) AS cnt FROM occ GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, cnt,
        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token)
          AS rnk
      FROM vocab
    ), pts AS (
      SELECT lang, cnt,
        CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
        CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
      FROM ranked
    ), s AS (
      SELECT lang,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        CAST(SUM(x) AS DOUBLE) AS sx,
        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(x * y) AS DOUBLE) AS sxy,
        CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pts GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n_vocab, total_tokens,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
      round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        AS zipf_intercept,
      round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS of ln(frequency) on ln(rank)
    over the vocabulary, plus r^2 for how power-law-like the corpus is.

    The classic corpus-health diagnostic for a training-data mixture:
    natural text sits near slope -1; machine-generated or boilerplate-
    heavy slices flatten or steepen the curve, and a LOW r^2 flags a
    corpus whose frequency structure is not Zipfian at all (template
    spam, OCR noise). Run per source/lang before fixing mixture
    weights.

    Scale: token occurrences collapse to the vocabulary with ONE
    map-side-combinable groupBy — everything after runs on vocab-sized
    data (zipf-bounded, millions of rows at 100 TB, never corpus-
    sized). Ranks come from a window partitioned BY LANGUAGE over that
    vocab frame (each language's vocabulary fits one partition by
    construction; no global single-partition sort). Exactness follows
    the repo's linreg convention: ln() terms round to 6 on both
    engines, moment sums accumulate as exact DECIMAL
    ((12,6)^2 -> (25,12), n*vocab far below overflow), and the
    closed-form slope/intercept/r^2 is evaluated once in DOUBLE from
    identical inputs.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("lang", F.explode(tokens("text")).alias("token"))
    vocab = occ.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    ranked = vocab.withColumn("rnk", F.row_number().over(w))
    dec = "decimal(12,6)"
    pts = ranked.select(
        "lang",
        "cnt",
        F.round(F.log(F.col("rnk").cast("double")), 6).cast(dec).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6).cast(dec).alias("y"),
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return s.select(
        "lang",
        n.cast("bigint").alias("n_vocab"),
        "total_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Distinctive vocabulary per source (smoothed log-odds keyness)
# ---------------------------------------------------------------------------
KEYNESS_TOP_K = 5


@query(
    "source_distinctive_terms",
    oracle=f"""
    WITH occ AS (
      SELECT source, unnest({SQL_TOKENS}) AS token FROM documents
    ), st AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM occ GROUP BY 1, 2
    ), tok AS (
      SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1
    ), src AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM tok
    ), scored AS (
      SELECT st.source, st.token, st.c_st,
        round(ln(
          ((CAST(st.c_st AS DOUBLE) + 1)
           / (CAST(src.t_s AS DOUBLE) + tot.v))
          / ((CAST(tok.c_t - st.c_st AS DOUBLE) + 1)
             / (CAST(tot.t - src.t_s AS DOUBLE) + tot.v))
        ), 6) AS keyness
      FROM st
      JOIN tok ON tok.token = st.token
      JOIN src ON src.source = st.source
      CROSS JOIN tot
    ), ranked AS (
      SELECT source, token, c_st, keyness,
        row_number() OVER (
          PARTITION BY source ORDER BY keyness DESC, token
        ) AS rnk
      FROM scored
    )
    SELECT source, token, c_st AS n_in_source, keyness,
      CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {KEYNESS_TOP_K}
    """,
)
def source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most DISTINCTIVE tokens per source: smoothed log-odds of
    the token inside the source vs the rest of the corpus (+1
    Laplace, vocabulary-size prior mass).

    The corpus-understanding twin of the mixture weights: before
    temperature-mixing sources, this says what each source actually
    contributes (a source whose keyness list is navigation chrome or
    code tokens gets down-weighted for prose training). Unlike raw
    frequency, the contrast against the REST of the corpus surfaces
    what is over-represented, not just common.

    Scale: one explode collapses to (source x vocab) with a map-side-
    combined groupBy; the global token and per-source totals are
    rollups of that frame; both broadcast back (vocab-sized and
    n_sources-sized). Ranking windows partition BY SOURCE over
    vocab-sized rows. The one ln() rounds to 6 on both engines; ties
    break on the token.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("source", F.explode(tokens("text")).alias("token"))
    st = occ.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_st")
    )
    tok = st.groupBy("token").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    src = st.groupBy("source").agg(F.sum("c_st").cast("bigint").alias("t_s"))
    tot = tok.agg(
        F.sum("c_t").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    j = (
        st.join(F.broadcast(tok), "token")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
    )
    keyness = F.round(
        F.log(
            (
                (F.col("c_st").cast("double") + 1)
                / (F.col("t_s").cast("double") + F.col("v"))
            )
            / (
                ((F.col("c_t") - F.col("c_st")).cast("double") + 1)
                / ((F.col("t") - F.col("t_s")).cast("double") + F.col("v"))
            )
        ),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("keyness").desc(), "token"
    )
    return (
        j.select("source", "token", "c_st", keyness.alias("keyness"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= KEYNESS_TOP_K)
        .select(
            "source",
            "token",
            F.col("c_st").alias("n_in_source"),
            "keyness",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Per-source decontamination report (rollup of decontaminate_docs)
# ---------------------------------------------------------------------------
@query(
    "decontamination_report",
    oracle=f"""
    WITH t AS (SELECT doc_id, {{SQL_TOKENS}} AS tokens FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(generate_series(1, len(tokens) - 2),
               i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]))
          AS shingle
      FROM t WHERE len(tokens) >= 3
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {{M}} = 0
    ),
    hits AS (
      SELECT s.doc_id, COUNT(*) AS n_shared
      FROM sh s JOIN bench b ON s.shingle = b.shingle
      WHERE s.doc_id % {{M}} <> 0
      GROUP BY s.doc_id
    ),
    train AS (
      SELECT d.source, d.doc_id, COALESCE(h.n_shared, 0) AS n_shared
      FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
      WHERE d.doc_id % {{M}} <> 0
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_train_docs,
      CAST(SUM(CASE WHEN n_shared >= {{K}} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_contaminated,
      CAST(SUM(n_shared) AS BIGINT) AS total_shared_shingles,
      CAST((SUM(CASE WHEN n_shared >= {{K}} THEN 1 ELSE 0 END) * 1000000)
           // COUNT(*) AS BIGINT) AS contaminated_ppm
    FROM train GROUP BY source
    """.format(SQL_TOKENS=SQL_TOKENS, M=CONTAM_BENCH_MOD,
               K=CONTAM_MIN_SHARED),
)
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source benchmark-contamination rates — the rollup a corpus
    owner actually reads (decontaminate_docs is the per-doc action
    list): train docs, contaminated docs (>= CONTAM_MIN_SHARED shared
    distinct 3-gram shingles with the benchmark slice), total shared
    shingles, and the integer-ppm contamination rate. A source whose
    ppm spikes is scraping the benchmark's distribution — drop or
    re-filter it, don't just delete the matched docs.

    Plan: the same broadcast benchmark shingle join as
    decontaminate_docs (benchmarks are thousands of docs vs billions,
    the broadcast side stays small by nature) + one per-source rollup;
    the left join keeps uncontaminated docs in the denominator."""
    hits = decontaminate_docs(spark, sf_dir).select(
        "doc_id", "n_shared"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    train = (
        docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(hits, "doc_id", "left")
        .na.fill({"n_shared": 0})
    )
    contaminated = F.sum(
        F.when(F.col("n_shared") >= CONTAM_MIN_SHARED, 1).otherwise(0)
    )
    agg = train.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_docs"),
        contaminated.cast("bigint").alias("n_contaminated"),
        F.sum("n_shared").cast("bigint").alias("total_shared_shingles"),
    )
    return agg.withColumn(
        "contaminated_ppm",
        F.expr(
            "CAST((n_contaminated * 1000000) DIV n_train_docs AS BIGINT)"
        ),
    )
