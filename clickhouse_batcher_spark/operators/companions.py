"""Driver-checkable companions for the rows-only operator families.

The catalog keeps 13 queries rows-only by documented justification
(COVERAGE.md "Rows-only entries: why"): ANN results are approximate
by contract, BPE/unigram learning is iterative, eigensolves/FFTs and
bit-stream codecs are not relational. Their correctness evidence
lived entirely in pytest recomputes — the driver's CORRECTNESS gate
saw either nothing or a weak rows-only row (VERDICT r9 "what's
missing" #2).

Each companion here re-runs the FULL rows-only operator and reduces
it to deterministic integers/booleans that an INDEPENDENT DuckDB
oracle derives from the raw tables alone: row counts, generator
formulas (the media payload dims are pure functions of doc_id), the
LTTB output-size law ``least(n_bars, LTTB_POINTS)``, and zero for
every violation counter. A violation counter is not a tautology: the
Spark side genuinely decodes / round-trips / projects and counts
failures, so a kernel regression flips the driver row red — the same
contract the pytest recomputes enforce, now driver-visible per round.

Reference scope note: the reference library itself has no ANN/BPE/
media surface (its transfer-fidelity concern is hashes_test.go's
checksum trio); these families come from the engine's LLM-pipeline
mandate, and the companions give them the same evidence standard as
the SQL-expressible operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import tokens
from clickhouse_batcher_spark.operators import multimodal as M
from clickhouse_batcher_spark.operators import ngrams as N
from clickhouse_batcher_spark.operators import pca as P
from clickhouse_batcher_spark.operators import similarity as S
from clickhouse_batcher_spark.operators.lttb import (
    LTTB_POINTS,
    events_lttb_downsample,
)
from clickhouse_batcher_spark.tables import load_table

_ZERO = "CAST(0 AS BIGINT)"

# Floors mirror the pytest recall gates (tests/test_operators.py::
# test_ann_lsh_recall_vs_bruteforce and tests/test_similarity_ann.py):
# measured 0.80-0.92 (LSH), ~1.0 (IVF at 8/16 probes), ~0.9 (PQ).
ANN_FLOORS = {"lsh": 0.6, "ivf": 0.92, "pq": 0.85}


@query(
    "ann_recall_vs_exact",
    oracle=f"""
    WITH ep AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs
      FROM (
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < {S.N_QUERY_VECS}),
        c AS (SELECT vec_id AS neighbor_id FROM embeddings),
        ranked AS (
          SELECT q.query_id, c.neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.query_id
                                    ORDER BY c.neighbor_id) AS rn
          FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
        )
        SELECT 1 FROM ranked WHERE rn <= {S.TOP_K}
      )
    )
    SELECT m.method, ep.exact_pairs, TRUE AS meets_floor
    FROM ep CROSS JOIN (VALUES ('ivf'), ('lsh'), ('pq')) AS m(method)
    """,
)
def ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of each ANN path (multi-probe LSH, IVF, PQ)
    against the exact brute-force top-k, reduced to the family's
    documented floor booleans — the driver-visible companion for the
    three by-contract rows-only ANN queries (``similarity_ann_*``).

    ``exact_pairs`` is SQL-derivable (every query point has exactly
    TOP_K exact neighbors when the corpus exceeds TOP_K+1 vectors, so
    the oracle only needs the count, not the cosine ranking);
    ``meets_floor`` is the pytest recall gate promoted to the hash
    oracle — any ANN regression below its floor flips the row red.
    All three set comparisons are semi-joins on (query_id,
    neighbor_id); nothing is collected.
    """
    exact = (
        S.similarity_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .cache()
    )
    total = exact.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_pairs")
    )
    fns = {
        "ivf": S.similarity_ann_ivf,
        "lsh": S.similarity_ann_lsh,
        "pq": S.similarity_ann_pq,
    }
    parts = []
    for method in sorted(fns):
        approx = fns[method](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        hits = exact.join(
            approx, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
        parts.append(
            total.crossJoin(F.broadcast(hits)).select(
                F.lit(method).alias("method"),
                "exact_pairs",
                (
                    F.col("hits").cast("double")
                    / F.col("exact_pairs").cast("double")
                    >= F.lit(ANN_FLOORS[method])
                ).alias("meets_floor"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "bpe_roundtrip_violations",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           {_ZERO} AS roundtrip_violations,
           {_ZERO} AS inflation_violations
    FROM documents
    """,
)
def bpe_roundtrip_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Losslessness of the learned BPE encoding, driver-checkable:
    re-encode every document with the learned merge table
    (``bpe_learn_merges`` -> ordered fold composition, the same path
    ``bpe_encode_docs`` uses) and count documents where splitting the
    encoded symbols on their intra-symbol merge spaces does NOT
    restore the original token stream (roundtrip) or where encoding
    GREW the sequence (merges can only shrink). Both counts are zero
    by construction of a correct BPE — the oracle derives n_docs and
    asserts the zeros, giving the iterative rows-only pair
    (``bpe_learn_merges``/``bpe_encode_docs``) a hash-green row."""
    merges = N._learned_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("syms")
    )
    # one chained-replace pass in its own projection (see
    # ngrams.bpe_encode_docs): the two consumers below reference the
    # attribute instead of duplicating the chain
    enc_df = docs.withColumn(
        "_enc", N._merge_fold_chain("syms", merges)
    )
    restored = F.flatten(F.transform("_enc", lambda s: F.split(s, " ")))
    return enc_df.select(
        (restored != F.col("syms")).alias("bad_roundtrip"),
        (F.size("_enc") > F.size("syms")).alias("inflated"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("bad_roundtrip").cast("bigint"))
        .cast("bigint")
        .alias("roundtrip_violations"),
        F.sum(F.col("inflated").cast("bigint"))
        .cast("bigint")
        .alias("inflation_violations"),
    )


@query(
    "unigram_encode_lossless",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           {_ZERO} AS concat_violations,
           {_ZERO} AS empty_piece_violations
    FROM documents
    """,
)
def unigram_encode_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Losslessness of the learned unigram-LM segmentation: Viterbi-
    encode every document with the learned piece table (the same path
    ``unigram_lm_encode_docs`` uses) and count documents where any
    word's pieces do not concatenate back to the word, or where a
    word produced zero pieces. Zero by the segmenter's contract
    (pieces partition the word); the oracle derives n_docs and
    asserts the zeros — the driver companion for the iterative
    rows-only pair (``unigram_lm_learn``/``unigram_lm_encode_docs``).
    """
    table = N._learned_unigram(spark, sf_dir)
    scores = {p: lp for p, _, lp in table}
    max_len = N.UNIGRAM_MAX_PIECE_LEN
    viterbi = N._build_viterbi()  # local def -> shipped by value

    def run(batches):
        import re

        import pandas as pd

        # ASCII whitespace, matching the learn side (see
        # unigram_lm_encode_docs for why not Python \s).
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        # per-task word verdict memo (round-13, guide §4.5): the
        # (empty, bad_concat) verdict is a pure function of the word —
        # compute it once per distinct word per task (Zipf working
        # set), bounded against pathological vocabularies.
        verdict_memo: dict[str, tuple[int, int]] = {}
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in ws.split(text.lower()) if w]
                bad_concat = 0
                empty = 0
                for w in words:
                    v = verdict_memo.get(w)
                    if v is None:
                        pieces = viterbi(w, scores, max_len)
                        v = (
                            0 if pieces else 1,
                            1
                            if pieces and "".join(pieces) != w
                            else 0,
                        )
                        if len(verdict_memo) < 65536:
                            verdict_memo[w] = v
                    empty += v[0]
                    bad_concat += v[1]
                out.append((int(doc_id), bad_concat, empty))
            yield pd.DataFrame(
                out, columns=["doc_id", "bad_concat", "empty_pieces"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = docs.mapInPandas(
        run, "doc_id bigint, bad_concat bigint, empty_pieces bigint"
    )
    return per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("bad_concat") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("concat_violations"),
        F.sum(F.when(F.col("empty_pieces") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("empty_piece_violations"),
    )


@query(
    "pca_projection_invariants",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST({P.PCA_K} AS INT) AS k,
           {_ZERO} AS pythagoras_violations,
           {_ZERO} AS dim_violations
    FROM embeddings
    """,
)
def pca_projection_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal-projection law for the fitted PCA, driver-checkable:
    for every embedding x with centered y = x - mean, projection
    p = C y and residual r = y - C^T p, an orthonormal component
    matrix C satisfies ||y||^2 = ||p||^2 + ||r||^2 exactly (to float
    round-off). Count vectors violating it beyond a 1e-8 relative
    tolerance, plus any projection of the wrong dimension. Zero
    violations certify both the eigensolve's orthonormality and the
    projection kernel — the driver companion for the rows-only
    ``embedding_pca_project`` (d x d eigensolves have no SQL oracle).
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    mean, comps, _ = P.pca_fit(spark, emb)
    bc = spark.sparkContext.broadcast((mean, comps))

    def check(batches):
        import pandas as pd

        m, c = bc.value
        k = c.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Y = X - m
            Pm = Y @ c.T
            R = Y - Pm @ c
            ny = (Y * Y).sum(axis=1)
            gap = np.abs(ny - (Pm * Pm).sum(axis=1) - (R * R).sum(axis=1))
            bad = gap > 1e-8 * np.maximum(1.0, ny)
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "pyth_bad": [int(bad.sum())],
                    "dim_bad": [0 if Pm.shape[1] == k else len(pdf)],
                }
            )

    parts = emb.mapInPandas(
        check, "n bigint, pyth_bad bigint, dim_bad bigint"
    )
    return parts.agg(
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.lit(P.PCA_K).cast("int").alias("k"),
        F.sum("pyth_bad").cast("bigint").alias("pythagoras_violations"),
        F.sum("dim_bad").cast("bigint").alias("dim_violations"),
    )


@query(
    "lttb_invariant_violations",
    oracle=f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_bars,
           CAST(LEAST(COUNT(*), {LTTB_POINTS}) AS BIGINT) AS n_out,
           {_ZERO} AS endpoint_violations,
           {_ZERO} AS monotonic_violations,
           {_ZERO} AS containment_violations
    FROM bars GROUP BY event_type
    """,
)
def lttb_invariant_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LTTB contract per series, driver-checkable: the downsample
    keeps exactly ``least(n_bars, LTTB_POINTS)`` points (SQL-derivable
    from the hourly-bar count — the one non-trivial value the oracle
    computes independently), keeps both endpoints, emits picks in
    strictly increasing hour order, and every picked (hour, value)
    exists among the recomputed hourly bars. The violation counters
    are zero for a correct kernel; the sequential pick CHOICES stay
    pytest-pinned (rows-only ``events_lttb_downsample``), but size /
    endpoint / order / containment now fail driver-visibly."""
    ds = events_lttb_downsample(spark, sf_dir)
    bars = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(27,6)"))
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("bar_ref")
        )
    )
    stats = bars.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.min("hour").alias("lo"),
        F.max("hour").alias("hi"),
    )
    w = Window.partitionBy("event_type").orderBy("pos")
    picks = ds.join(bars, ["event_type", "hour"], "left").withColumn(
        "prev_hour", F.lag("hour").over(w)
    )
    agg = picks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_out"),
        F.sum(
            F.when(
                F.col("bar_ref").isNull()
                | (F.col("bar_ref") != F.col("bar_value")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("containment_violations"),
        F.sum(
            F.when(
                F.col("prev_hour").isNotNull()
                & (F.col("hour") <= F.col("prev_hour")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("monotonic_violations"),
        F.min(F.struct("pos", "hour")).alias("first_pick"),
        F.max(F.struct("pos", "hour")).alias("last_pick"),
    )
    return agg.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n_bars",
        "n_out",
        (
            (F.col("first_pick.hour") != F.col("lo")).cast("bigint")
            + (F.col("last_pick.hour") != F.col("hi")).cast("bigint")
        ).alias("endpoint_violations"),
        "monotonic_violations",
        "containment_violations",
    )


@query(
    "semantic_dedup_invariants",
    oracle=f"""
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
           {_ZERO} AS partition_violations,
           {_ZERO} AS dangling_dup_refs,
           {_ZERO} AS cross_cell_dup_refs,
           {_ZERO} AS self_dup_refs
    FROM embeddings
    """,
)
def semantic_dedup_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup output contract, driver-checkable: over the
    twin-augmented corpus (2 rows per embedding — SQL-derivable), the
    keep/duplicate decision must PARTITION the rows (kept XOR
    dup_of-set), every dup_of must reference a KEPT row in the SAME
    k-means cell, and nothing duplicates itself. All four counters are
    zero for a correct greedy per-cell prune; the float cell
    assignment and prune choices stay pytest-pinned by the exact NumPy
    recompute (rows-only ``semantic_dedup``)."""
    # memoized localCheckpoint frame — already materialized, no cache
    sd = S.semantic_dedup(spark, sf_dir)
    kept_ref = sd.filter(F.col("kept")).select(
        F.col("vec_id").alias("dup_of"),
        F.col("cell").alias("kept_cell"),
    )
    # NO broadcast hint: kept_ref is the KEPT subset — typically the
    # large majority of the corpus, i.e. O(n). A forced broadcast OOMs
    # the driver at 100 TB; the unhinted equi-join lets AQE pick
    # shuffle-hash (or broadcast only when stats say it is small).
    dups = (
        sd.filter(~F.col("kept"))
        .join(kept_ref, "dup_of", "left")
        .select(
            F.col("kept_cell").isNull().alias("dangling"),
            (
                F.col("kept_cell").isNotNull()
                & (F.col("kept_cell") != F.col("cell"))
            ).alias("cross_cell"),
            (F.col("dup_of") == F.col("vec_id")).alias("self_ref"),
        )
        .agg(
            F.sum(F.col("dangling").cast("bigint"))
            .cast("bigint")
            .alias("dangling_dup_refs"),
            F.sum(F.col("cross_cell").cast("bigint"))
            .cast("bigint")
            .alias("cross_cell_dup_refs"),
            F.sum(F.col("self_ref").cast("bigint"))
            .cast("bigint")
            .alias("self_dup_refs"),
        )
    )
    base = sd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            (
                (F.col("kept") & F.col("dup_of").isNotNull())
                | (~F.col("kept") & F.col("dup_of").isNull())
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("partition_violations"),
    )
    return base.crossJoin(F.broadcast(dups)).select(
        "n_rows",
        "partition_violations",
        "dangling_dup_refs",
        "cross_cell_dup_refs",
        "self_dup_refs",
    )


@query(
    "media_pipeline_invariants",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_image,
           CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_audio,
           CAST(SUM(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_video,
           {_ZERO} AS format_violations,
           {_ZERO} AS dim_violations,
           {_ZERO} AS resize_violations,
           {_ZERO} AS spectrum_violations
    FROM documents
    """,
)
def media_pipeline_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contract of the media pipeline, driver-checkable:
    the generated payload table has one row per document with the
    media type determined by doc_id % 3 (SQL-derivable counts); every
    payload must DECODE to its generator's container (png/wav/gif —
    real bit-stream parses, so a codec regression flips the count);
    decoded dims must match the generator formulas (image w = 4 +
    doc_id % 13, h = 3 + doc_id % 11; video w = 16 + doc_id % 9,
    h = 9 + doc_id % 7; audio reports rate//1000 = 8); every resized
    image must re-decode as a {M.RESIZE_W}x{M.RESIZE_H} PNG; and
    every audio spectrum row must carry finite, in-range features.
    The driver companion for the rows-only trio
    (``media_decode_features``/``media_resize``/
    ``media_audio_spectrum``)."""
    media = M.media_binary_table(spark, sf_dir)
    dec = M.decode_features(media)
    expected_fmt = {"image": "png", "audio": "wav", "video": "gif"}
    fmt_map = F.create_map(
        *[F.lit(x) for kv in expected_fmt.items() for x in kv]
    )
    exp_w = (
        F.when(F.col("media_type") == "image", 4 + F.col("doc_id") % 13)
        .when(F.col("media_type") == "video", 16 + F.col("doc_id") % 9)
        .otherwise(F.lit(8))  # audio: rate // 1000
    )
    exp_h = (
        F.when(F.col("media_type") == "image", 3 + F.col("doc_id") % 11)
        .when(F.col("media_type") == "video", 9 + F.col("doc_id") % 7)
        .otherwise(F.lit(1))  # audio: mono channel count
    )
    dec_agg = dec.select(
        "media_type",
        (F.col("format") != fmt_map[F.col("media_type")]).alias("bad_fmt"),
        (
            (F.col("width") != exp_w) | (F.col("height") != exp_h)
        ).alias("bad_dim"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum(F.when(F.col("media_type") == "image", 1).otherwise(0))
        .cast("bigint")
        .alias("n_image"),
        F.sum(F.when(F.col("media_type") == "audio", 1).otherwise(0))
        .cast("bigint")
        .alias("n_audio"),
        F.sum(F.when(F.col("media_type") == "video", 1).otherwise(0))
        .cast("bigint")
        .alias("n_video"),
        F.sum(F.col("bad_fmt").cast("bigint"))
        .cast("bigint")
        .alias("format_violations"),
        F.sum(F.col("bad_dim").cast("bigint"))
        .cast("bigint")
        .alias("dim_violations"),
    )
    resized = M.resize_media(
        media.filter(F.col("media_type") == "image")
    ).select("doc_id", "media_type", "payload")
    re_dec = M.decode_features(resized)
    resize_agg = re_dec.agg(
        F.sum(
            F.when(
                (F.col("format") != "png")
                | (F.col("width") != M.RESIZE_W)
                | (F.col("height") != M.RESIZE_H),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resize_violations")
    )
    spec = M.media_audio_spectrum(spark, sf_dir)
    spec_agg = spec.agg(
        F.sum(
            F.when(
                F.col("rms").isNull()
                | F.isnan("rms")
                | (F.col("rms") < 0)
                | F.col("spectral_centroid_hz").isNull()
                | F.isnan("spectral_centroid_hz")
                | (F.col("spectral_centroid_hz") < 0)
                | (F.col("dominant_hz") < 0)
                | (F.col("dominant_hz") > 4000)  # Nyquist at 8 kHz
                | (F.col("zero_cross_rate") < 0)
                | (F.col("zero_cross_rate") > 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("spectrum_violations")
    )
    return (
        dec_agg.crossJoin(F.broadcast(resize_agg))
        .crossJoin(F.broadcast(spec_agg))
        .select(
            "n_media",
            "n_image",
            "n_audio",
            "n_video",
            "format_violations",
            "dim_violations",
            "resize_violations",
            "spectrum_violations",
        )
    )
