"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Two paths:

- **Brute-force cosine top-k** (the exactness baseline): query set x
  full corpus, JVM-side fold over zipped arrays — no Python in the
  loop. At scale the corpus side stays partitioned, the (small) query
  side broadcasts, and the per-partition top-k window keeps the
  shuffle to k rows per query per partition.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  computed from literal plane vectors (seeded, deterministic),
  equi-join on the bucket signature, exact rerank within buckets —
  O(n) shuffle instead of O(n^2) pairs. Registered without an oracle
  (rows-only check): the plane literals make an equivalent SQL string
  impractical, and the operator's guarantee is recall, not an exact
  row set; ``tests/test_similarity.py`` measures recall against the
  brute-force baseline instead.

Determinism: cosine is computed in float64 on both engines over
identical inputs, output rounded to 6 decimals with ranking tie-broken
by neighbor id, so Spark and DuckDB produce identical rows (a value
within 5e-7 of a rounding boundary could in principle flip — not
observed on this corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.operators import memo
from clickhouse_batcher_spark.tables import load_table

N_QUERY_VECS = 10
TOP_K = 5
# Embedding dimensionality, interpolated into every similarity oracle's
# generate_series bound so a dimension change can't silently truncate
# the SQL-side dot products while the Spark side folds the full vector.
EMB_DIM = 64
NEARDUP_COS_THRESHOLD = 0.97
TWIN_ID_OFFSET = 100_000
TWIN_ZERO_DIMS = 8  # twin = copy with first 8 dims zeroed
# GEMM -> ANN crossover (round-9). The exact tile-pair GEMM is
# quadratic by contract (measured sf0.1->sf1 exponent 1.32,
# SCALE_RUN_r08.json); the LSH band index measures ~flat (0.03). Past
# ANN_CROSSOVER_VECS corpus vectors every GEMM consumer
# (embedding_neardup, knn_label_agreement, bitext_margin_mining,
# hard_negative_triplets) swaps its candidate generator to the LSH
# index and runs the SAME exact-rerank / threshold / rank algebra over
# candidates only — identical values on every surviving pair (rerank
# is exact), recall bounded by the LSH config and measured in
# tests/test_crossover.py with the switch forced on.
# CANDIDATE_SOURCE: 'auto' (count-gated), 'exact', or 'lsh' (forced).
CANDIDATE_SOURCE = "auto"
# SCALE.md's crossover analysis: at ~10M 64-dim vectors the GEMM's
# O(n^2/T) per-group score blocks stop fitting executors at any T that
# keeps shuffle replication sane; LSH candidates stay O(n * tables).
ANN_CROSSOVER_VECS = 10_000_000


def _resolve_candidate_source(count_vectors) -> str:
    """'exact' | 'lsh' for this call. ``count_vectors`` is a thunk so
    'auto' pays its (metadata-cheap) count only when actually gating."""
    if CANDIDATE_SOURCE in ("exact", "lsh"):
        return CANDIDATE_SOURCE
    return "lsh" if count_vectors() > ANN_CROSSOVER_VECS else "exact"


# Tiling factor for the exact all-pairs GEMM (embedding_neardup).
# Sizing: T(T+1)/2 GEMM groups; each group holds <= 2n/T vectors, so
# per-task memory ~ 2n/T * dim * 8 bytes (plus the n/T x n/T float64
# score block: (n/T)^2 * 8). Shuffle replication is O(n*T) rows.
# Pick the smallest T whose group fits comfortably in an executor:
#   n=1M, dim=64 -> T=32: ~0.5 GB scores + 32 MB vectors per task.
# Raising T shrinks per-task memory linearly but grows shuffle volume
# linearly and task count quadratically — results are T-invariant
# (tested), so T is purely a memory/parallelism knob.
NEARDUP_TILES = 8
# Multi-probe LSH sizing (round-5: recall floor raised 0.2 -> 0.6).
# Chosen by an offline numpy scan over (tables, planes, probe_bits) on
# both driver fixtures: T=16/P=8/PB=3 measures candidate recall
# 0.80-0.92 at seed 42 (bar 0.6 with margin) at ~0.42 corpus-fraction
# candidates. The fraction is inherent to this near-isotropic 500-vec
# fixture, whose true top-5 neighbors sit at LOW cosine — on real
# (clustered) corpora the same config is far more selective. Scale
# note: candidate fraction ~ T * 2^PB / 2^P is corpus-size-invariant,
# so at 10^9+ vectors LSH_PLANES must grow ~log2(n) (production LSH
# sizes bits to target bucket occupancy); the operator reads the
# constants at call time, so re-tuning is a config change.
LSH_TABLES = 16  # independent hash tables; candidates = union over tables
LSH_PLANES = 8  # sign bits per table: 2^8 buckets/table
LSH_SEED = 42
IVF_CELLS = 16
IVF_NPROBE = 8
# Soft assignment: each corpus vector is indexed into its IVF_ASSIGN
# nearest cells (index replication factor A). On clustered corpora A=1
# suffices; on near-isotropic data (this synthetic fixture) recall is
# bounded by candidate coverage, and multi-assign buys coverage at A x
# index size instead of probing every cell.
IVF_ASSIGN = 2
# The regime the constants above were tuned on (0.5-2k-vector driver
# fixtures; sf0.1 has 2000). At or below this, _cells_for/_nprobe_for
# return the tuned constants unchanged — byte-identical behavior on
# every fixture. Above it, cells grow ~sqrt(n) (the standard IVF
# sizing: k cells of ~n/k vectors balance the coarse scan against the
# per-cell scan at k = sqrt(n)) and nprobe grows ~sqrt(cells), so the
# per-query candidate pool is O(nprobe * n/cells) ~ O(n^0.75) — at the
# fixed 16-cell/8-probe tuning it would be O(n/2): IVF degenerating to
# brute-force-over-half-the-corpus at any real scale (VERDICT r12
# "what's wrong" #1; the same medicine _planes_for applied to LSH).
IVF_SMALL_CORPUS = 2_048


def _cells_for(n_vecs: int) -> int:
    """IVF cell count: k ~ sqrt(n) rounded up to a power of two,
    floored at the tuned IVF_CELLS; exactly IVF_CELLS at or below
    IVF_SMALL_CORPUS so fixture behavior never shifts. Pinned values:
    _cells_for(20_400)=256, _cells_for(10_000_000)=4096 (at the
    engine's GEMM->ANN crossover: ~2441 vectors/cell), and
    _cells_for(10**9)=32768."""
    import math

    if n_vecs <= IVF_SMALL_CORPUS:
        return IVF_CELLS
    return max(IVF_CELLS, 1 << math.ceil(math.log2(math.sqrt(n_vecs))))


def _nprobe_for(cells: int) -> int:
    """Probe count: ~sqrt(cells) rounded up to a power of two, floored
    at the tuned IVF_NPROBE (and never more than the cell count). At
    the tuned 16 cells this is exactly IVF_NPROBE=8. Scanned corpus
    fraction per query = nprobe/cells ~ 1/sqrt(cells): 6.25% at 256
    cells (the 20k test), 1.56% at 4096 cells (the 10M crossover) —
    versus the fixed tuning's 50% at every scale."""
    import math

    if cells <= IVF_CELLS:
        return IVF_NPROBE
    return min(cells, max(IVF_NPROBE, 1 << math.ceil(math.log2(math.sqrt(cells)))))


def _dvec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings scan repartitioned to session parallelism: the table
    arrives as one small parquet file (1-2 splits), which would pin the
    per-vector fold work (plane dots, cosines) to a couple of cores."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.repartition(spark.sparkContext.defaultParallelism)


# Parsed-vector memos (round-14): the exact top-k, the three ANN
# builds, SemDeDup and embedding_neardup each re-scanned the parquet,
# re-cast the embeddings to double arrays, and (the ANN builds) each
# paid a private cache + count barrier. One checkpointed (vec_id, v)
# frame per (session, sf_dir) — and one twin-augmented variant for the
# near-dup/SemDeDup corpus — replaces all of those.
_VECS_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})
_TWIN_VECS_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


def _vecs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo.get_or_build(
        _VECS_MEMO, spark, sf_dir,
        lambda: _embeddings(spark, sf_dir).select(
            "vec_id", _dvec("embedding").alias("v")
        ),
    )


def _twin_vecs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo.get_or_build(
        _TWIN_VECS_MEMO, spark, sf_dir,
        lambda: _twin_corpus(_vecs_cached(spark, sf_dir)),
    )


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


# DuckDB oracle fragments: same double-precision fold, left to right.
_SQL_DOT = (
    f"list_sum(list_transform(generate_series(1, {EMB_DIM}),"
    " i -> qv[i] * cv[i]))"
)
_SQL_NORM_Q = "sqrt(list_sum(list_transform(qv, x -> x * x)))"
_SQL_NORM_C = "sqrt(list_sum(list_transform(cv, x -> x * x)))"


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------
@query(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT query_id, neighbor_id,
             round({_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}), 6) AS cos_sim
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
    WHERE rank <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-top-k memo (round-13): ann_recall_vs_exact and
    # hybrid_retrieval_rrf both re-ran the full query x corpus GEMM to
    # get the identical (query, neighbor, rank) frame; materialize it
    # once per (session, sf_dir) — clearCache-proof localCheckpoint,
    # same discipline as dedup._SHINGLE_MEMO. Output is queries x
    # TOP_K rows, trivially small.
    return memo.get_or_build(
        _TOPK_MEMO, spark, sf_dir,
        lambda: _similarity_topk_build(spark, sf_dir),
    )


_TOPK_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


def _similarity_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs_cached(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Embedding near-dup pairs (cosine >= threshold) over corpus + twins
# ---------------------------------------------------------------------------
@query(
    "embedding_neardup",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    corpus AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + {TWIN_ID_OFFSET},
             list_transform(generate_series(1, {EMB_DIM}),
                            i -> CASE WHEN i <= {TWIN_ZERO_DIMS}
                                      THEN 0.0 ELSE v[i] END)
      FROM base
    ),
    sims AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_sum(list_transform(generate_series(1, {EMB_DIM}), i -> a.v[i] * b.v[i]))
              / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                 * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cos_sim
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_sim FROM sims
    WHERE cos_sim >= {NEARDUP_COS_THRESHOLD}
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= threshold via distributed tiled matrix multiply.

    Every vector gets a tile ``vec_id % T``; each row is exploded into
    its ``T`` unordered tile-pairs ``(ti, tj)`` and the pairs are
    grouped, so each of the ``T*(T+1)/2`` groups holds exactly the two
    tiles it must score. The per-group kernel (Arrow-batched
    ``applyInPandas``) runs one BLAS GEMM of tile-i against tile-j with
    the ``vec_a < vec_b`` triangle and the threshold applied
    vectorized. Every unordered vector pair lands in exactly one group,
    so no pair is scored twice and no dedup shuffle is needed.

    Nothing is collected to the driver and nothing is broadcast: the
    corpus moves once through a shuffle with replication factor ``T``
    (each row to its T groups). Per-group memory is <= 2n/T vectors —
    size ``NEARDUP_TILES`` so that fits an executor (the replication
    cost O(n*T) = O(n^2 / tile_rows) is inherent to EXACT all-pairs;
    beyond ``ANN_CROSSOVER_VECS`` vectors the CANDIDATE_SOURCE switch
    routes candidates through ``lsh_buckets`` and keeps the exact
    cosine as the rerank — see :func:`_neardup_pairs_lsh`).
    """
    corpus = _twin_vecs_cached(spark, sf_dir)
    counted: list = [None]  # auto's count job, reused for plane sizing

    def _count() -> int:
        # block-count over the materialized twin memo (2x the corpus)
        counted[0] = corpus.count()
        return counted[0]

    if _resolve_candidate_source(_count) == "lsh":
        return _neardup_pairs_lsh(corpus, n_vecs=counted[0])

    t = NEARDUP_TILES
    tiled = (
        corpus.withColumn("tile", F.pmod(F.col("vec_id"), F.lit(t)).cast("int"))
        # one copy of the row per tile-pair it participates in; for
        # other == tile the row lands (once) in its diagonal group
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(t - 1))))
        .withColumn("ti", F.least("tile", "other"))
        .withColumn("tj", F.greatest("tile", "other"))
    )

    def gemm(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        if pdf.empty:
            return empty
        ti, tj = int(pdf["ti"].iat[0]), int(pdf["tj"].iat[0])
        a = pdf[pdf["tile"] == ti]
        b = pdf[pdf["tile"] == tj] if tj != ti else a
        if a.empty or b.empty:
            return empty
        ids_a = a["vec_id"].to_numpy()
        ids_b = b["vec_id"].to_numpy()
        ma = np.asarray(a["v"].tolist(), dtype=np.float64)
        mb = (
            np.asarray(b["v"].tolist(), dtype=np.float64) if tj != ti else ma
        )
        ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
        mb = mb / np.linalg.norm(mb, axis=1, keepdims=True) if tj != ti else ma
        sims = np.round(ma @ mb.T, 6)
        mask = sims >= NEARDUP_COS_THRESHOLD
        if ti == tj:
            mask &= ids_a[:, None] < ids_b[None, :]
        ai, bi = np.nonzero(mask)
        ia, ib = ids_a[ai], ids_b[bi]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ia, ib),
                "vec_b": np.maximum(ia, ib),
                "cos_sim": sims[ai, bi],
            }
        )

    return tiled.groupBy("ti", "tj").applyInPandas(
        gemm, schema="vec_a BIGINT, vec_b BIGINT, cos_sim DOUBLE"
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path; recall-tested, no SQL oracle)
# ---------------------------------------------------------------------------
# Mean vectors-per-bucket the candidate index aims for. With fixed
# LSH_PLANES the bucket count is constant, so occupancy — and the
# per-bucket pair work of the candidate equi-join — grows LINEARLY
# with corpus size: at 10M vectors, 2^8 buckets/table means ~39k
# vectors per bucket and an O(n * occupancy) ~ O(n^2 / 2^planes)
# candidate explosion. Production LSH grows the signature ~log2(n)
# (the SCALE.md note); _planes_for implements exactly that for the
# crossover candidate path, flooring at the tuned small-corpus
# LSH_PLANES so behavior at <=2k vectors is byte-identical.
LSH_TARGET_OCCUPANCY = 8


def _planes_for(n_vecs: int) -> int:
    """Sign-bit count keeping mean bucket occupancy near
    LSH_TARGET_OCCUPANCY: ceil(log2(n / occupancy)) buckets-per-table
    exponent. Keeps candidate volume O(n * LSH_TABLES *
    LSH_TARGET_OCCUPANCY) — linear in n — at any corpus size. Recall
    trade (random hyperplane LSH): per-table collision is
    (1 - arccos(cos)/pi)^planes, union over LSH_TABLES=16 tables. At
    the 0.97 threshold boundary (the worst case inside the near-dup
    band) that is >= 0.95 through the crossover decade (planes=21 at
    10M -> 0.958) and ~0.85 at 10^9 (planes=27); genuine twins at
    cos >= 0.99 stay >= 0.99 recall even there. Past ~10^8 vectors
    the production lever is MORE TABLES (recall is 1-(1-p)^T — linear
    cost, exponential recall), not fewer planes."""
    import math

    if n_vecs <= LSH_TARGET_OCCUPANCY:
        return LSH_PLANES
    return max(
        LSH_PLANES, math.ceil(math.log2(n_vecs / LSH_TARGET_OCCUPANCY))
    )


def _hyperplanes(n_planes: int = LSH_PLANES) -> list[list[list[float]]]:
    """Deterministic pseudo-random planes: [table][plane][dim]."""
    import numpy as np

    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_TABLES, n_planes, 64)).tolist()


def lsh_buckets(
    df: DataFrame, vec_col: str = "v", n_planes: int = LSH_PLANES
) -> DataFrame:
    """Explode each vector into one row per hash table:
    (..., table_id, bucket) where bucket is the table's sign-bit
    signature. Multi-table LSH: a near pair only needs to agree in ONE
    table, which is what buys recall without coarsening any single
    table.

    All LSH_TABLES x LSH_PLANES dots are one numpy GEMM per Arrow
    batch against the broadcast plane matrix — ~10x the 40 per-row
    expression folds this replaces. (This operator is rows-only at the
    correctness gate, so the kernel has no oracle-portability
    constraint; its guarantee is recall, tested against brute force.)
    """
    import numpy as np

    spark = df.sparkSession
    planes = np.asarray(_hyperplanes(n_planes), dtype=np.float64)
    flat = planes.reshape(-1, planes.shape[-1])  # (T*P, 64)
    bc = spark.sparkContext.broadcast(flat)
    in_cols = df.columns
    n_tables, n_planes = planes.shape[0], planes.shape[1]

    def assign(batches):
        import pandas as pd

        pl = bc.value
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ pl.T) >= 0  # (n, T*P)
            sigs = bits.reshape(len(part), n_tables, n_planes)
            # pack sign bits to an int bucket id — fully vectorized,
            # and an int join key beats a string one in the shuffle
            buckets = (sigs * weights).sum(axis=2)  # (n, T)
            out_rows = {c: part[c].to_numpy().repeat(n_tables) for c in in_cols}
            out_rows["table_id"] = np.tile(
                np.arange(n_tables, dtype=np.int32), len(part)
            )
            out_rows["bucket"] = buckets.reshape(-1)
            yield pd.DataFrame(out_rows)

    schema = ", ".join(
        f"{name} {'BIGINT' if name == 'vec_id' else 'ARRAY<DOUBLE>'}"
        for name in in_cols
    ) + ", table_id INT, bucket BIGINT"
    return df.mapInPandas(assign, schema=schema)


LSH_PROBE_BITS = 3  # multi-probe: query also checks buckets reachable
# by flipping any subset of its 3 lowest-|margin| sign bits -> 2^3 = 8
# probes per table. A vector's near neighbors mostly land in buckets
# that differ only in the bits whose hyperplane margin was smallest,
# so probing those flips recovers most of the recall that single-probe
# LSH loses — WITHOUT touching the corpus side: the index stays one
# row per (vector, table), and only the (tiny, broadcast) query side
# fans out 8x. This is the standard multi-probe LSH trade
# (Lv et al., VLDB'07): probes buy recall at query-fanout cost
# instead of index-memory cost (more tables).


def lsh_query_probes(
    df: DataFrame, vec_col: str = "v", probe_bits: int = LSH_PROBE_BITS
) -> DataFrame:
    """Multi-probe bucket assignment for the QUERY side: one row per
    (query, table, probe) where probe 0 is the true bucket and probes
    1..2^probe_bits-1 flip subsets of the probe_bits lowest-|margin|
    bits. Same GEMM kernel shape as :func:`lsh_buckets`; all 2^k
    probe buckets per table are distinct by construction (distinct
    flip subsets of distinct bit positions)."""
    import numpy as np

    spark = df.sparkSession
    planes = np.asarray(_hyperplanes(), dtype=np.float64)  # [T][P][64]
    flat = planes.reshape(-1, planes.shape[-1])
    bc = spark.sparkContext.broadcast(flat)
    in_cols = df.columns
    n_tables, n_planes = planes.shape[0], planes.shape[1]
    k = min(probe_bits, n_planes)
    n_probes = 1 << k

    def assign(batches):
        import pandas as pd

        pl = bc.value
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part[vec_col].tolist(), dtype=np.float64)
            dots = (mat @ pl.T).reshape(len(part), n_tables, n_planes)
            bits = dots >= 0
            base = (bits * weights).sum(axis=2)  # (n, T) packed buckets
            # per (row, table): bit positions by ascending |margin|
            flip_order = np.argsort(np.abs(dots), axis=2)[:, :, :k]
            # probe m XORs the flip-subset encoded by m's bits — all
            # (n, T, n_probes) buckets in one vectorized expression
            probes = np.broadcast_to(
                base[:, :, None], base.shape + (n_probes,)
            ).copy()
            for m in range(1, n_probes):
                xor_mask = np.zeros_like(base)
                for j in range(k):
                    if (m >> j) & 1:
                        xor_mask ^= 1 << flip_order[:, :, j].astype(np.int64)
                probes[:, :, m] = base ^ xor_mask
            out = {
                c: part[c].to_numpy().repeat(n_tables * n_probes)
                for c in in_cols
            }
            out["table_id"] = np.tile(
                np.arange(n_tables, dtype=np.int32).repeat(n_probes), len(part)
            )
            out["bucket"] = probes.reshape(-1)
            yield pd.DataFrame(out)

    schema = ", ".join(
        f"{name} {'BIGINT' if name == 'vec_id' else 'ARRAY<DOUBLE>'}"
        for name in in_cols
    ) + ", table_id INT, bucket BIGINT"
    return df.mapInPandas(assign, schema=schema)


def _lsh_candidate_pairs(
    vecs: DataFrame, n_vecs: int | None = None
) -> DataFrame:
    """Distinct unordered candidate pairs from the LSH band index: two
    vectors are candidates iff they share a bucket in ANY table. Input
    must be (vec_id BIGINT, v ARRAY<DOUBLE>); output
    (vec_a, va, vec_b, vb) with vec_a < vec_b.

    This is the scale-safe candidate source behind the
    ``CANDIDATE_SOURCE``/``ANN_CROSSOVER_VECS`` switch: index size is
    O(n * LSH_TABLES) rows, the bucket equi-join shuffles on
    (table_id, bucket), and the pair dedup is one keyed shuffle over
    candidate pairs — never O(n^2). The signature width adapts to the
    corpus (``_planes_for``): occupancy stays ~LSH_TARGET_OCCUPANCY
    per bucket, so candidate volume stays linear in n at any scale
    (with fixed planes it would grow O(n^2 / 2^planes)). ``n_vecs``
    lets a caller that already counted skip the count job."""
    n = vecs.count() if n_vecs is None else n_vecs
    idx = lsh_buckets(vecs, n_planes=_planes_for(n))
    a = idx.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        "table_id",
        "bucket",
    )
    b = idx.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        "table_id",
        "bucket",
    )
    return (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "va", "vec_b", "vb")
    )


def _neardup_pairs_lsh(
    corpus: DataFrame, n_vecs: int | None = None
) -> DataFrame:
    """LSH-candidate near-dup pairs with exact cosine rerank — the
    post-crossover plan for :func:`embedding_neardup`. Same output
    schema and (on surviving pairs) identical values to the exact
    GEMM; pairs the index misses are the recall cost, measured in
    tests with the switch forced on (tests/test_crossover.py — both
    at the driver fixtures and at a 20k-vector planted-pair corpus
    exercising the adaptive signature width)."""
    cand = _lsh_candidate_pairs(corpus, n_vecs=n_vecs)
    return cand.select(
        "vec_a",
        "vec_b",
        F.round(_dot("va", "vb") / (_norm("va") * _norm("vb")), 6).alias(
            "cos_sim"
        ),
    ).filter(F.col("cos_sim") >= NEARDUP_COS_THRESHOLD)


IVF_LLOYD_ITERS = 3


def _kmeans_centroids(
    base: DataFrame,
    k: int = IVF_CELLS,
    iters: int = IVF_LLOYD_ITERS,
    seed: int = LSH_SEED,
):
    """Seeded distributed Lloyd k-means on the unit sphere.

    - **init**: deterministic k-vector sample — order by
      ``xxhash64(vec_id, seed)`` and take k (a seeded shuffle, so the
      init is corpus-order-independent; ``limit(k)`` moves k rows, not
      the corpus).
    - **assign**: one numpy GEMM per Arrow batch against the broadcast
      centroid matrix (the same kernel shape as bucket assignment) —
      executors never see more than a batch.
    - **update**: each batch emits per-cell partial (sum, count) rows —
      at most k rows per batch — and the driver combines them; driver
      traffic is O(k * partitions), never O(n). Empty cells keep their
      previous centroid. Centroids are re-normalized each round
      (spherical k-means: argmax cosine == argmax dot on unit vectors).

    Runs ``iters`` fixed rounds (one Spark job each): near-optimal
    cells are not the goal — stable, data-shaped centroids are, and
    2-3 rounds from a seeded sample gets there for recall purposes.
    """
    import numpy as np

    spark = base.sparkSession
    init_pdf = (
        base.withColumn("r", F.xxhash64(F.col("vec_id"), F.lit(seed)))
        .orderBy("r", "vec_id")
        .limit(k)
        .toPandas()
    )
    cents = np.asarray(init_pdf["v"].tolist(), dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    for _ in range(iters):
        bc_c = spark.sparkContext.broadcast(cents)

        def partial(batches):
            import pandas as pd

            c = bc_c.value
            for part in batches:
                if part.empty:
                    continue
                mat = np.asarray(part["v"].tolist(), dtype=np.float64)
                mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
                cells = np.argmax(mat_n @ c.T, axis=1)
                rows = [
                    (
                        int(cell),
                        mat_n[cells == cell].sum(axis=0).tolist(),
                        int((cells == cell).sum()),
                    )
                    for cell in np.unique(cells)
                ]
                yield pd.DataFrame(rows, columns=["cell", "s", "n"])

        partials = base.mapInPandas(
            partial, schema="cell INT, s ARRAY<DOUBLE>, n BIGINT"
        ).collect()  # bounded: <= k rows per input batch
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for row in partials:
            sums[row["cell"]] += np.asarray(row["s"], dtype=np.float64)
            counts[row["cell"]] += row["n"]
        occupied = counts > 0
        new_cents = cents.copy()
        new_cents[occupied] = sums[occupied] / counts[occupied, None]
        new_cents /= np.linalg.norm(new_cents, axis=1, keepdims=True)
        cents = new_cents
    return cents


def _ivf_cell_index(base: DataFrame, n_vecs: int):
    """Shared IVF coarse stage: size cells/nprobe from the corpus
    count, train centroids, soft-assign the corpus. Returns
    ``(assigned, bc_cents, nprobe)`` where ``assigned`` is the
    (vec_id, v, cell) index frame (IVF_ASSIGN rows per vector) and
    ``bc_cents`` the broadcast centroid matrix for probing."""
    import numpy as np

    spark = base.sparkSession
    cells = _cells_for(n_vecs)
    nprobe = _nprobe_for(cells)
    cents = _kmeans_centroids(base, k=cells)
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches):
        import pandas as pd

        c = bc.value
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part["v"].tolist(), dtype=np.float64)
            mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            # soft assignment: top-IVF_ASSIGN cells per vector
            order = np.argsort(-(mat_n @ c.T), axis=1)[:, :IVF_ASSIGN]
            yield pd.DataFrame(
                {
                    "vec_id": part["vec_id"].to_numpy().repeat(IVF_ASSIGN),
                    "v": part["v"].to_numpy().repeat(IVF_ASSIGN),
                    "cell": order.reshape(-1),
                }
            )

    assigned = base.mapInPandas(
        assign, schema="vec_id BIGINT, v ARRAY<DOUBLE>, cell INT"
    )
    return assigned, bc, nprobe


def _ivf_query_probes(queries: DataFrame, bc_cents, nprobe: int) -> DataFrame:
    """Probe stage: each query fans out to its nprobe nearest cells —
    (query_id, qv, cell), nprobe rows per query. The query side is the
    small side by contract (bounded query set), so downstream joins
    broadcast it."""
    import numpy as np

    def probe(batches):
        import pandas as pd

        c = bc_cents.value
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part["v"].tolist(), dtype=np.float64)
            mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            order = np.argsort(-(mat_n @ c.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": part["vec_id"].to_numpy().repeat(nprobe),
                    "qv": part["v"].to_numpy().repeat(nprobe),
                    "cell": order.reshape(-1),
                }
            )

    return queries.mapInPandas(
        probe, schema="query_id BIGINT, qv ARRAY<DOUBLE>, cell INT"
    )


def _ivf_topk(base: DataFrame, n_vecs: int, query_pred) -> DataFrame:
    """IVF ANN over an arbitrary (vec_id, v) corpus frame: coarse
    cells sized by ``_cells_for(n_vecs)``, queries (rows matching
    ``query_pred``) probe their ``_nprobe_for(cells)`` nearest cells,
    exact cosine rerank within the probed cells. Per-query candidate
    pool is O(nprobe * IVF_ASSIGN * n/cells) ~ O(n^0.75) — sub-linear
    at any corpus size (the fixed 16/8 tuning scanned n/2)."""
    assigned, bc, nprobe = _ivf_cell_index(base, n_vecs)
    assigned = assigned.cache()
    queries_df = _ivf_query_probes(base.filter(query_pred), bc, nprobe)
    cand = (
        F.broadcast(queries_df)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "qv", F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


# ANN result memos (round-13 optimization): each ANN path is BOTH a
# standalone catalog query and a component ann_recall_vs_exact re-runs
# in full; materialize each once per (session, sf_dir) — clearCache-
# proof localCheckpoint, same discipline as dedup._SHINGLE_MEMO. The
# paths are deterministic (seeded k-means/sampling, pinned by
# tests/test_stateful_ivf.py which exercises the BUILD functions twice
# to keep the recompute-determinism pin meaningful).
_ANN_MEMO: dict[tuple[str, str, str], DataFrame] = memo.register({})


def _ann_memoized(spark: SparkSession, sf_dir: str, method: str, build):
    return memo.get_or_build(_ANN_MEMO, spark, sf_dir, build, method)


@query("similarity_ann_ivf")  # rows-only: recall measured in tests
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_memoized(
        spark, sf_dir, "ivf", lambda: _similarity_ann_ivf_build(spark, sf_dir)
    )


def _similarity_ann_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition the corpus into inverted-file cells
    around k-means centroids; queries probe their nearest cells and
    rerank exactly within them.

    Centroids come from ``_kmeans_centroids`` — a seeded sample
    refined by ``IVF_LLOYD_ITERS`` distributed Lloyd rounds (replacing
    the round-1/2 "first 16 vectors" stand-in). Assignment and probing
    are numpy GEMMs over a broadcast centroid matrix inside
    mapInPandas; the cell equi-join replaces the all-pairs scan:
    O(n/cells * nprobe) candidates per query. Cell and probe counts
    adapt to the corpus count (``_cells_for``/``_nprobe_for``) — the
    one extra count() job materializes the cache the k-means passes
    reuse; at the <=2k fixtures the sizing is byte-identical to the
    tuned 16-cell/8-probe constants.
    """
    # memoized checkpoint: scanned by count, k-means init, each Lloyd
    # round, assignment and probing — every pass reads blocks
    base = _vecs_cached(spark, sf_dir)
    return _ivf_topk(base, base.count(), F.col("vec_id") < N_QUERY_VECS)


@query("similarity_ann_lsh")  # rows-only: recall measured in tests
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_memoized(
        spark, sf_dir, "lsh", lambda: _similarity_ann_lsh_build(spark, sf_dir)
    )


def _similarity_ann_lsh_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vecs_cached(spark, sf_dir)
    # Corpus index: ONE bucket per (vector, table) — index size is
    # unchanged by multi-probe. Query side: 2^LSH_PROBE_BITS probe
    # buckets per table (true bucket + lowest-|margin| bit-flip
    # subsets), so recall is bought with fanout on the broadcast-size
    # query side, not by growing the corpus index.
    b = lsh_buckets(vecs).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        "table_id",
        "bucket",
    )
    a = lsh_query_probes(vecs.filter(F.col("vec_id") < N_QUERY_VECS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "table_id",
        "bucket",
    )
    # Candidates: same bucket in ANY table (dedup pairs before rerank).
    cand = (
        F.broadcast(a)
        .join(b, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# Retrieval: top-k neighbors joined back to their document text — the
# RAG-retrieval shape (ANN candidates -> exact rerank -> payload
# fetch). The payload join is the step that must stay column-pruned
# and keyed: neighbors are few, so the text fetch is a broadcast-side
# lookup of k*|Q| keys against the documents table.
# ---------------------------------------------------------------------------
@query(
    "retrieval_topk_docs",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT query_id, neighbor_id,
             round({_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}), 6) AS cos_sim
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM sims
    )
    SELECT r.query_id, r.neighbor_id, r.cos_sim, r.rank,
           d.lang AS neighbor_lang, length(d.text) AS neighbor_chars
    FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id
    WHERE r.rank <= {TOP_K}
    """,
)
def retrieval_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    neighbors = similarity_topk(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.col("lang").alias("neighbor_lang"),
        F.length("text").cast("bigint").alias("neighbor_chars"),
    )
    return neighbors.join(
        docs, neighbors.neighbor_id == docs.doc_id
    ).select(
        "query_id", "neighbor_id", "cos_sim", "rank", "neighbor_lang", "neighbor_chars"
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization: the storage/serving compression step of an
# embedding pipeline (4x smaller vectors; ANN rerank reads fp32 only
# for finalists). Symmetric per-vector scale = max|x| / 127; rounding
# is floor(x/scale + 0.5) — half-up, branch-free, and bit-identical in
# Spark and DuckDB (both evaluate the same IEEE-double expression per
# element, no aggregation order involved), unlike round(), whose
# half-even/half-up behavior differs across engines. Pure per-row
# column expressions: zero shuffle at any corpus size.
# ---------------------------------------------------------------------------
QUANT_LEVELS = 127


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / {QUANT_LEVELS}.0 AS scale
      FROM base
    )
    SELECT vec_id, scale,
      array_to_string(list_transform(v, x ->
        CAST(CASE WHEN scale = 0 THEN 0
                  ELSE floor(x / scale + 0.5) END AS BIGINT)), ',') AS q_csv,
      CASE WHEN scale = 0 THEN 0.0
           ELSE list_max(list_transform(v, x ->
                  abs(x - floor(x / scale + 0.5) * scale))) END AS max_abs_err
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q_csv, max_abs_err): int8 codes serialized as a
    CSV string (portable across the value-hash gate; a production sink
    would keep ARRAY<TINYINT>), plus the per-vector reconstruction
    error, which quantization theory bounds by scale/2."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", _dvec("embedding").alias("v"))
    s = base.select(
        "vec_id",
        "v",
        (
            F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
            / float(QUANT_LEVELS)
        ).alias("scale"),
    )
    return s.select(
        "vec_id",
        "scale",
        F.expr(
            "array_join(transform(v, x -> cast(cast("
            "CASE WHEN scale = 0 THEN 0 ELSE floor(x / scale + 0.5) END"
            " AS BIGINT) AS STRING)), ',')"
        ).alias("q_csv"),
        F.expr(
            "CASE WHEN scale = 0 THEN 0.0 ELSE array_max(transform(v, "
            "x -> abs(x - floor(x / scale + 0.5) * scale))) END"
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (the FAISS-IVFPQ family's PQ half): encode
# each vector as PQ_M uint8 codebook indices, score queries against
# codes via per-query distance lookup tables (ADC), exact-rerank a
# small candidate pool. At 100 TB this is the memory story IVF alone
# lacks: 64-dim float64 vectors (512 B) compress to PQ_M=4 bytes, so
# the scored representation of a 10^11-vector corpus fits a cluster's
# RAM and the full-precision vectors are only touched for the
# candidate pool.
# ---------------------------------------------------------------------------
PQ_M = 8  # subspaces (64-dim -> 8-dim each)
PQ_K = 32  # codes per subspace
PQ_TRAIN_SAMPLE = 512  # codebook training sample (driver-side, bounded)
PQ_LLOYD_ITERS = 8  # numpy Lloyd rounds per subspace (on the sample)
PQ_CAND = 16 * TOP_K  # ADC candidates per query before exact rerank


def _pq_topk(base: DataFrame, n_vecs: int, query_pred) -> DataFrame:
    """PQ ANN over an arbitrary (vec_id, v) corpus frame: sample-
    trained subspace codebooks -> corpus encoded to PQ_M small codes
    -> ADC lookup-table scoring -> exact cosine rerank.

    Sub-steps and their scale shape:

    - **train**: codebooks fit on a deterministic xxhash-ordered
      sample of PQ_TRAIN_SAMPLE vectors on the driver — the standard
      PQ practice (codebooks need distribution shape, not the corpus)
      and the only driver-side data, bounded regardless of corpus
      size.
    - **encode**: one Arrow-batched numpy pass; output is (vec_id,
      PQ_M codes) — the compressed index an executor can hold
      entirely in memory.
    - **ADC scoring**: per-query distance tables of shape (PQ_M,
      PQ_K) (tiny, broadcast) turn approximate distance into PQ_M
      table lookups per vector — no floats from the corpus are read
      at all. At <= IVF_SMALL_CORPUS vectors the scan is exhaustive
      over codes (byte-identical to the tuned path — compression is
      what PQ buys there). PAST the small-corpus gate the scan runs
      behind the IVF coarse stage (`_ivf_cell_index`): only codes in
      a query's probed cells are scored, so the per-query ADC work is
      O(nprobe * IVF_ASSIGN * n/cells) ~ O(n^0.75), not O(n) — the
      FAISS IVFPQ composition, and the fix for the r12 "ADC scores
      every code" linear-scan-per-query shape.
    - **rerank**: top-PQ_CAND per query by approximate distance
      (per-query parallel window), then exact cosine against the
      full-precision vectors for just those candidates.

    Output schema matches similarity_topk/_ann_lsh: (query_id,
    neighbor_id, cos_sim, rank <= TOP_K).
    """
    import numpy as np

    spark = base.sparkSession

    # --- train (driver, bounded sample) ---
    sample_pdf = (
        base.withColumn("r", F.xxhash64(F.col("vec_id"), F.lit(LSH_SEED)))
        .orderBy("r", "vec_id")
        .limit(PQ_TRAIN_SAMPLE)
        .toPandas()
    )
    smat = np.asarray(sample_pdf["v"].tolist(), dtype=np.float64)
    smat /= np.linalg.norm(smat, axis=1, keepdims=True)
    sub_idx = [idx.tolist() for idx in np.array_split(np.arange(smat.shape[1]), PQ_M)]
    books: list[list[list[float]]] = []
    for idx in sub_idx:
        sub = smat[:, idx]
        cents = sub[:PQ_K].copy()  # deterministic init: hash-ordered sample head
        for _ in range(PQ_LLOYD_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for kk in range(PQ_K):
                sel = sub[assign == kk]
                if len(sel):
                    cents[kk] = sel.mean(0)
        books.append(cents.tolist())
    bc_books = spark.sparkContext.broadcast(books)
    bc_subs = spark.sparkContext.broadcast(sub_idx)

    # --- encode corpus ---
    def encode(batches):
        import pandas as pd

        books_ = [np.asarray(b) for b in bc_books.value]
        subs_ = [np.asarray(i) for i in bc_subs.value]
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part["v"].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            codes = np.stack(
                [
                    ((mat[:, idx][:, None, :] - cb[None]) ** 2).sum(-1).argmin(1)
                    for cb, idx in zip(books_, subs_)
                ],
                axis=1,
            ).astype("int32")
            yield pd.DataFrame(
                {"vec_id": part["vec_id"], "codes": list(codes)}
            )

    encoded = base.mapInPandas(encode, schema="vec_id BIGINT, codes ARRAY<INT>")

    # --- per-query ADC lookup tables (driver: NQ x PQ_M x PQ_K doubles) ---
    qpdf = base.filter(query_pred).orderBy("vec_id").toPandas()
    qmat = np.asarray(qpdf["v"].tolist(), dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    luts = np.stack(
        [
            np.stack(
                [
                    ((qmat[:, idx][:, None, :] - np.asarray(cb)[None]) ** 2).sum(-1)[qi]
                    for cb, idx in zip(books, sub_idx)
                ]
            )
            for qi in range(len(qpdf))
        ]
    )  # (NQ, PQ_M, PQ_K)
    bc_lut = spark.sparkContext.broadcast(
        (qpdf["vec_id"].tolist(), luts.tolist())
    )

    if n_vecs <= IVF_SMALL_CORPUS:
        # --- exhaustive ADC scan: every (query, code) pair scored —
        #     byte-identical to the tuned small-corpus path ---
        def adc(batches):
            import pandas as pd

            qids, luts_l = bc_lut.value
            luts_ = np.asarray(luts_l)
            marange = np.arange(luts_.shape[1])
            for part in batches:
                if part.empty:
                    continue
                codes = np.asarray(part["codes"].tolist())  # (n, PQ_M)
                vec_ids = part["vec_id"].to_numpy()
                frames = []
                for qi, qid in enumerate(qids):
                    dist = luts_[qi][marange[None, :], codes].sum(1)
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(len(part), qid, dtype="int64"),
                                "neighbor_id": vec_ids,
                                "adist": dist,
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        scored = encoded.mapInPandas(
            adc, schema="query_id BIGINT, neighbor_id BIGINT, adist DOUBLE"
        ).filter(F.col("query_id") != F.col("neighbor_id"))
    else:
        # --- IVFPQ: ADC scoring restricted to the query's probed
        #     IVF cells. The coarse stage is the same cell index the
        #     IVF operator uses (_cells_for-sized); the candidate
        #     frame joins the compressed codes — never the float
        #     vectors — against the broadcast query-probe fanout, so
        #     per-query ADC work is the probed slice, not the corpus.
        assigned, bc_cents, nprobe = _ivf_cell_index(base, n_vecs)
        qprobe = _ivf_query_probes(
            base.filter(query_pred), bc_cents, nprobe
        ).select("query_id", "cell")
        cand_codes = (
            encoded.join(assigned.select("vec_id", "cell"), "vec_id")
            .join(F.broadcast(qprobe), "cell")
            .filter(F.col("query_id") != F.col("vec_id"))
            .dropDuplicates(["query_id", "vec_id"])
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "codes")
        )

        def adc_rows(batches):
            import pandas as pd

            qids, luts_l = bc_lut.value
            luts_ = np.asarray(luts_l)
            qindex = {int(q): i for i, q in enumerate(qids)}
            mar = np.arange(luts_.shape[1])
            for part in batches:
                if part.empty:
                    continue
                codes = np.asarray(part["codes"].tolist())  # (n, PQ_M)
                qi = part["query_id"].map(qindex).to_numpy()
                dist = luts_[qi[:, None], mar[None, :], codes].sum(1)
                yield pd.DataFrame(
                    {
                        "query_id": part["query_id"],
                        "neighbor_id": part["neighbor_id"],
                        "adist": dist,
                    }
                )

        scored = cand_codes.mapInPandas(
            adc_rows, schema="query_id BIGINT, neighbor_id BIGINT, adist DOUBLE"
        )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= PQ_CAND)
        .select("query_id", "neighbor_id")
    )

    # --- exact rerank of the candidate pool ---
    qside = base.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    nside = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    sims = (
        cand.join(F.broadcast(qside), "query_id")
        .join(nside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


@query("similarity_ann_pq")  # rows-only: recall measured in tests
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_memoized(
        spark, sf_dir, "pq", lambda: _similarity_ann_pq_build(spark, sf_dir)
    )


def _similarity_ann_pq_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN catalog entry: see :func:`_pq_topk`. The corpus count
    sizes the (gated) IVF coarse stage; at the <=2k fixtures the path
    is the exhaustive-ADC one, byte-identical to the tuned behavior."""
    base = _vecs_cached(spark, sf_dir)
    return _pq_topk(base, base.count(), F.col("vec_id") < N_QUERY_VECS)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
# of the dense cosine ranking with the lexical BM25 ranking — the
# standard two-tower + keyword fusion every RAG/retrieval pipeline
# ships. The BM25 list here is query-independent (the catalog's global
# BM25_TERMS ranking), so it plays the role of a static lexical prior
# fused into each dense query's list; swapping in per-query BM25 lists
# changes the join key, not the plan. Scale shape: both input lists
# are top-k (bounded), the fusion is a join of two <=k*|Q| frames, and
# the final per-query window runs over <=k+k rows — nothing touches
# the corpus after the two retrievers have run.
# ---------------------------------------------------------------------------
RRF_K = 60  # the standard reciprocal-rank damping constant


@query(
    "hybrid_retrieval_rrf",
    oracle=None,  # composed below after both component oracles exist
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TOP_K fused (query_id, doc_id, rrf_score, rank) per dense
    query: rrf_score = 1/(RRF_K + cos_rank) + 1/(RRF_K + bm25_rank),
    missing-list membership contributing 0. Pure rational arithmetic
    in a fixed expression order — exact in both engines, no rounding
    needed."""
    from clickhouse_batcher_spark.operators.corpus import bm25_retrieval_topk

    cos = similarity_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("cos_rank"),
    )
    bm = bm25_retrieval_topk(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    qids = cos.select("query_id").distinct()
    cand = (
        cos.select("query_id", "doc_id")
        .unionByName(qids.crossJoin(F.broadcast(bm.select("doc_id"))))
        .distinct()
    )
    scored = (
        cand.join(cos, ["query_id", "doc_id"], "left")
        .join(F.broadcast(bm), "doc_id", "left")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("cos_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


def _hybrid_oracle() -> str:
    from clickhouse_batcher_spark.catalog import ORACLES

    cos_sql = ORACLES["similarity_topk"]
    bm_sql = ORACLES["bm25_retrieval_topk"]
    return f"""
    WITH cosr AS ({cos_sql}), bm AS ({bm_sql}),
    qids AS (SELECT DISTINCT query_id FROM cosr),
    cand AS (
      SELECT query_id, neighbor_id AS doc_id FROM cosr
      UNION
      SELECT q.query_id, b.doc_id FROM qids q CROSS JOIN bm b
    ), scored AS (
      SELECT c.query_id, c.doc_id,
             COALESCE(1.0/({RRF_K} + cr.rank), 0)
               + COALESCE(1.0/({RRF_K} + b.rank), 0) AS rrf_score
      FROM cand c
      LEFT JOIN cosr cr ON cr.query_id = c.query_id
                       AND cr.neighbor_id = c.doc_id
      LEFT JOIN bm b ON b.doc_id = c.doc_id
    )
    SELECT query_id, doc_id, rrf_score, rank FROM (
      SELECT query_id, doc_id, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """


from clickhouse_batcher_spark.catalog import ORACLES as _ORACLES  # noqa: E402

_ORACLES["hybrid_retrieval_rrf"] = " ".join(_hybrid_oracle().split())


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means cells + within-cell cosine pruning
# ---------------------------------------------------------------------------
# Abbas et al. 2023 ("SemDeDup"): cluster embeddings with k-means, then
# inside each cluster greedily drop any item whose cosine similarity to
# an already-kept item exceeds the threshold, visiting items farthest
# from the centroid first (so the kept representative of each duplicate
# group is the one LEAST typical of the cluster, preserving diversity).
SEMDEDUP_THRESHOLD = NEARDUP_COS_THRESHOLD  # same near-dup notion


def _twin_corpus(base: DataFrame) -> DataFrame:
    """A (vec_id, v) frame plus a perturbed twin per vector (first
    ``TWIN_ZERO_DIMS`` dims zeroed, id offset by ``TWIN_ID_OFFSET``) —
    the ONE definition of the twin construction, shared by
    ``embedding_neardup`` and ``semantic_dedup`` (and mirrored by the
    DuckDB oracle fragment) so the ops the tests cross-check cannot
    desynchronize."""
    twins = base.select(
        (F.col("vec_id") + TWIN_ID_OFFSET).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(EMB_DIM)),
            lambda i: F.when(i <= TWIN_ZERO_DIMS, F.lit(0.0)).otherwise(
                F.element_at("v", i.cast("int"))
            ),
        ).alias("v"),
    )
    return base.unionByName(twins)


# SemDeDup result memo (round-13 optimization): semantic_dedup and its
# driver companion semantic_dedup_invariants consume the IDENTICAL
# frame back to back in bench/driver runs, and the build itself runs a
# driver-side k-means (collect) before the assign/prune kernels — the
# companion re-paid the whole pipeline. Same keying + localCheckpoint
# discipline as dedup._SHINGLE_MEMO (clearCache-proof).
_SEMDEDUP_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


@query("semantic_dedup")  # rows-only: exact NumPy recompute + invariants in tests
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo.get_or_build(
        _SEMDEDUP_MEMO, spark, sf_dir,
        lambda: _semantic_dedup_build(spark, sf_dir),
    )


def _semantic_dedup_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the twin-augmented embedding corpus: k-means cells
    (seeded ``_kmeans_centroids``, the IVF machinery reused verbatim),
    then a per-cell greedy prune — visit members by ascending
    centroid-cosine (farthest first, vec_id tiebreak) and drop any
    whose similarity to an already-kept member reaches
    ``SEMDEDUP_THRESHOLD``, recording which kept doc it duplicates.

    Output: (vec_id, cell, centroid_sim, kept, dup_of). All cosines are
    rounded to 6 before compare/sort, the repo's cross-implementation
    float contract.

    Scale: assignment is one broadcast-GEMM pass (no shuffle beyond the
    cell groupBy); the within-cell kernel is O(|cell|^2) worst-case,
    which SemDeDup keeps bounded by scaling the cell count with the
    corpus (the paper runs 50k clusters on LAION) — cells stay ~n/k
    rows and never leave one executor. Cross-cell duplicates are missed
    by construction; that recall trade is the method, not this
    implementation (`embedding_neardup` is the exact-all-pairs check at
    small n).
    """
    import numpy as np

    corpus = _twin_vecs_cached(spark, sf_dir)
    cents = _kmeans_centroids(corpus)
    bc = corpus.sparkSession.sparkContext.broadcast(cents)

    def assign(batches):
        import pandas as pd

        c = bc.value
        for part in batches:
            if part.empty:
                continue
            mat = np.asarray(part["v"].tolist(), dtype=np.float64)
            mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat_n @ c.T
            cells = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": part["vec_id"].to_numpy(),
                    "v": part["v"],
                    "cell": cells.astype("int32"),
                    "centroid_sim": np.round(
                        sims[np.arange(len(part)), cells], 6
                    ),
                }
            )

    assigned = corpus.mapInPandas(
        assign,
        schema="vec_id BIGINT, v ARRAY<DOUBLE>, cell INT, centroid_sim DOUBLE",
    )

    def prune(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["centroid_sim", "vec_id"], ascending=[True, True]
        ).reset_index(drop=True)
        mat = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        kept_rows: list[int] = []
        dup_of = np.full(len(pdf), -1, dtype=np.int64)
        for i in range(len(pdf)):
            if kept_rows:
                sims = np.round(mat[kept_rows] @ mat[i], 6)
                j = int(np.argmax(sims))
                if sims[j] >= SEMDEDUP_THRESHOLD:
                    dup_of[i] = pdf["vec_id"].iloc[kept_rows[j]]
                    continue
            kept_rows.append(i)
        out = pdf[["vec_id", "cell", "centroid_sim"]].copy()
        out["kept"] = dup_of < 0
        out["dup_of"] = pd.array(
            [None if d < 0 else d for d in dup_of], dtype="Int64"
        )
        return out

    return assigned.groupBy("cell").applyInPandas(
        prune,
        schema=(
            "vec_id BIGINT, cell INT, centroid_sim DOUBLE,"
            " kept BOOLEAN, dup_of BIGINT"
        ),
    )


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019 ratio margin)
# ---------------------------------------------------------------------------
BITEXT_KNN = 4
BITEXT_MARGIN_THRESHOLD = 1.0  # keep pairs scoring above the k-NN mean

def _c6(a: str, b: str) -> Column:
    """1e6-scaled integer cosine: round to 6 decimals, scale to BIGINT
    so downstream k-NN sums are EXACT integers on both engines (the
    bitext determinism contract)."""
    return (
        F.round(F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6) * 1_000_000)
        .cast("bigint")
        .alias("c6")
    )


_BITEXT_MARGIN = (
    f"round(({2 * BITEXT_KNN} * CAST(c6 AS DOUBLE))"
    f" / (fwd_knn6 + bwd_knn6), 6)"
)


@query(
    "bitext_margin_mining",
    oracle=f"""
    WITH src AS (
      SELECT vec_id AS src_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id % 2 = 0
    ), tgt AS (
      SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 2 = 1
    ), pairs AS (
      SELECT src_id, tgt_id,
        CAST(round(round({_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}), 6)
                   * 1000000) AS BIGINT) AS c6
      FROM src CROSS JOIN tgt
    ), ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY src_id
                           ORDER BY c6 DESC, tgt_id) AS r_fwd,
        row_number() OVER (PARTITION BY tgt_id
                           ORDER BY c6 DESC, src_id) AS r_bwd
      FROM pairs
    ), knn AS (
      SELECT *,
        SUM(CASE WHEN r_fwd <= {BITEXT_KNN} THEN c6 END)
          OVER (PARTITION BY src_id) AS fwd_knn6,
        SUM(CASE WHEN r_bwd <= {BITEXT_KNN} THEN c6 END)
          OVER (PARTITION BY tgt_id) AS bwd_knn6
      FROM ranked
    ), scored AS (
      SELECT src_id, tgt_id, c6, {_BITEXT_MARGIN} AS margin FROM knn
    ), best AS (
      SELECT *,
        row_number() OVER (PARTITION BY src_id
                           ORDER BY margin DESC, tgt_id) AS b_fwd,
        row_number() OVER (PARTITION BY tgt_id
                           ORDER BY margin DESC, src_id) AS b_bwd
      FROM scored
    )
    SELECT src_id, tgt_id,
           round(c6 / 1000000.0, 6) AS cos_sim, margin
    FROM best
    WHERE b_fwd = 1 AND b_bwd = 1 AND margin >= {BITEXT_MARGIN_THRESHOLD}
    """,
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-pair mining over a shared embedding space with the
    Artetxe & Schwenk (2019) ratio margin — the criterion behind the
    CCMatrix/WikiMatrix translation-training corpora. The fixture's
    even vec_ids stand in for the source-language corpus and odd ones
    for the target side; a pair is mined when each vector is the
    other's best candidate by margin and the margin clears the
    threshold (the paper's "max" retrieval strategy).

    margin(x, y) = cos(x, y) / mean(kNN_cos(x, Tgt) + kNN_cos(y, Src))
    — raw cosine over-selects hubs (vectors close to everything);
    dividing by the two local neighborhood densities cancels hubness.

    Determinism: cosines round to 6 decimals and then live as 1e6-
    scaled BIGINTs, so the k-NN sums are EXACT integers on both
    engines; the margin is ONE double division of identical integers
    (bit-stable), rounded once. Ranks break ties on the id.

    Plan shape: the pair frame is shuffled by src_id (rank + k-NN
    conditional sum share the exchange), by tgt_id, then once more per
    mutual-best rank — all keyed, fully parallel, no driver state. At
    test scale candidates are the exact |src| x |tgt| cross (the
    bounded-kernel class of ``embedding_neardup``, broadcast side =
    the smaller corpus); past ``ANN_CROSSOVER_VECS`` the
    CANDIDATE_SOURCE switch swaps the cross for `_lsh_candidate_pairs`
    — exactly how production miners pair FAISS with the margin — and
    the same margin algebra runs over the candidate lists: the scoring
    never needs more than each pair's cosine plus both sides' k-NN
    sums (over candidates, the paper's top-k neighborhood).
    """
    emb = _embeddings(spark, sf_dir)
    raw = load_table(spark, sf_dir, "embeddings")
    counted: list = [None]

    def _count() -> int:
        counted[0] = raw.count()
        return counted[0]

    if _resolve_candidate_source(_count) == "lsh":
        cand = _lsh_candidate_pairs(
            emb.select("vec_id", _dvec("embedding").alias("v")),
            n_vecs=counted[0],
        )
        a_even = F.col("vec_a") % 2 == 0
        pairs = (
            cand.filter((F.col("vec_a") % 2) != (F.col("vec_b") % 2))
            .select(
                F.when(a_even, F.col("vec_a"))
                .otherwise(F.col("vec_b"))
                .alias("src_id"),
                F.when(a_even, F.col("va"))
                .otherwise(F.col("vb"))
                .alias("qv"),
                F.when(a_even, F.col("vec_b"))
                .otherwise(F.col("vec_a"))
                .alias("tgt_id"),
                F.when(a_even, F.col("vb"))
                .otherwise(F.col("va"))
                .alias("cv"),
            )
            .select("src_id", "tgt_id", _c6("qv", "cv"))
        )
    else:
        src = emb.filter(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("src_id"), _dvec("embedding").alias("qv")
        )
        tgt = emb.filter(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("tgt_id"), _dvec("embedding").alias("cv")
        )
        pairs = (
            F.broadcast(src)
            .crossJoin(tgt)
            .select("src_id", "tgt_id", _c6("qv", "cv"))
        )
    w_fwd = Window.partitionBy("src_id").orderBy(
        F.col("c6").desc(), F.col("tgt_id")
    )
    w_bwd = Window.partitionBy("tgt_id").orderBy(
        F.col("c6").desc(), F.col("src_id")
    )
    ranked = pairs.withColumn(
        "r_fwd", F.row_number().over(w_fwd)
    ).withColumn("r_bwd", F.row_number().over(w_bwd))
    knn = ranked.withColumn(
        "fwd_knn6",
        F.sum(
            F.when(F.col("r_fwd") <= BITEXT_KNN, F.col("c6"))
        ).over(Window.partitionBy("src_id")),
    ).withColumn(
        "bwd_knn6",
        F.sum(
            F.when(F.col("r_bwd") <= BITEXT_KNN, F.col("c6"))
        ).over(Window.partitionBy("tgt_id")),
    )
    scored = knn.select(
        "src_id", "tgt_id", "c6", F.expr(_BITEXT_MARGIN).alias("margin")
    )
    b_fwd = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id")
    )
    b_bwd = Window.partitionBy("tgt_id").orderBy(
        F.col("margin").desc(), F.col("src_id")
    )
    best = scored.withColumn(
        "b_fwd", F.row_number().over(b_fwd)
    ).withColumn("b_bwd", F.row_number().over(b_bwd))
    return best.filter(
        (F.col("b_fwd") == 1)
        & (F.col("b_bwd") == 1)
        & (F.col("margin") >= BITEXT_MARGIN_THRESHOLD)
    ).select(
        "src_id",
        "tgt_id",
        F.round(F.col("c6") / 1_000_000.0, 6).alias("cos_sim"),
        "margin",
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive retrieval training
# ---------------------------------------------------------------------------
HARDNEG_K = 5  # negatives taken from ranks 2..K+1
HARDNEG_MARGIN = 0.02  # negative must trail the positive by >= this
HARDNEG_FLOOR = -1.0  # easy-negative floor (fixture is near-isotropic)


@query(
    "hard_negative_triplets",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_QUERY_VECS}
    ), c AS (
      SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
      FROM embeddings
    ), sims AS (
      SELECT query_id, cand_id,
             round({_SQL_DOT} / ({_SQL_NORM_Q} * {_SQL_NORM_C}), 6)
               AS cos_sim
      FROM q CROSS JOIN c WHERE query_id <> cand_id
    ), rnks AS (
      SELECT *,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, cand_id) AS rnk
      FROM sims
    ), ranked AS (
      SELECT r.*, p.cand_id AS pos_id, p.cos_sim AS pos_cos
      FROM rnks r
      JOIN (SELECT query_id, cand_id, cos_sim FROM rnks WHERE rnk = 1) p
        USING (query_id)
    )
    SELECT query_id, pos_id, cand_id AS neg_id,
           pos_cos, cos_sim AS neg_cos,
           round(pos_cos - cos_sim, 6) AS margin
    FROM ranked
    WHERE rnk BETWEEN 2 AND {HARDNEG_K + 1}
      AND pos_cos - cos_sim >= {HARDNEG_MARGIN}
      AND cos_sim >= {HARDNEG_FLOOR}
    """,
)
def hard_negative_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query, positive, hard-negative) triplets for contrastive
    retrieval training — the standard construction (DPR, Karpukhin et
    al. 2020): the positive is the query's nearest neighbor, hard
    negatives are the next ``HARDNEG_K`` ranks, dropped when they sit
    within ``HARDNEG_MARGIN`` of the positive (likely false
    negatives) or below the easy-negative floor. Exactly the triplet
    curation step between similarity search and training-data export.

    Determinism: cosines round to 6 decimals (the repo's float
    contract); rank and positive selection tie-break on the candidate
    id, so the triplet set is engine-independent. Plan shape: one
    broadcast of the bounded query side, one candidate-per-query
    window shuffle — past ``ANN_CROSSOVER_VECS`` the CANDIDATE_SOURCE
    switch replaces the cross with multi-probe LSH candidates (the
    `similarity_ann_lsh` join shape) feeding the same rank/margin
    algebra.
    """
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), _dvec("embedding").alias("qv")
    )
    raw = load_table(spark, sf_dir, "embeddings")
    if _resolve_candidate_source(raw.count) == "lsh":
        vecs = emb.select("vec_id", _dvec("embedding").alias("v"))
        probes = lsh_query_probes(
            vecs.filter(F.col("vec_id") < N_QUERY_VECS)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "table_id",
            "bucket",
        )
        index = lsh_buckets(vecs).select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            "table_id",
            "bucket",
        )
        cand = (
            F.broadcast(probes)
            .join(index, ["table_id", "bucket"])
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "qv", "cand_id", "cv")
            .dropDuplicates(["query_id", "cand_id"])
        )
    else:
        c = emb.select(
            F.col("vec_id").alias("cand_id"), _dvec("embedding").alias("cv")
        )
        cand = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("cand_id"))
        )
    sims = cand.select(
        "query_id",
        "cand_id",
        F.round(
            _dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6
        ).alias("cos_sim"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    w_all = Window.partitionBy("query_id")
    ranked = (
        sims.withColumn("rnk", F.row_number().over(w_rank))
        .withColumn("pos_cos", F.max("cos_sim").over(w_all))
        .withColumn(
            "pos_id",
            F.min(
                F.when(F.col("rnk") == 1, F.col("cand_id"))
            ).over(w_all),
        )
    )
    return ranked.filter(
        (F.col("rnk") >= 2)
        & (F.col("rnk") <= HARDNEG_K + 1)
        & (F.col("pos_cos") - F.col("cos_sim") >= HARDNEG_MARGIN)
        & (F.col("cos_sim") >= HARDNEG_FLOOR)
    ).select(
        "query_id",
        "pos_id",
        F.col("cand_id").alias("neg_id"),
        "pos_cos",
        F.col("cos_sim").alias("neg_cos"),
        F.round(F.col("pos_cos") - F.col("cos_sim"), 6).alias("margin"),
    )


# ---------------------------------------------------------------------------
# Per-label centroid cohesion (embedding-space mixture diagnostic)
# ---------------------------------------------------------------------------
@query(
    "embedding_label_cohesion",
    oracle="""
    WITH long AS (
      SELECT label, vec_id,
        CAST(round(unnest(embedding), 6) AS DECIMAL(7,6)) AS v6,
        unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    ), sums AS (
      SELECT label, pos, SUM(v6) AS s
      FROM long GROUP BY 1, 2
    ), dots AS (
      SELECT l.label, l.vec_id,
        SUM(l.v6 * s.s) AS dot,
        SUM(l.v6 * l.v6) AS vv
      FROM long l JOIN sums s USING (label, pos) GROUP BY 1, 2
    ), snorm AS (
      SELECT label, SUM(s * s) AS ss FROM sums GROUP BY 1
    ), cosv AS (
      SELECT d.label,
        CAST(round(CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(d.vv AS DOUBLE))
                      * sqrt(CAST(n.ss AS DOUBLE))), 6)
             AS DECIMAL(9,6)) AS c
      FROM dots d JOIN snorm n USING (label)
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
      round(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS avg_cos_to_centroid,
      CAST(MIN(c) AS DOUBLE) AS min_cos_to_centroid
    FROM cosv GROUP BY 1 ORDER BY 1
    """,
)
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding cohesion: each vector's cosine to its
    class centroid, rolled up to (mean, min) per label.

    The embedding-space mixture diagnostic: a label whose mean
    cosine-to-centroid is low (or whose min is deeply negative) is a
    heterogeneous / mislabeled slice — the signal SemDeDup-style
    pruning and cluster-balanced sampling decisions key off. Cosine is
    scale-invariant, so the "centroid" is the exact DECIMAL element-
    wise SUM vector (never divided by n): both engines feed identical
    exact moments into one double division, sidestepping cross-engine
    decimal-division scale rules entirely.

    Scale: the long format is a bounded 64x row expansion (dim *
    vectors — linear, not pairwise). Centroid sums are one map-side-
    combinable groupBy to labels*dim rows; that tiny frame broadcasts
    back onto the long stream (no shuffle of the big side), and the
    per-vector dot is a second map-side-combinable groupBy. Nothing
    here is O(n^2) and no step holds a whole class in one task.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "vec_id",
        "pos",
        F.round(F.col("v").cast("double"), 6).cast("decimal(7,6)").alias("v6"),
    )
    sums = long.groupBy("label", "pos").agg(F.sum("v6").alias("s"))
    dots = (
        long.join(F.broadcast(sums), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("v6") * F.col("s")).alias("dot"),
            F.sum(F.col("v6") * F.col("v6")).alias("vv"),
        )
    )
    snorm = sums.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("ss"))
    cosv = dots.join(F.broadcast(snorm), "label").select(
        "label",
        F.round(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("vv").cast("double")) * F.sqrt(F.col("ss").cast("double"))),
            6,
        )
        .cast("decimal(9,6)")
        .alias("c"),
    )
    return (
        cosv.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(
                F.sum("c").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_cos_to_centroid"),
            F.min("c").cast("double").alias("min_cos_to_centroid"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# kNN label agreement (round-8): neighborhood-based label QA — the
# confident-learning / deep-kNN signal (Northcutt et al. 2021,
# arXiv:1911.00068 use model probabilities; the embedding-space kNN
# variant flags a vector whose nearest neighbors mostly carry OTHER
# labels as a mislabel/boundary candidate). Complements
# embedding_label_cohesion: cohesion is centroid-global (a diffuse
# class scores low wholesale), agreement is local (pinpoints the
# individual suspect rows).
#
# Scale shape: the exact top-k uses the SAME tile-pair GEMM as
# embedding_neardup — each group emits only its per-vector PARTIAL
# top-k (k rows per vector per tile), so the global window ranks
# <= T*k candidates per vector, never n. Beyond the documented GEMM
# crossover (~10M vectors, SCALE.md) the candidate source swaps to
# lsh_buckets/IVF and this operator's window + label join are
# unchanged.
# ---------------------------------------------------------------------------

KNN_K = 10


@query(
    "knn_label_agreement",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    sims AS (
      SELECT a.vec_id AS qa, a.label AS la, b.vec_id AS nb,
        b.label AS lb,
        round(
          list_sum(list_transform(generate_series(1, {EMB_DIM}),
                                  i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
             * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6)
          AS cos_sim
      FROM base a JOIN base b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT qa, la, lb,
        row_number() OVER (PARTITION BY qa
                           ORDER BY cos_sim DESC, nb) AS rn
      FROM sims
    )
    SELECT qa AS vec_id, la AS label,
      CAST(SUM(CASE WHEN lb = la THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
      CAST(SUM(CASE WHEN lb = la THEN 1 ELSE 0 END) AS DOUBLE)
        / {KNN_K} AS agree_ratio
    FROM ranked WHERE rn <= {KNN_K}
    GROUP BY qa, la
    """,
)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per vector: how many of its KNN_K exact cosine neighbors share
    its label. Low agree_ratio = mislabel / class-boundary candidate.

    Ties at the rank-k boundary break on (cos_sim desc, neighbor_id) —
    identical in the kernel's lexsort and the oracle's window.

    Past ``ANN_CROSSOVER_VECS`` the CANDIDATE_SOURCE switch replaces
    the tile GEMM with LSH candidate pairs (exact cosine rerank, same
    window top-k); neighbor recall under the forced switch is measured
    in tests."""
    emb = _embeddings(spark, sf_dir)
    corpus = emb.select("vec_id", "label", _dvec("embedding").alias("v"))
    k = KNN_K
    vecs = corpus.select("vec_id", "v")
    raw = load_table(spark, sf_dir, "embeddings")  # count the raw scan,
    # not the repartitioned frame (that would shuffle the arrays)
    if _resolve_candidate_source(raw.count) == "lsh":
        knn = _knn_topk_lsh(vecs, k)
    else:
        knn = _knn_topk_exact(vecs, k)
    return _knn_agreement_rollup(knn, corpus, k)


def _knn_topk_lsh(vecs: DataFrame, k: int) -> DataFrame:
    """Top-k neighbor frame (vec_id, neighbor_id, cos_sim, rn) from
    multi-probe LSH candidates with exact cosine rerank — the
    post-crossover k-NN source. Every vector is a query here, so the
    query side is the full corpus fanned out 2^LSH_PROBE_BITS per
    table (a shuffle equi-join, NOT a broadcast — both sides are
    corpus-sized); the index side stays one row per (vector, table).
    Recall vs the exact GEMM is measured in tests with the switch
    forced on."""
    probes = lsh_query_probes(vecs).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        "table_id",
        "bucket",
    )
    index = lsh_buckets(vecs).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        "table_id",
        "bucket",
    )
    cand = (
        probes.join(index, ["table_id", "bucket"])
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    sims = cand.select(
        F.col("q_id").alias("vec_id"),
        "neighbor_id",
        F.round(_dot("qv", "cv") / (_norm("qv") * _norm("cv")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def _knn_topk_exact(vecs: DataFrame, k: int) -> DataFrame:
    """Top-k neighbor frame via the tile-pair GEMM: each tile group
    emits only its per-vector PARTIAL top-k (k rows per vector per
    tile), so the global window ranks <= T*k candidates per vector,
    never n. Quadratic FLOPs by contract — the CANDIDATE_SOURCE switch
    bounds where this runs."""
    t = NEARDUP_TILES
    tiled = (
        vecs.withColumn("tile", F.pmod(F.col("vec_id"), F.lit(t)).cast("int"))
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(t - 1))))
        .withColumn("ti", F.least("tile", "other"))
        .withColumn("tj", F.greatest("tile", "other"))
    )

    def knn_part(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "cos_sim": []}
        )
        if pdf.empty:
            return empty
        ti, tj = int(pdf["ti"].iat[0]), int(pdf["tj"].iat[0])
        a = pdf[pdf["tile"] == ti]
        b = pdf[pdf["tile"] == tj] if tj != ti else a
        if a.empty or b.empty:
            return empty
        ids_a = a["vec_id"].to_numpy()
        ids_b = b["vec_id"].to_numpy()
        ma = np.asarray(a["v"].tolist(), dtype=np.float64)
        mb = (
            np.asarray(b["v"].tolist(), dtype=np.float64) if tj != ti else ma
        )
        na = ma / np.linalg.norm(ma, axis=1, keepdims=True)
        nb = (
            mb / np.linalg.norm(mb, axis=1, keepdims=True)
            if tj != ti
            else na
        )
        sims = np.round(na @ nb.T, 6)
        frames = []

        def partial_topk(ids_q, ids_c, s):
            s = np.where(ids_q[:, None] == ids_c[None, :], -np.inf, s)
            for qi in range(s.shape[0]):
                order = np.lexsort((ids_c, -s[qi]))[:k]
                keep = order[np.isfinite(s[qi][order])]
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": np.repeat(ids_q[qi], len(keep)),
                            "neighbor_id": ids_c[keep],
                            "cos_sim": s[qi][keep],
                        }
                    )
                )

        partial_topk(ids_a, ids_b, sims)
        if tj != ti:
            partial_topk(ids_b, ids_a, sims.T)
        return pd.concat(frames) if frames else empty

    partial = tiled.groupBy("ti", "tj").applyInPandas(
        knn_part, schema="vec_id BIGINT, neighbor_id BIGINT, cos_sim DOUBLE"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return partial.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def _knn_agreement_rollup(
    knn: DataFrame, corpus: DataFrame, k: int
) -> DataFrame:
    """Shared tail of knn_label_agreement: join neighbor + own labels
    onto the (vec_id, neighbor_id) k-NN frame and roll up agreement.
    Candidate-source-independent — both the exact GEMM and the LSH
    path feed it the same schema."""
    n_label = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nl")
    )
    own = corpus.select("vec_id", "label")
    n_same = F.sum(
        F.when(F.col("nl") == F.col("label"), 1).otherwise(0)
    ).cast("bigint")
    return (
        knn.join(n_label, "neighbor_id")
        .join(own, "vec_id")
        .groupBy("vec_id", "label")
        .agg(n_same.alias("n_same"))
        .select(
            "vec_id",
            "label",
            "n_same",
            (F.col("n_same").cast("double") / k).alias("agree_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-label centroid separation (the between-class complement of
# embedding_label_cohesion's within-class diagnostic)
# ---------------------------------------------------------------------------
@query(
    "embedding_centroid_distances",
    oracle="""
    WITH long AS (
      SELECT label,
        CAST(round(unnest(embedding), 6) AS DECIMAL(7,6)) AS v6,
        unnest(range(0, len(embedding))) AS pos
      FROM embeddings
    ), sums AS (
      SELECT label, pos, SUM(v6) AS s
      FROM long GROUP BY 1, 2
    ), snorm AS (
      SELECT label, SUM(s * s) AS ss FROM sums GROUP BY 1
    ), cnt AS (
      SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
      FROM embeddings GROUP BY 1
    ), pairdot AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.s * b.s) AS dot
      FROM sums a JOIN sums b
        ON b.pos = a.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT p.label_a, p.label_b, ca.n AS n_a, cb.n AS n_b,
      round(CAST(p.dot AS DOUBLE)
            / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))),
            6) AS centroid_cos
    FROM pairdot p
    JOIN snorm na ON na.label = p.label_a
    JOIN snorm nb ON nb.label = p.label_b
    JOIN cnt ca ON ca.label = p.label_a
    JOIN cnt cb ON cb.label = p.label_b
    """,
)
def embedding_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between class centroids — the BETWEEN-class
    separation matrix that complements `embedding_label_cohesion`'s
    within-class score: two labels whose centroids sit at high cosine
    are confusable classes (merge candidates / labeling-noise
    suspects), the first read of any label-quality audit.

    Same exactness discipline as cohesion: the "centroid" is the
    exact DECIMAL element-wise SUM vector (cosine is scale-invariant,
    so the /n never happens), every moment is an exact decimal sum,
    and the one double division + round(6) is a fixed IEEE sequence.

    Scale: centroid sums are one map-side-combinable groupBy down to
    |labels| x dim rows; the pair frame is |labels|^2 x dim of that
    TINY frame (labels are a bounded universe) — nothing pairwise ever
    touches the vector count.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    long = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.round(F.col("v").cast("double"), 6).cast("decimal(7,6)").alias("v6"),
    )
    sums = long.groupBy("label", "pos").agg(F.sum("v6").alias("s"))
    snorm = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("ss")
    )
    cnt = emb.groupBy("label").agg(
        F.countDistinct("vec_id").cast("bigint").alias("n")
    )
    a = sums.select(
        F.col("label").alias("label_a"), "pos", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("label").alias("label_b"), "pos", F.col("s").alias("sb")
    )
    pairdot = (
        a.join(F.broadcast(b), "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot"))
    )
    na = snorm.select(F.col("label").alias("label_a"), F.col("ss").alias("ssa"))
    nb = snorm.select(F.col("label").alias("label_b"), F.col("ss").alias("ssb"))
    ca = cnt.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        pairdot.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("ssa").cast("double"))
                    * F.sqrt(F.col("ssb").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )
