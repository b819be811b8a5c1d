"""GEMM -> ANN crossover (round-9): the CANDIDATE_SOURCE switch.

The four quadratic-by-contract GEMM consumers (embedding_neardup,
knn_label_agreement, bitext_margin_mining, hard_negative_triplets)
swap their candidate generator to the LSH index past
ANN_CROSSOVER_VECS. These tests force the switch on the fixtures and
pin the contract:

- values are EXACT on every emitted row (the rerank is exact cosine —
  only candidate coverage changes, never a score);
- recall against the exact path clears the measured floor (fixture is
  near-isotropic, the worst case for LSH: real clustered corpora
  measure higher).

Measured on both driver fixtures (sf0.001 / sf0.01, seed 42):
neardup pair recall 1.0 / 1.0; knn neighbor recall 0.82 / 0.81;
hard-negative triplet recall 0.86 / 0.80; bitext rerank cosines
identical on every common mined pair.
"""

import contextlib

import pytest
from pyspark.sql import functions as F

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.operators import similarity as S  # noqa: E402

# 20k-vector crossover corpus — excluded from the driver's default verify run (pytest.ini
# deselects 'slow'; run with -m slow). VERDICT r13 task 6.
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def forced(source):
    prev = S.CANDIDATE_SOURCE
    S.CANDIDATE_SOURCE = source
    try:
        yield
    finally:
        S.CANDIDATE_SOURCE = prev


def test_resolve_auto_gates_on_vector_count():
    assert S._resolve_candidate_source(lambda: S.ANN_CROSSOVER_VECS) == "exact"
    assert (
        S._resolve_candidate_source(lambda: S.ANN_CROSSOVER_VECS + 1) == "lsh"
    )


def test_resolve_forced_never_counts():
    def boom():
        raise AssertionError("forced mode must not pay the count job")

    with forced("exact"):
        assert S._resolve_candidate_source(boom) == "exact"
    with forced("lsh"):
        assert S._resolve_candidate_source(boom) == "lsh"


def test_neardup_lsh_exact_values_and_recall(spark):
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in catalog.QUERIES["embedding_neardup"](spark, SF).collect()
    }
    with forced("lsh"):
        approx = {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in catalog.QUERIES["embedding_neardup"](spark, SF).collect()
        }
    assert exact, "fixture must produce near-dup pairs"
    # every LSH pair is a true pair with the identical exact cosine
    for pair, cos in approx.items():
        assert pair in exact and cos == exact[pair], pair
    recall = len(approx) / len(exact)
    # high-cosine pairs collide in >=1 of 16 tables w.p. ~1-5e-6;
    # measured 1.0 on both fixtures
    assert recall >= 0.95, f"near-dup recall {recall}"


def test_knn_lsh_neighbor_recall(spark):
    emb = S._embeddings(spark, SF)
    vecs = emb.select("vec_id", S._dvec("embedding").alias("v"))
    k = S.KNN_K

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.vec_id, set()).add(r.neighbor_id)
        return out

    exact = topk_sets(S._knn_topk_exact(vecs, k))
    approx = topk_sets(S._knn_topk_lsh(vecs, k))
    assert set(approx) == set(exact), "every vector must keep a k-NN row"
    recs = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    mean_rec = sum(recs) / len(recs)
    # measured 0.82 on this near-isotropic fixture (worst case)
    assert mean_rec >= 0.70, f"knn neighbor recall {mean_rec}"


def test_knn_agreement_lsh_shape(spark):
    exact_rows = {
        r.vec_id: (r.n_same, r.agree_ratio)
        for r in catalog.QUERIES["knn_label_agreement"](spark, SF).collect()
    }
    with forced("lsh"):
        lsh_rows = {
            r.vec_id: (r.n_same, r.agree_ratio)
            for r in catalog.QUERIES["knn_label_agreement"](
                spark, SF
            ).collect()
        }
    assert set(lsh_rows) == set(exact_rows)
    for vec_id, (n_same, ratio) in lsh_rows.items():
        assert 0 <= n_same <= S.KNN_K
        assert ratio == pytest.approx(n_same / S.KNN_K)


def test_hard_negatives_lsh_recall_and_values(spark):
    exact = {
        (r.query_id, r.neg_id): (r.pos_id, r.pos_cos, r.neg_cos, r.margin)
        for r in catalog.QUERIES["hard_negative_triplets"](
            spark, SF
        ).collect()
    }
    with forced("lsh"):
        approx = {
            (r.query_id, r.neg_id): (
                r.pos_id,
                r.pos_cos,
                r.neg_cos,
                r.margin,
            )
            for r in catalog.QUERIES["hard_negative_triplets"](
                spark, SF
            ).collect()
        }
    assert exact
    common = set(exact) & set(approx)
    # cosines on common triplets are the exact values (rerank is exact)
    for key in common:
        assert approx[key][2] == exact[key][2], key
    recall = len(common) / len(exact)
    # measured 0.86 / 0.80 on the fixtures; the ANN recall bar is 0.6
    assert recall >= 0.60, f"hard-negative recall {recall}"


def test_bitext_lsh_rerank_exact_on_common_pairs(spark):
    exact = {
        (r.src_id, r.tgt_id): r.cos_sim
        for r in catalog.QUERIES["bitext_margin_mining"](spark, SF).collect()
    }
    with forced("lsh"):
        approx = {
            (r.src_id, r.tgt_id): r.cos_sim
            for r in catalog.QUERIES["bitext_margin_mining"](
                spark, SF
            ).collect()
        }
    assert exact and approx
    common = set(exact) & set(approx)
    # the margin DENOMINATOR shifts when candidates shrink (k-NN sums
    # run over candidates), so mutual-best pairs legitimately differ —
    # but the rerank cosine on any common mined pair must be exact,
    # and the two mined sets must stay the same order of magnitude
    assert common, "mined sets must overlap"
    for pair in common:
        assert approx[pair] == exact[pair], pair
    assert len(approx) <= 2 * len(exact)
    assert len(common) / len(exact) >= 0.15


# --- crossover-SCALE exercise (VERDICT r11 task 4) ------------------
# ANN_CROSSOVER_VECS itself (10M 64-dim vectors, ~5 GB) cannot be
# materialized in a unit test; what CAN be tested at real scale is the
# property that makes the lsh branch survive the crossover at all:
# the adaptive signature width. 20k vectors is 10-40x the regime the
# knobs were tuned on (0.5-2k) and far past the fixed-width break-even
# (2^8 buckets bind above ~2k vectors), so this corpus exercises the
# _planes_for path with a genuinely wider signature (12 planes, 4096
# buckets/table) — the same code path and the same occupancy contract
# that holds at 10M.

SCALE_N = 20_000
SCALE_PLANTED = 400  # planted near-dup pairs (ground truth)
SCALE_DIM = 64


def _planted_corpus(spark):
    """n base vectors + SCALE_PLANTED perturbed twins. Independent
    64-dim gaussians have cos ~ N(0, 1/64) (|cos| > 0.5 is ~4e-5
    likely per pair at 6.3 sigma... but 2e8 pairs exist, so keep the
    threshold check on PLANTED pairs only and assert emitted pairs
    clear the exact threshold rather than exact set equality);
    planted twins are built with cos >= 0.99 by construction."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = rng.standard_normal((SCALE_N, SCALE_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twins = base[:SCALE_PLANTED] + 0.05 * rng.standard_normal(
        (SCALE_PLANTED, SCALE_DIM)
    ) / np.sqrt(SCALE_DIM)
    vecs = np.vstack([base, twins])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "v": list(vecs.astype(np.float64)),
        }
    )
    truth = {
        (int(i), int(SCALE_N + i)) for i in range(SCALE_PLANTED)
    }
    df = spark.createDataFrame(pdf).repartition(32)
    return df, truth


def test_planes_for_scales_log2():
    assert S._planes_for(100) == S.LSH_PLANES
    assert S._planes_for(2_048) == S.LSH_PLANES
    assert S._planes_for(20_400) == 12  # this test's corpus
    assert S._planes_for(10_000_000) == 21  # the crossover itself
    assert S._planes_for(1_000_000_000) == 27
    # recall floors from the _planes_for docstring math: >= 0.95 at
    # the 0.97 threshold boundary through the crossover decade, and
    # >= 0.99 for genuine twins (cos >= 0.99) even at 10^9 vectors
    import math

    def recall(cos, planes):
        p_bit = 1 - math.acos(cos) / math.pi
        return 1 - (1 - p_bit**planes) ** S.LSH_TABLES

    assert recall(0.97, 21) >= 0.95
    assert recall(0.99, 27) >= 0.99


def test_lsh_branch_at_scale_recall_and_volume(spark):
    """The forced-lsh candidate path on a 20k corpus with 400 planted
    near-dup twins: recall floor on the planted truth, exact rerank on
    every emitted pair, and — the scale property — candidate volume
    bounded by the occupancy contract (linear in n, NOT the
    O(n^2/2^8) a fixed-width signature would give; adaptive width
    keeps it at a constant ~58 pairs per vector)."""
    import numpy as np

    df, truth = _planted_corpus(spark)
    n = SCALE_N + SCALE_PLANTED

    cand = S._lsh_candidate_pairs(
        df.select("vec_id", "v"), n_vecs=n
    ).persist()
    n_cand = cand.count()
    # measured ~58 pairs/vector (1.19M total) at 12 planes — bucket
    # sizes under sign-LSH are multinomial, not uniform, so the
    # constant sits above occupancy/2 per table but stays O(n). The
    # fixed 8-plane width at this n would give ~2^(12-8)=16x more
    # (occupancy ~80/table -> ~300+ pairs/vector, growing with n).
    assert n_cand <= 80 * n, f"candidate volume {n_cand} not linear"

    got = (
        cand.select(
            "vec_a",
            "vec_b",
            F.round(
                S._dot("va", "vb") / (S._norm("va") * S._norm("vb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= S.NEARDUP_COS_THRESHOLD)
        .collect()
    )
    cand.unpersist()
    emitted = {(r.vec_a, r.vec_b) for r in got}
    # every emitted pair clears the EXACT threshold by construction of
    # the rerank; planted recall is the LSH guarantee under test
    hit = emitted & truth
    recall = len(hit) / len(truth)
    assert recall >= 0.95, f"planted-pair recall {recall} at 12 planes"
    # no pathological false-positive flood: non-planted gaussian pairs
    # at cos>=0.97 are ~8-sigma events
    assert len(emitted - truth) <= len(truth) // 10


# --- IVF/PQ at scale (VERDICT r12 "what's wrong" #1) ----------------
# Same medicine _planes_for applied to LSH: the fixed IVF_CELLS=16 /
# IVF_NPROBE=8 tuning probed HALF the corpus per query at any scale —
# at the 10M crossover that is brute-force/2, and PQ's exhaustive ADC
# pass had the same linear-scan-per-query shape. _cells_for sizes
# cells ~sqrt(n) and _nprobe_for probes ~sqrt(cells), and past the
# small-corpus gate PQ's ADC runs behind the same IVF cell index
# (FAISS IVFPQ). The 20k planted-twin corpus exercises the scaled
# path for real: 256 cells / 16 probes — 10x the tuned regime, the
# same code path and sizing contract that holds at 10M.


def test_cells_for_scales_sqrt():
    assert S._cells_for(100) == S.IVF_CELLS
    assert S._cells_for(S.IVF_SMALL_CORPUS) == S.IVF_CELLS
    assert S._cells_for(20_400) == 256  # this test's corpus
    assert S._cells_for(10_000_000) == 4096  # the crossover: ~2441/cell
    assert S._cells_for(10**9) == 32_768
    assert S._nprobe_for(S.IVF_CELLS) == S.IVF_NPROBE
    assert S._nprobe_for(256) == 16
    assert S._nprobe_for(4096) == 64
    # scanned corpus fraction per query at the crossover: nprobe/cells
    # (x IVF_ASSIGN index replication) = 3.1% — versus the fixed
    # tuning's 8/16 = 50% at every scale
    assert 64 / 4096 * S.IVF_ASSIGN <= 0.04


def test_ivf_at_scale_planted_recall_and_pruning(spark):
    """The scaled IVF path (256 cells / 16 probes, chosen by
    _cells_for) on the 20k corpus: every planted twin must find its
    base in its TOP_K rows, and the candidate volume must be a small
    fraction of the brute-force pair count — the pruning that makes
    IVF an index rather than a partitioned brute force."""
    df, truth = _planted_corpus(spark)
    n = SCALE_N + SCALE_PLANTED
    base = df.select("vec_id", "v").cache()
    try:
        got = S._ivf_topk(base, n, F.col("vec_id") >= SCALE_N).collect()
        hits = {(r.neighbor_id, r.query_id) for r in got}
        recall = len(hits & truth) / len(truth)
        # twin -> base is cos >= 0.99: both land in the same/adjacent
        # cells, and 16 probes x soft-assign 2 cover that neighborhood
        assert recall >= 0.95, f"planted recall {recall} at 256 cells"
        # pruning contract, measured on the same seeded (deterministic)
        # index: candidates <= ~1/8 of the 400 x 20.4k brute-force pair
        # count even with k-means cell-size skew (0.35 = measured ~0.13
        # plus slack)
        assigned, bc, nprobe = S._ivf_cell_index(base, n)
        assert len(bc.value) == 256 and nprobe == 16
        qprobe = S._ivf_query_probes(
            base.filter(F.col("vec_id") >= SCALE_N), bc, nprobe
        ).select("query_id", "cell")
        n_cand = qprobe.join(assigned.select("vec_id", "cell"), "cell").count()
        assert n_cand <= 0.35 * SCALE_PLANTED * n, f"candidates {n_cand}"
    finally:
        base.unpersist()


def test_pq_at_scale_planted_recall(spark):
    """The IVFPQ composition past the small-corpus gate: ADC scores
    only codes in the query's probed cells, then exact-reranks. A twin
    pair (cos >= 0.99, approx distance ~= quantization noise) must
    beat every background candidate (max gaussian cos ~0.56) into the
    PQ_CAND pool and rank first after the exact rerank."""
    df, truth = _planted_corpus(spark)
    n = SCALE_N + SCALE_PLANTED
    base = df.select("vec_id", "v").cache()
    try:
        got = S._pq_topk(base, n, F.col("vec_id") >= SCALE_N).collect()
        found = {(r.neighbor_id, r.query_id) for r in got}
        recall = len(found & truth) / len(truth)
        assert recall >= 0.90, f"planted IVFPQ recall {recall}"
    finally:
        base.unpersist()
