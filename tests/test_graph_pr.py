"""Fixed-point PageRank: python-dict recompute + DuckDB parity."""

from pyspark.sql import functions as F

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.operators.graph import (
    PR_ITERS,
    PR_SCALE,
    coactivity_edges,
)
from clickhouse_batcher_spark.tables import load_table
from tests.parity import assert_parity


def test_pagerank_parity(spark, sf_dir):
    assert_parity(spark, "coactivity_pagerank", sf_dir)


def test_density_cap_bounds_pairing_blowup(spark):
    """Freeze the round-4 8x-density probe as a regression test
    (VERDICT r4 task 8). Synthetic frames make the density explicit:

    - base: exactly COACT_MAX_PER_HOUR users active in each of 24
      hours (the cap does NOT bind);
    - dense: 8x that many users per hour (the cap MUST bind).

    With the cap working, both frames pair the same number of users
    per hour, so the dense run costs only the extra (linear)
    row_number pass — without the cap the pair join is 64x bigger and
    the probe measured 4.9 s -> 42 s at sf0.1. Assert the dense run
    stays within a small factor of base (generous bound: timing noise,
    not the 8.5x quadratic signature, is what we tolerate)."""
    import time

    from clickhouse_batcher_spark.operators.graph import COACT_MAX_PER_HOUR

    def frame(n_users):
        return (
            spark.range(n_users)
            .withColumnRenamed("id", "user_id")
            .crossJoin(spark.range(24).withColumnRenamed("id", "h"))
            .select(
                "user_id",
                F.expr(
                    "timestampadd(HOUR, cast(h AS INT), "
                    "timestamp'2025-01-01 00:00:00')"
                ).alias("ts"),
            )
        )

    def timed(n_users):
        df = frame(n_users)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            coactivity_edges(df, min_hours=25).count()  # 0 edges; pairing still runs
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        return best

    t_base = timed(COACT_MAX_PER_HOUR)
    t_dense = timed(8 * COACT_MAX_PER_HOUR)
    assert t_dense <= 2.5 * t_base + 2.0, (
        f"density cap regression: base {t_base:.1f}s, 8x-dense "
        f"{t_dense:.1f}s — pairing is growing with RAW density again"
    )


def test_pagerank_matches_python_recompute(spark, sf_dir):
    """The distributed integer iteration must equal a sequential dict
    recompute with the same fixed-point arithmetic."""
    events = load_table(spark, sf_dir, "events")
    e = coactivity_edges(events).collect()
    adj: dict[int, list[int]] = {}
    for r in e:
        adj.setdefault(r["ua"], []).append(r["ub"])
        adj.setdefault(r["ub"], []).append(r["ua"])
    rank = {n: PR_SCALE for n in adj}
    for _ in range(PR_ITERS):
        recv = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            c = rank[n] // len(nbrs)
            for m in nbrs:
                recv[m] += c
        rank = {
            n: (15 * PR_SCALE) // 100 + (85 * recv[n]) // 100 for n in adj
        }
    expected = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["node"], r["pr_score"])
        for r in catalog.QUERIES["coactivity_pagerank"](spark, sf_dir)
        .orderBy("pos")
        .collect()
    ]
    assert got == expected


def test_kcore_parity(spark, sf_dir):
    assert_parity(spark, "coactivity_kcore", sf_dir)


def test_kcore_matches_exact_peel_to_fixpoint(spark, sf_dir):
    """The fixed KCORE_ROUNDS unroll must CONVERGE on the fixture —
    i.e. equal the exact k-core, recomputed here by peeling a plain
    Python adjacency map to fixpoint (no round limit)."""
    from clickhouse_batcher_spark.operators.graph import (
        KCORE_K,
        coactivity_edges_cached,
        coactivity_kcore,
    )

    edges = [
        (r["ua"], r["ub"])
        for r in coactivity_edges_cached(spark, sf_dir).collect()
    ]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    total_deg = {n: len(v) for n, v in adj.items()}
    rem = {n: set(v) for n, v in adj.items()}
    while True:
        drop = [n for n, v in rem.items() if len(v) < KCORE_K]
        if not drop:
            break
        for n in drop:
            for m in rem[n]:
                if m in rem:
                    rem[m].discard(n)
            del rem[n]
    got = {
        r["node"]: (r["total_deg"], r["core_deg"])
        for r in coactivity_kcore(spark, sf_dir).collect()
    }
    want = {n: (total_deg[n], len(v)) for n, v in rem.items()}
    assert got == want
    assert all(cd >= KCORE_K for _, cd in got.values())


def test_label_propagation_sequential_recompute(spark, sf_dir):
    """Synchronous LP with (count desc, label asc) tiebreak recomputed
    sequentially over the same edge frame must reproduce the community
    table exactly."""
    from collections import Counter, defaultdict

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.operators.graph import (
        LP_ROUNDS,
        coactivity_edges_cached,
    )

    edges = coactivity_edges_cached(spark, sf_dir).collect()
    nbrs = defaultdict(list)
    for e in edges:
        nbrs[e.ua].append(e.ub)
        nbrs[e.ub].append(e.ua)
    labels = {n: n for n in nbrs}
    for _ in range(LP_ROUNDS):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(labels[m] for m in ns)
            new[n] = min(c, key=lambda l: (-c[l], l))
        labels = new
    want = defaultdict(lambda: [0, 1 << 62, -1])
    for n, l in labels.items():
        w = want[l]
        w[0] += 1
        w[1] = min(w[1], n)
        w[2] = max(w[2], n)
    got = {
        r.community: (r.n_members, r.min_node, r.max_node)
        for r in catalog.QUERIES["coactivity_label_propagation"](
            spark, sf_dir
        ).collect()
    }
    assert got == {l: tuple(w) for l, w in want.items()}


def test_assortativity_numpy_recompute(spark, sf_dir):
    """Pearson of endpoint degrees recomputed with numpy; value in
    [-1, 1]."""
    import numpy as np
    import pytest

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.operators.graph import (
        coactivity_edges_cached,
    )

    edges = coactivity_edges_cached(spark, sf_dir).collect()
    directed = [(e.ua, e.ub) for e in edges] + [
        (e.ub, e.ua) for e in edges
    ]
    from collections import Counter

    deg = Counter(s for s, _ in directed)
    x = np.array([deg[s] for s, _ in directed], dtype=np.float64)
    y = np.array([deg[d] for _, d in directed], dtype=np.float64)
    m = len(x)
    num = m * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(
        (m * (x * x).sum() - x.sum() ** 2)
        * (m * (y * y).sum() - y.sum() ** 2)
    )
    row = catalog.QUERIES["coactivity_assortativity"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_directed_edges == m
    want = round(num / den, 6) if den > 0 else 0.0  # 0.0-by-convention
    assert row.assortativity == pytest.approx(want, abs=1e-6)
    assert -1 - 1e-9 <= row.assortativity <= 1 + 1e-9
