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
