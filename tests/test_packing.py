"""Training-export operators: oracle parity + semantic properties."""

from __future__ import annotations

import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from parity import assert_parity

from clickhouse_batcher_spark.operators.packing import (
    N_SHARDS,
    PACK_BUDGET_CHARS,
)


@pytest.mark.parametrize(
    "name", ["shard_documents_for_training", "pack_sequences_budget"]
)
def test_packing_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_shard_positions_contiguous_and_complete(spark, sf_dir):
    """Every document lands in exactly one shard, and positions within
    a shard are exactly 0..n-1 (a loader can seek by offset)."""
    from clickhouse_batcher_spark.tables import load_table

    out = catalog.QUERIES["shard_documents_for_training"](spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    assert set(out["shard"].unique()) <= set(range(N_SHARDS))
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_pack_ids_match_running_sum(spark, sf_dir):
    """pack_id must equal floor(exclusive running chars / budget) under
    the deterministic (ord, doc_id) order — recomputed independently in
    pandas, and stable across two Spark executions."""
    df = catalog.QUERIES["pack_sequences_budget"](spark, sf_dir)
    a = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), "pack assignment not deterministic"

    # Independent recomputation needs the shuffle key; rebuild it the
    # same portable way (first 4 hex chars of salted sha256).
    import hashlib

    def bucket(v, buckets, salt):
        return int(hashlib.sha256(f"{salt}{v}".encode()).hexdigest()[:4], 16) % buckets

    a["ord"] = a["doc_id"].map(lambda d: bucket(d, 1_000_000, "packorder"))
    for (_, _), grp in a.groupby(["source", "subshard"]):
        grp = grp.sort_values(["ord", "doc_id"])
        running = 0
        for _, row in grp.iterrows():
            assert row["pack_id"] == running // PACK_BUDGET_CHARS
            running += row["n_chars"]
