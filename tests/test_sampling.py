"""Deterministic sampling/splitting: parity + stability properties."""

import pytest
from pyspark.sql import functions as F

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)
from clickhouse_batcher_spark.tables import load_table
from tests.parity import assert_parity

SAMPLING = [
    "docs_split_counts",
    "events_deterministic_sample",
    "docs_lang_quota_sample",
    "redact_docs",
    "weighted_sample_docs",
    "perplexity_bucket_sample",
    "doremi_domain_weights",
]


@pytest.mark.parametrize("name", SAMPLING)
def test_sampling_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_split_stable_under_repartition(spark, sf_dir):
    """Membership is a pure function of the row — repartitioning must
    not change any assignment (the failure mode of df.sample)."""
    docs = load_table(spark, sf_dir, "documents")
    a = {
        (r["doc_id"], r["split"])
        for r in train_val_test_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in train_val_test_split(docs.repartition(17), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_splits_partition_the_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = train_val_test_split(docs, "doc_id")
    counts = dict(
        (r["split"], r["cnt"])
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    total = sum(counts.values())
    # hash buckets approximate the requested 80/10/10
    assert 0.6 < counts["train"] / total < 0.95


def test_sample_fraction_approximates_pct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    s = deterministic_sample(events, "event_id", 20).count()
    assert 0.12 < s / n < 0.28
    # idempotent: same sample twice
    assert deterministic_sample(events, "event_id", 20).count() == s


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """The A-ES property: inclusion probability grows with weight, so
    the sampled mean weight must exceed the corpus mean (deterministic
    corpus + deterministic hash -> a stable, assertable bias)."""
    from clickhouse_batcher_spark.operators.sampling import WRS_K

    sampled = catalog.QUERIES["weighted_sample_docs"](spark, sf_dir).collect()
    assert len(sampled) == min(
        WRS_K,
        load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0).count(),
    )
    ranks = [r["rank"] for r in sampled]
    assert ranks == list(range(1, len(sampled) + 1))
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r["weight"] for r in sampled) / len(sampled)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_doremi_update_invariants(spark, sf_dir):
    """The exponentiated-gradient step must (a) produce a proper
    distribution, (b) keep every domain above the uniform-smoothing
    floor, and (c) move weight monotonically with excess loss: among
    equal-share domains, higher excess loss => weight ratio vs the
    baseline share never decreases."""
    from clickhouse_batcher_spark.operators.sampling import (
        DOREMI_SMOOTH,
        doremi_domain_weights,
    )

    rows = doremi_domain_weights(spark, sf_dir).collect()
    n = len(rows)
    assert abs(sum(r["final_weight"] for r in rows) - 1.0) < 1e-6
    floor = DOREMI_SMOOTH / n
    assert all(r["final_weight"] >= floor - 1e-12 for r in rows)
    # boost factor implied by the update is monotone in excess loss
    # (tolerance: u_ppm is quantized to 0.5 parts-per-million, so the
    # implied ratio carries up to ~1e-4 relative quantization noise on
    # the smallest shares)
    tol = 1e-4
    ranked = sorted(rows, key=lambda r: r["excess_loss"])
    ratios = [r["doremi_weight"] / r["token_share"] for r in ranked]
    assert all(b >= a - tol for a, b in zip(ratios, ratios[1:]))
    # zero-excess domains share one (minimal) boost ratio
    zero = [
        r["doremi_weight"] / r["token_share"]
        for r in rows
        if r["excess_loss"] == 0.0
    ]
    assert zero and max(zero) - min(zero) < tol
    assert min(zero) <= min(ratios) + tol
