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
