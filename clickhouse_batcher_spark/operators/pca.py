"""Distributed PCA over the embedding table — the classic
bounded-driver-state pattern for low-rank projection / whitening of
embedding columns before clustering or ANN indexing.

Why this shape scales: the ONLY things that ever leave the executors
are per-partition Gram partials — one row per partition carrying
(count, feature-sum d-vector, flattened d x d Gram) — so driver state
is O(partitions * d^2) regardless of row count (d = 64 here; at 100 TB
the partials stream into the same tiny sum). The d x d eigensolve is
microscopic driver work (same bounded-driver policy as the IVF k-means
centroids, `similarity.py`), and the projection pass is an
Arrow-batched matrix multiply per executor — no shuffle at all.

Determinism: partials accumulate in float64; eigenvector sign is fixed
by making each component's largest-|weight| coordinate positive, so
re-runs and re-partitionings agree to float tolerance (asserted by the
equivalence test). The operator is registered rows-only — an
eigendecomposition is not SQL-expressible — with a NumPy full-data
equivalence test standing in for the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

PCA_K = 8


def _build_gram_partials():
    """Factory: the kernel must be a LOCAL def so cloudpickle ships it
    by value (a module-level function pickles by reference, and this
    package is not importable on executor workers when the driver runs
    from a different cwd — operators/multimodal.py's round-3 lesson)."""

    def gram_partials(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    return gram_partials


def pca_fit(
    spark: SparkSession, emb: DataFrame, k: int = PCA_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean d-vector, components k x d, explained-variance ratios k).

    One distributed pass; the collect is bounded at one row per
    partition.
    """
    parts = emb.select("embedding").mapInPandas(
        _build_gram_partials(),
        schema="n long, s array<double>, g array<double>",
    ).collect()
    if not parts:
        raise ValueError("empty embedding table")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    # Sign convention: largest-|weight| coordinate positive.
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    evr = np.maximum(evals[order], 0.0) / max(float(evals.clip(min=0).sum()), 1e-30)
    return mean, comps, evr


@query("embedding_pca_project", oracle=None)  # eigensolve: not SQL-expressible
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-PCA_K principal components
    (centered), emitting (vec_id, proj) — the dimensionality-reduction
    front of an embedding pipeline (cheaper ANN, denoised clustering).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mean, comps, _ = pca_fit(spark, emb)
    bc = spark.sparkContext.broadcast((mean, comps))

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            P = (X - m) @ c.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": list(map(list, P))}
            )

    return emb.mapInPandas(
        project, schema="vec_id long, proj array<double>"
    ).orderBy("vec_id")
