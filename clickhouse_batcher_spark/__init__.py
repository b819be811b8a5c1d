"""clickhouse_batcher_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``kostyasolovev/clickhouse-batcher`` (an async micro-batched ClickHouse
ingester), re-expressed Spark-first:

- the reference's ingest pipeline (bounded queue -> size-or-time
  micro-batch -> idempotent batched INSERT, ``hashes.go:11-102``)
  becomes Structured Streaming with a trigger + an idempotent,
  ``batchId``-keyed ``foreachBatch`` sink (``streaming/``);
- the reference's delegated query surface (counts, filtered counts,
  deletes — it pushes everything else to the ClickHouse server)
  becomes native DataFrame/SQL operators (``queries.py``);
- on top, the LLM-data-pipeline operators a 100 TB training-data
  pipeline needs: dedup (exact/minhash/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing
  (``operators/``).

Everything is declarative DataFrame/SQL so Catalyst (pushdown,
pruning, join selection, AQE) does the physical planning; Python UDFs
appear only as Arrow-batched pandas UDFs where built-ins genuinely
cannot express the semantics.
"""

from clickhouse_batcher_spark.session import get_session

__all__ = ["get_session", "BatcherEngine", "EngineConfig"]


def __getattr__(name: str):
    # Lazy: engine pulls in streaming/sinks; keep bare imports cheap.
    if name in ("BatcherEngine", "EngineConfig"):
        from clickhouse_batcher_spark import engine

        return getattr(engine, name)
    raise AttributeError(name)
__version__ = "0.1.0"
