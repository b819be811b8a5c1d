"""Inverted index construction (the retrieval-infrastructure build).

BM25 scoring (``operators/corpus.py``) answers one query; serving
many queries needs the classic IR artifact: per-token posting lists.
Building one is a pure relational job — explode tokens, count
term frequency per (token, doc), aggregate per token — and the
posting list itself is a deterministic artifact when sorted by doc
id, which is what makes the whole index oracle-able.

Each output row: token, document frequency, total term frequency,
and the first ``POSTINGS_CAP`` doc ids (sorted ascending) as CSV.
The cap bounds row width: stopword-class tokens have corpus-sized
posting lists, and a real deployment shards those across rows
(block-max postings); ``df`` always records the TRUE document
frequency so the cap never hides information needed for scoring.

Scale: one shuffle to (token, doc) granularity with map-side
combine, one to token granularity (vocabulary-sized). Sorting
happens inside each token's collected array (bounded by the cap's
semantics, not corpus size — Spark's collect_list + sort_array here;
at extreme df swap in a windowed top-k before collecting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import tokens
from clickhouse_batcher_spark.operators.text import SQL_TOKENS
from clickhouse_batcher_spark.tables import load_table

POSTINGS_CAP = 64  # doc ids materialized per posting row


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest({SQL_TOKENS}) AS token FROM documents
    ),
    tf AS (
      SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM occ GROUP BY 1, 2
    )
    SELECT token,
      CAST(count(*) AS BIGINT) AS df,
      CAST(sum(tf) AS BIGINT) AS total_tf,
      array_to_string(
        list_slice(list(doc_id ORDER BY doc_id), 1, {POSTINGS_CAP}),
        ',') AS postings_csv
    FROM tf GROUP BY token
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token -> (df, total_tf, capped sorted posting list)."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = occ.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    postings = F.concat_ws(
        ",",
        F.transform(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP),
            lambda d: d.cast("string"),
        ),
    )
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        postings.alias("postings_csv"),
    )
