"""Bloom-prefilter semi join (the runtime-filter / sideways
information passing pattern).

At 100 TB the expensive part of ``big SEMI JOIN small`` is moving the
big side: a shuffled join exchanges every big-side row on the key. The
standard fix — what Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and ClickHouse's
``bloom_filter`` skip indexes do — is to compress the small side's key
set into a few KB of bits, apply it to the big side *before* any
exchange, and run the exact join only on the survivors. The bloom pass
admits false positives but never false negatives, so the exact verify
step on the (far smaller) survivor set restores exact semi-join
semantics; that is why this operator is fully SQL-oracle-able as a
plain ``IN`` subquery.

Implementation is pure relational algebra, no driver-side state:

- build: the filtered dim's distinct keys explode into k=2 (word,
  bit) coordinates via the engine-portable SHA-based hash
  (``functions.portable_hash64``); ``bit_or`` over the bit masks
  folds them into a ``BLOOM_WORDS``-row bitmap table (KBs — the
  driver never sees it, it stays a broadcast-able DataFrame).
- probe: each big-side row joins the broadcast bitmap once per hash
  function on its word index and must find its bit set in both —
  two broadcast hash joins + filters, zero exchange of the big side.
- verify: a broadcast left-semi join of the survivors against the
  true key set (exactness; in a production shuffled-join scenario
  this is the step whose input the bloom pass just shrank).

Words hold 32 bits each (mask = 2^bit computed via ``pow``, exact in
doubles up to 2^32) so no column-valued shift expression is needed.
Sizing: 2 hashes over BLOOM_WORDS*32 bits give a false-positive rate
of roughly (load factor)^2; at scale W grows with the dim's key count
and the bitmap stays broadcast-able far longer than the raw key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import portable_hash64
from clickhouse_batcher_spark.tables import load_table

BLOOM_WORDS = 512          # 32-bit words => 16384 bits
BLOOM_HASH_SALTS = ("bf0:", "bf1:")  # k = 2 hash functions
BLOOM_SEGMENT = "BUILDING"  # dim filter for the catalog query


def _coords(key: Column, salt: str) -> tuple[Column, Column]:
    """(word index, 32-bit mask as long) of one hash for a key."""
    pos = F.pmod(portable_hash64(key.cast("string"), salt), F.lit(BLOOM_WORDS * 32))
    word = F.floor(pos / 32).cast("int")
    mask = F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")
    return word, mask


def bloom_build(dim: DataFrame, key_col: str) -> DataFrame:
    """Fold a dim key column into a (word, bits) bitmap DataFrame."""
    coords = None
    for salt in BLOOM_HASH_SALTS:
        word, mask = _coords(F.col(key_col), salt)
        part = dim.select(word.alias("word"), mask.alias("mask"))
        coords = part if coords is None else coords.unionByName(part)
    return coords.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(big: DataFrame, big_key: str, bloom: DataFrame) -> DataFrame:
    """Keep big-side rows whose key has every hash bit set in bloom."""
    out = big
    for i, salt in enumerate(BLOOM_HASH_SALTS):
        word, mask = _coords(F.col(big_key), salt)
        probe = F.broadcast(
            bloom.select(
                F.col("word").alias(f"w{i}"), F.col("bits").alias(f"b{i}")
            )
        )
        out = (
            out.withColumn(f"pw{i}", word)
            .withColumn(f"pm{i}", mask)
            .join(probe, F.col(f"pw{i}") == F.col(f"w{i}"), "left")
            .filter(
                F.col(f"b{i}").isNotNull()
                & (F.col(f"b{i}").bitwiseAND(F.col(f"pm{i}")) != 0)
            )
            .drop(f"pw{i}", f"pm{i}", f"w{i}", f"b{i}")
        )
    return out


def bloom_semi_join(
    big: DataFrame, big_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Exact semi join of big on dim keys, bloom-prefiltered."""
    bloom = bloom_build(dim, dim_key)
    survivors = bloom_probe(big, big_key, bloom)
    truth = dim.select(F.col(dim_key).alias(big_key)).distinct()
    return survivors.join(F.broadcast(truth), big_key, "left_semi")


@query(
    "bloom_semi_join_orders",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
    )
    """,
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of one customer segment via bloom-prefiltered semi join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    segment = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    return bloom_semi_join(orders, "o_custkey", segment, "c_custkey")
