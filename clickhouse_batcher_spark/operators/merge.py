"""MERGE / upsert emulation on immutable storage (CDC landing pattern).

No Delta/Iceberg jars in this environment, so MERGE INTO semantics are
expressed relationally: full-outer join on the key, updates win over
target rows (SCD1). This is the exact logical plan a lakehouse MERGE
compiles to minus the file-level pruning; at scale both sides shuffle
once on the key (or co-locate via bucketing), and AQE handles skew.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table


def merge_upsert(target: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """SCD1 upsert: rows from ``updates`` replace same-key target rows;
    unmatched update rows are inserted; unmatched target rows survive."""
    value_cols = [c for c in target.columns if c not in key_cols]
    t = target.alias("t")
    u = updates.alias("u")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols],
    )
    joined = t.join(u, cond, "full_outer")
    out_keys = [
        F.coalesce(F.col(f"u.{k}"), F.col(f"t.{k}")).alias(k) for k in key_cols
    ]
    out_vals = [
        F.when(F.col(f"u.{key_cols[0]}").isNotNull(), F.col(f"u.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*out_keys, *out_vals)


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
             o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey,
           COALESCE(u.o_custkey, t.o_custkey) AS o_custkey,
           COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
           COALESCE(u.o_orderdate, t.o_orderdate) AS o_orderdate,
           COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM orders t FULL OUTER JOIN updates u USING (o_orderkey)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC batch: 10% price updates + synthetic inserts."""
    orders = load_table(spark, sf_dir, "orders")
    updated = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    inserted = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    updates = updated.unionByName(inserted)
    return merge_upsert(orders, updates, key_cols=["o_orderkey"])
