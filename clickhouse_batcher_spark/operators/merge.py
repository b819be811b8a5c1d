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


# ---------------------------------------------------------------------------
# Snapshot diff (change-data-capture extraction, the inverse of
# merge_upsert): classify every key as insert / delete / update by
# full-outer-joining two table versions on the key and comparing the
# tracked value columns. Emits only changed rows (CDC semantics).
#
# Scale: one full-outer shuffle join on the key — the minimum for a
# diff without a shared lineage log; both sides prune to key+tracked
# columns before the exchange. Unchanged rows are dropped pre-output
# so the change feed is delta-sized, not snapshot-sized.
# ---------------------------------------------------------------------------
SNAP_OLD_DAY = "1995-06-01"  # old snapshot: orders strictly before
SNAP_NEW_DAY = "1996-06-01"  # new snapshot: orders strictly before


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], tracked: list[str]
) -> DataFrame:
    """Rows keyed by ``keys`` whose ``tracked`` columns changed
    between snapshots, labeled insert/delete/update."""
    # explicit presence markers: a tracked column may be legitimately
    # NULL in a present row, so presence must not be inferred from it
    o = old.select(
        *keys,
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"old_{c}") for c in tracked],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"new_{c}") for c in tracked],
    )
    j = o.join(n, keys, "full_outer")
    old_present = F.col("_old_present").isNotNull()
    new_present = F.col("_new_present").isNotNull()
    differs = None
    for c in tracked:
        # null-safe inequality: NULL -> value and value -> NULL count
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(~old_present & new_present, F.lit("insert"))
        .when(old_present & ~new_present, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return j.select(*keys, change.alias("change_type"), *[
        F.col(f"old_{c}") for c in tracked
    ], *[F.col(f"new_{c}") for c in tracked]).filter(
        F.col("change_type").isNotNull()
    )


@query(
    "orders_snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderdate < TIMESTAMP '{SNAP_OLD_DAY} 00:00:00'
    ),
    new AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
             ELSE o_totalprice END AS o_totalprice,
        o_orderstatus
      FROM orders
      WHERE o_orderdate < TIMESTAMP '{SNAP_NEW_DAY} 00:00:00'
        AND o_orderkey % 13 <> 3
    ),
    j AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_totalprice AS old_o_totalprice,
             o.o_orderstatus AS old_o_orderstatus,
             n.o_totalprice AS new_o_totalprice,
             n.o_orderstatus AS new_o_orderstatus
      FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey,
      CASE
        WHEN old_o_totalprice IS NULL AND new_o_totalprice IS NOT NULL
          THEN 'insert'
        WHEN old_o_totalprice IS NOT NULL AND new_o_totalprice IS NULL
          THEN 'delete'
        WHEN old_o_totalprice <> new_o_totalprice
          OR old_o_orderstatus <> new_o_orderstatus THEN 'update'
      END AS change_type,
      old_o_totalprice, old_o_orderstatus,
      new_o_totalprice, new_o_orderstatus
    FROM j
    WHERE CASE
        WHEN old_o_totalprice IS NULL AND new_o_totalprice IS NOT NULL
          THEN 'insert'
        WHEN old_o_totalprice IS NOT NULL AND new_o_totalprice IS NULL
          THEN 'delete'
        WHEN old_o_totalprice <> new_o_totalprice
          OR old_o_orderstatus <> new_o_orderstatus THEN 'update'
      END IS NOT NULL
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of two deterministic order-table snapshots: the later
    snapshot adds a year of orders (inserts), bumps the price of every
    10th key (updates), and drops keys = 3 mod 13 (deletes)."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(
        F.col("o_orderdate") < F.lit(f"{SNAP_OLD_DAY} 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = orders.filter(
        (
            F.col("o_orderdate")
            < F.lit(f"{SNAP_NEW_DAY} 00:00:00").cast("timestamp")
        )
        & (F.col("o_orderkey") % 13 != 3)
    ).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
