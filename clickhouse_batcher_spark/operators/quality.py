"""Declarative data-quality constraint checking (the Deequ pattern).

A warehouse load is gated on a constraint suite: uniqueness of the
key, completeness (non-null) of required columns, domain membership,
value ranges, and referential integrity into dimensions. Each
constraint reduces to one relational metric; the checker runs them
as a union of small aggregates and emits one row per constraint —
(name, metric, threshold-pass) — the artifact a pipeline's quality
gate consumes.

Scale: completeness/range/domain metrics ride ONE shared pass over
the fact table (conditional aggregation — a single map-side-combined
global agg); uniqueness is a key-grouped count (shuffles key rows);
referential integrity is an anti-join count against the dimension's
key set (unhinted — customer keys are O(SF); AQE broadcasts them
while they fit). Nothing materializes violating rows here —
production debugging would add a `.filter` re-run on the failing
constraint only.

Determinism: every metric is an exact integer; `pass` is an integer
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

ORDER_STATUSES = ("O", "F", "P")
PRICE_MIN, PRICE_MAX = 0.0, 1_000_000.0


@query(
    "orders_quality_constraints",
    oracle=f"""
    WITH base AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
          AS null_custkey,
        CAST(count(*) FILTER (WHERE o_orderstatus NOT IN
          ({", ".join(f"'{s}'" for s in ORDER_STATUSES)})
          OR o_orderstatus IS NULL) AS BIGINT) AS bad_status,
        CAST(count(*) FILTER (WHERE o_totalprice IS NULL
          OR o_totalprice < {PRICE_MIN}
          OR o_totalprice > {PRICE_MAX}) AS BIGINT) AS bad_price
      FROM orders
    ),
    dup AS (
      SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS dup_keys
      FROM (SELECT o_orderkey, count(*) AS c FROM orders
            GROUP BY o_orderkey) g
      WHERE c > 1
    ),
    orphan AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM orders o
      WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      SELECT 'row_count_positive' AS constraint_name,
             n_rows AS violations, n_rows > 0 AS pass FROM base
      UNION ALL
      SELECT 'orderkey_unique', dup_keys, dup_keys = 0 FROM dup
      UNION ALL
      SELECT 'custkey_complete', null_custkey, null_custkey = 0 FROM base
      UNION ALL
      SELECT 'status_in_domain', bad_status, bad_status = 0 FROM base
      UNION ALL
      SELECT 'price_in_range', bad_price, bad_price = 0 FROM base
      UNION ALL
      SELECT 'custkey_references_customer', orphans, orphans = 0 FROM orphan
    ) t
    """,
)
def orders_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders: one row per rule."""
    return check_orders_constraints(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def check_orders_constraints(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """The suite itself, input-agnostic (tests feed planted-dirty
    frames to prove each rule actually fires)."""
    base = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("null_custkey"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin(*ORDER_STATUSES)
                | F.col("o_orderstatus").isNull(),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("bad_status"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") < PRICE_MIN)
                | (F.col("o_totalprice") > PRICE_MAX),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("bad_price"),
    )
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
            .cast("bigint")
            .alias("dup_keys")
        )
    )
    orphan = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
    )

    def row(name: str, metric, passed):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            metric.cast("bigint").alias("violations"),
            passed.alias("pass"),
        )

    base_rows = base.select(
        F.explode(
            F.array(
                row("row_count_positive", F.col("n_rows"), F.col("n_rows") > 0),
                row(
                    "custkey_complete",
                    F.col("null_custkey"),
                    F.col("null_custkey") == 0,
                ),
                row(
                    "status_in_domain",
                    F.col("bad_status"),
                    F.col("bad_status") == 0,
                ),
                row("price_in_range", F.col("bad_price"), F.col("bad_price") == 0),
            )
        ).alias("r")
    ).select("r.*")
    dup_rows = dup.select(
        row("orderkey_unique", F.col("dup_keys"), F.col("dup_keys") == 0).alias("r")
    ).select("r.*")
    orphan_rows = orphan.select(
        row(
            "custkey_references_customer",
            F.col("orphans"),
            F.col("orphans") == 0,
        ).alias("r")
    ).select("r.*")
    return base_rows.unionByName(dup_rows).unionByName(orphan_rows)
