"""Core query surface — the reference-derived operators (SURVEY.md §2).

Each query is registered with a DuckDB oracle. Implementations are
pure DataFrame API so Catalyst plans them (pushdown, pruning, join
selection); determinism rules:

- float aggregates go through DECIMAL (``functions.dec_sum``) so the
  result is independent of partition/shuffle order and bit-identical
  to the oracle;
- every ranking has a total order (unique tiebreak column);
- every computed column is aliased identically in Spark and SQL.

Reference citations: Q1/Q2 (counts) ``hashes_test.go:191-203,227-233``;
Q3 (delete) ``hashes_test.go:235-239``; R3 (ingest+readback)
``hashes.go:76-102``; sha256sum column ``hashes.go:25``.
"""

from __future__ import annotations

import tempfile
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec, dec_avg, dec_sum, dec_sum_expr, sha256_hex
from clickhouse_batcher_spark.sinks.delete import delete_where
from clickhouse_batcher_spark.sinks.parquet_sink import IdempotentParquetSink
from clickhouse_batcher_spark.tables import TABLE_NAMES, load_table


# ---------------------------------------------------------------------------
# Q1: full counts (SELECT COUNT(*) — hashes_test.go:227-233)
# ---------------------------------------------------------------------------
@query(
    "count_star_all",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS cnt FROM {t}" for t in TABLE_NAMES
    ),
)
def count_star_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(t).alias("table_name"), "cnt")
        for t in TABLE_NAMES
    ]
    return reduce(DataFrame.unionByName, parts)


# ---------------------------------------------------------------------------
# Q2: conjunctive-equality filtered count (hashes_test.go:191-203)
# ---------------------------------------------------------------------------
@query(
    "filtered_count",
    oracle="""
    SELECT COUNT(*) AS cnt FROM events
    WHERE user_id = 7 AND event_type = 'click'
    """,
)
def filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("user_id") == 7) & (F.col("event_type") == "click"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# R3: ingest -> sink -> readback identity (hashes.go:76-102 row fidelity,
# tested by TestRepository_save's exactly-once readback)
# ---------------------------------------------------------------------------
@query(
    "ingest_readback",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    """,
)
def ingest_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sink = IdempotentParquetSink(tempfile.mkdtemp(prefix="chb_readback_"))
    sink.write_batch(events, batch_id=0)
    return sink.read(spark)


# ---------------------------------------------------------------------------
# R3 idempotency: same batch delivered twice under one batch_id -> no dupes
# (the reference's isSent intent, hashes.go:70-83, minus its TOCTOU race)
# ---------------------------------------------------------------------------
@query(
    "replay_idempotent",
    oracle="SELECT COUNT(*) AS cnt, COUNT(DISTINCT event_id) AS n_ids FROM events",
)
def replay_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sink = IdempotentParquetSink(tempfile.mkdtemp(prefix="chb_replay_"))
    first = sink.write_batch(events, batch_id=0)
    second = sink.write_batch(events, batch_id=0)  # replay: must be a no-op
    assert first and not second
    return sink.read(spark).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("event_id").alias("n_ids"),
    )


# ---------------------------------------------------------------------------
# Q3: predicate delete as anti-filter rewrite (hashes_test.go:235-239)
# ---------------------------------------------------------------------------
@query(
    "delete_where_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt FROM events
    WHERE NOT (event_type = 'error') GROUP BY event_type
    """,
)
def delete_where_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    remaining = delete_where(events, F.col("event_type") == "error")
    return remaining.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Scalar fn: SHA-256 content hash (the sha256sum column, hashes.go:25)
# ---------------------------------------------------------------------------
@query(
    "sha256_docs",
    oracle="SELECT doc_id, sha256(text) AS text_sha256 FROM documents",
)
def sha256_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", sha256_hex("text").alias("text_sha256"))


# ---------------------------------------------------------------------------
# TPC-H Q1-style aggregation (SURVEY §2.3 #6)
# ---------------------------------------------------------------------------
_Q1_DEC = "CAST({expr} AS DECIMAL(27,6))"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM({_Q1_DEC.format(expr='l_quantity')}) AS DOUBLE) AS sum_qty,
      CAST(SUM({_Q1_DEC.format(expr='l_extendedprice')}) AS DOUBLE) AS sum_base_price,
      CAST(SUM({_Q1_DEC.format(expr='l_extendedprice * (1 - l_discount)')}) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM({_Q1_DEC.format(expr='l_extendedprice * (1 - l_discount) * (1 + l_tax)')})
        AS DOUBLE) AS sum_charge,
      CAST(SUM({_Q1_DEC.format(expr='l_quantity')}) AS DOUBLE)
        / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(SUM({_Q1_DEC.format(expr='l_extendedprice')}) AS DOUBLE)
        / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
      CAST(SUM({_Q1_DEC.format(expr='l_discount')}) AS DOUBLE)
        / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum_expr(dec(disc_price)).alias("sum_disc_price"),
            dec_sum_expr(dec(charge)).alias("sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# 3-way equi-join + group agg (SURVEY §2.3 #6). customer is the
# smaller side but O(SF) — joined UNHINTED so AQE broadcasts it while
# it fits; orders⋈lineitem shuffles on the join key only.
# ---------------------------------------------------------------------------
@query(
    "join_revenue_by_segment",
    oracle="""
    SELECT c_mktsegment,
      COUNT(DISTINCT o_orderkey) AS n_orders,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
        AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_mktsegment
    """,
)
def join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "inner"
    ).join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    )
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum(revenue).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.3 #7)
# ---------------------------------------------------------------------------
@query(
    "except_all_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def except_all_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.exceptAll(purchases)


@query(
    "intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select("user_id")
    errors = events.filter(F.col("event_type") == "error").select("user_id")
    return signups.intersect(errors)


# ---------------------------------------------------------------------------
# Window: per-user top-3 by value (SURVEY §2.3 #8). Total order via
# (value DESC, event_id) — event_id is unique, so ranking is
# deterministic and oracle-comparable.
# ---------------------------------------------------------------------------
@query(
    "topk_per_user",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
)
def topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        events.select(
            "user_id",
            "event_id",
            "value",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Dedup, exact (SURVEY §2.3 #9): deterministic survivor = min(doc_id)
# ---------------------------------------------------------------------------
@query(
    "dedup_exact_docs",
    oracle="SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# Grouped distinct-count (beyond the reference's COUNT(*))
# ---------------------------------------------------------------------------
@query(
    "distinct_users_by_type",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events
    GROUP BY event_type
    """,
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Time-bucketed aggregation — the batch analogue of the streaming
# windowed agg the ingest pipeline feeds.
# ---------------------------------------------------------------------------
@query(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      COUNT(*) AS cnt,
      CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value", "total_value"))
    )


# ---------------------------------------------------------------------------
# Rollup (multi-level aggregate)
# ---------------------------------------------------------------------------
@query(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), dec_sum("o_totalprice", "total")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------
@query(
    "parts_with_heavy_lineitems",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity > 45)
    """,
)
def parts_with_heavy_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return part.join(
        heavy, part.p_partkey == heavy.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


@query(
    "customers_without_recent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
)
def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join with a pushed-down date predicate on the right side —
    non-empty at every SF (a bare no-orders-ever anti-join matches
    nothing in this data, which would make the check vacuous)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Multi-dim join through the full snowflake (region->nation->customer->
# orders): region/nation hints stay (constant-size); the customer-wide
# dim frame joins unhinted (O(SF) — AQE-broadcast while it fits).
# ---------------------------------------------------------------------------
@query(
    "orders_by_region",
    oracle="""
    SELECT r_name, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY r_name
    """,
)
def orders_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    ).select("c_custkey", "r_name")
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "total"))
    )
