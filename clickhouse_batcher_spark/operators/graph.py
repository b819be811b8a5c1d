"""Graph analytics over the user co-activity graph: triangle counting.

Edges: user pairs active in the same hour at least
``COACT_MIN_HOURS`` distinct hours (a behavioral-affinity graph).
Triangles + wedges give the global clustering coefficient — the
standard "is this graph community-structured or random" statistic,
and the canonical distributed-join graph algorithm: with edges
oriented ``ua < ub``, every triangle a<b<c is counted exactly once
by the two-hop join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c).

Scale shape:
- the hour co-activity self-join is keyed on the hour bucket, so
  pair generation is bounded by (active users per hour)² per bucket,
  not corpus²; the pair aggregation is map-side combined.
- the triangle join is the textbook edge-edge-edge equi-join; at
  web scale you'd pre-partition edges by node with degree-based
  orientation (low-degree node first) to bound the two-hop fan-out —
  the ua<ub orientation here is its fixed-order special case.
- the edge frame is cached: it feeds the two-hop join (twice), the
  closure check, and the degree aggregation, and recomputing it
  means redoing the hour self-join (the repo's cache-before-self-join
  rule).

Determinism: counts and an integer-ratio clustering coefficient —
no floats beyond one IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.tables import load_table

COACT_MIN_HOURS = 12  # co-active hours needed for an edge


def coactivity_edges(events: DataFrame, min_hours: int = COACT_MIN_HOURS) -> DataFrame:
    """Edges (ua < ub) between users sharing >= min_hours active hours."""
    ah = events.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    a = ah.select(F.col("user_id").alias("ua"), "h")
    b = ah.select(F.col("user_id").alias("ub"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("common_hours"))
    )
    return pairs.filter(F.col("common_hours") >= min_hours).select("ua", "ub")


@query(
    "coactivity_triangle_stats",
    oracle=f"""
    WITH ah AS (
      SELECT DISTINCT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
      FROM events
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS common_hours
      FROM ah a JOIN ah b ON a.h = b.h AND a.user_id < b.user_id
      GROUP BY 1, 2
    ),
    e AS (SELECT ua, ub FROM p WHERE common_hours >= {COACT_MIN_HOURS}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT ua AS node FROM e UNION ALL SELECT ub AS node FROM e) n
      GROUP BY node
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      (SELECT CAST(count(*) AS BIGINT)
       FROM e e1 JOIN e e2 ON e1.ub = e2.ua
       JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub) AS n_triangles,
      (SELECT CAST(coalesce(sum(d * (d - 1) / 2), 0) AS BIGINT) FROM deg)
        AS n_wedges,
      CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
        THEN 3.0 * CAST((SELECT count(*)
                         FROM e e1 JOIN e e2 ON e1.ub = e2.ua
                         JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub)
                        AS DOUBLE)
             / CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS DOUBLE)
        ELSE 0.0 END AS clustering_coefficient
    """,
)
def coactivity_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph summary: edges, nodes, triangles, wedges, global
    clustering coefficient."""
    events = load_table(spark, sf_dir, "events")
    e = coactivity_edges(events).cache()

    e1 = e.select(F.col("ua").alias("a"), F.col("ub").alias("b"))
    e2 = e.select(F.col("ua").alias("b"), F.col("ub").alias("c"))
    e3 = e.select(F.col("ua").alias("a"), F.col("ub").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("ua").alias("node"))
        .unionByName(e.select(F.col("ub").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")), F.lit(0)
        ).alias("n_wedges"),
    )
    edge_stats = e.agg(F.count(F.lit(1)).alias("n_edges"))
    cc = F.when(
        F.col("n_wedges") > 0,
        F.lit(3.0)
        * F.col("n_triangles").cast("double")
        / F.col("n_wedges").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        edge_stats.crossJoin(node_stats)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "n_wedges",
            cc.alias("clustering_coefficient"),
        )
    )
