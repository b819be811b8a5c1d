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
from clickhouse_batcher_spark.operators import memo
from clickhouse_batcher_spark.tables import load_table

COACT_MIN_HOURS = 12  # co-active hours needed for an edge
# Density guard: pairing within an hour is quadratic in that hour's
# active-user count, so hyper-dense hours are capped to a
# deterministic subset before pairing (same role as the DF-capped
# shingles in dedup). An 8x-density probe measured PageRank going
# 4.9 s -> 42 s WITHOUT the cap (quadratic) and bounded with it; at
# normal densities (sf0.01/sf0.1 average ~130 users/hour) the cap
# rarely binds. Selection is by a portable multiplicative hash of
# user_id (exact integer arithmetic, identical in Spark and DuckDB),
# so the kept subset is engine-independent and stable across runs.
COACT_MAX_PER_HOUR = 256
_COACT_HASH_MULT = 2654435761  # Knuth multiplicative constant
_COACT_HASH_MOD = 4294967296
# Reduce user_id mod 2^31 BEFORE multiplying: the raw product would
# exceed int64 for user_id >~ 3.5e9, where Spark (non-ANSI) silently
# wraps but DuckDB raises out-of-range — the "engine-independent"
# kept subset would diverge exactly when it matters (ADVICE r4).
# 2^31 * 2654435761 ~= 5.7e18 < 2^63-1, so both engines compute the
# same exact integer; ids below 2^31 (all current testdata) hash
# identically to the unreduced formula, and ids colliding mod 2^31
# fall back to the deterministic user_id tiebreak.
_COACT_HASH_REDUCE = 2147483648


def coactivity_edges(events: DataFrame, min_hours: int = COACT_MIN_HOURS) -> DataFrame:
    """Edges (ua < ub) between users sharing >= min_hours active hours.

    ``ah`` is cached AND eagerly materialized because the self-join
    consumes it twice: lazily, both branches race to compute the
    subtree inside the same action before the cache is populated, so
    only an up-front materialization actually removes the duplicate
    events scan + distinct (measured at sf0.1, cache cleared between
    runs: full PageRank ~7.1 s lazy vs ~4.3 s eager). DataFrame cache
    is MEMORY_AND_DISK, so at cluster scale the (user, hour) frame
    spills rather than evicting mid-job; it is orders of magnitude
    smaller than the events it summarizes.

    Round-14 measured and REVERTED (guide §1 — keep the lesson): an
    in-row pair generator (per-hour collect_list + nested transform/
    slice combinations, the dedup doc_lists idiom) removed the
    self-join and the cache barrier but ran ~2x SLOWER end to end —
    higher-order functions evaluate interpreted, and building ~24M
    pair structs in expression-land loses badly to the JVM hash join
    that produces the same pairs inside whole-stage codegen. The
    bounded fan-out (<= 256 users/hour) keeps the join linear; the
    join stays.
    """
    from pyspark.sql.window import Window

    raw = events.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    ord_key = (
        (F.col("user_id") % F.lit(_COACT_HASH_REDUCE)) * F.lit(_COACT_HASH_MULT)
    ) % F.lit(_COACT_HASH_MOD)
    wcap = Window.partitionBy("h").orderBy(ord_key.asc(), F.col("user_id").asc())
    ah = (
        raw.withColumn("_rn", F.row_number().over(wcap))
        .filter(F.col("_rn") <= COACT_MAX_PER_HOUR)
        .drop("_rn")
        .cache()
    )
    ah.count()
    a = ah.select(F.col("user_id").alias("ua"), "h")
    b = ah.select(F.col("user_id").alias("ub"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("common_hours"))
    )
    return pairs.filter(F.col("common_hours") >= min_hours).select("ua", "ub")


# Edge memo: pagerank and the triangle census consume the IDENTICAL
# edge frame, and bench/driver runs invoke them back to back — build
# it once per (session, sf_dir) and hand out the materialized result
# (same keying discipline as dedup._MINHASH_PAIRS_MEMO). The eager
# localCheckpoint both materializes the (small, user-pair-level)
# edges and cuts the self-join lineage so every consumer's plan is a
# scan.
_EDGES_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})


def coactivity_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memo.get_or_build(
        _EDGES_MEMO, spark, sf_dir,
        lambda: coactivity_edges(load_table(spark, sf_dir, "events")),
    )


# Both-directions edge memo (round-13 optimization): PageRank, k-core,
# label propagation and assortativity each rebuilt the directed
# (src, dst) frame from the edge memo with their own .cache() +
# eager .count() — one extra job barrier AND one cache materialization
# per query, and the cache itself died at the bench loop's per-query
# clearCache. Materialize the union ONCE per (session, sf_dir) as a
# localCheckpoint (clearCache-proof, same discipline as _EDGES_MEMO);
# every iterative consumer then starts from a block scan.
_DIRECTED_MEMO: dict[tuple[str, str], DataFrame] = memo.register({})

# Target bytes per partition for the ITERATE frames (guide §2: size
# partitions to data volume, not core count). The directed edge frame
# is scanned by every iteration of PageRank / k-core / label
# propagation; AQE cannot coalesce a checkpointed RDD scan, so the
# frame is coalesced explicitly at build time from its own row count.
# At sf0.1 (~10k edges) that is ONE partition — the r13 driver's
# scaling run showed pagerank 3x FASTER at local[8] than local[32]
# because 32 near-empty iterate tasks + their barriers dominated; at
# web scale (1e11 edges) the same rule yields ~40k partitions.
_ITERATE_PARTITION_BYTES = 128 * 1024 * 1024
_EDGE_ROW_BYTES = 48  # two bigints + row overhead, conservative


def _directed_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        e = coactivity_edges_cached(spark, sf_dir)
        n = e.count()  # block-count over the materialized edge memo
        parts = max(
            1, (2 * n * _EDGE_ROW_BYTES) // _ITERATE_PARTITION_BYTES
        )
        return (
            e.select(F.col("ua").alias("src"), F.col("ub").alias("dst"))
            .unionByName(
                e.select(F.col("ub").alias("src"), F.col("ua").alias("dst"))
            )
            .coalesce(int(parts))
        )

    return memo.get_or_build(_DIRECTED_MEMO, spark, sf_dir, build)


@query(
    "coactivity_triangle_stats",
    oracle=f"""
    WITH ah0 AS (
      SELECT DISTINCT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
      FROM events
    ),
    ah AS (
      SELECT user_id, h FROM (
        SELECT user_id, h,
          row_number() OVER (PARTITION BY h
            ORDER BY ((user_id % 2147483648) * 2654435761) % 4294967296, user_id) AS rn
        FROM ah0) WHERE rn <= 256
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
    e = coactivity_edges_cached(spark, sf_dir)

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


# ---------------------------------------------------------------------------
# Fixed-point PageRank (exact integer arithmetic, unrolled iterations)
# ---------------------------------------------------------------------------
PR_SCALE = 1_000_000_000  # rank unit = 1e-9 (9 digits of PR precision)
PR_ITERS = 3              # unrolled in both engines
PR_TOPK = 20

# Shared CTE text: the co-activity edge build (ah0 -> d), used by the
# PageRank AND k-core oracles — one definition so the density cap and
# hash constants cannot drift between them.
_COACT_EDGE_SQL = f"""
    ah0 AS (
      SELECT DISTINCT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
      FROM events
    ),
    ah AS (
      SELECT user_id, h FROM (
        SELECT user_id, h,
          row_number() OVER (PARTITION BY h
            ORDER BY ((user_id % 2147483648) * 2654435761) % 4294967296, user_id) AS rn
        FROM ah0) WHERE rn <= 256
    ),
    p AS (
      SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS common_hours
      FROM ah a JOIN ah b ON a.h = b.h AND a.user_id < b.user_id
      GROUP BY 1, 2
    ),
    e AS (SELECT ua, ub FROM p WHERE common_hours >= {COACT_MIN_HOURS}),
    d AS (
      SELECT ua AS src, ub AS dst FROM e
      UNION ALL
      SELECT ub AS src, ua AS dst FROM e
    )
"""

_PR_EDGE_SQL = f"""
    {_COACT_EDGE_SQL},
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM d GROUP BY 1
    ),
    it0 AS (SELECT node, deg, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg)
"""


def _pr_iter_sql(k: int) -> str:
    return f"""
    it{k} AS (
      SELECT n.node, n.deg,
             CAST((15 * CAST({PR_SCALE} AS BIGINT)) // 100
                  + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank
      FROM deg n LEFT JOIN (
        SELECT d.dst AS node, CAST(SUM(r.rank // r.deg) AS BIGINT) AS s
        FROM d JOIN it{k - 1} r ON r.node = d.src GROUP BY 1
      ) s ON s.node = n.node
    )
    """


@query(
    "coactivity_pagerank",
    oracle=f"""
    WITH {_PR_EDGE_SQL},
    {",".join(_pr_iter_sql(k) for k in range(1, PR_ITERS + 1))},
    ranked AS (
      SELECT node, rank AS pr_score,
             row_number() OVER (ORDER BY rank DESC, node) AS pos
      FROM it{PR_ITERS}
    )
    SELECT CAST(node AS BIGINT) AS node, pr_score, CAST(pos AS BIGINT) AS pos
    FROM ranked WHERE pos <= {PR_TOPK}
    """,
)
def coactivity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PR_TOPK users by fixed-point PageRank over the co-activity
    graph.

    Float PageRank is un-oracle-able: each iteration sums
    shuffle-ordered doubles, so no two engines (or two runs) agree at
    the last ULP. The fix is fixed-point *integer* PageRank: ranks are
    bigints in units of 1/PR_SCALE; a node's contribution is
    ``rank div deg`` (truncating integer division, identical in Spark
    and DuckDB for non-negative operands); damping is
    ``(15*SCALE) div 100 + (85*sum) div 100``. Every iteration is
    exact integer math — order-independent, hash-reproducible, and the
    truncation loses at most ``deg`` rank units (1e-9 each) per node
    per round.

    Scale shape: the directed edge frame is cached (feeds the degree
    aggregation plus one join per iteration); each iteration is one
    equi-join (edges x ranks on src, a broadcast-able rank frame for
    moderate graphs, shuffle join at web scale) and one map-side
    combined groupBy(dst). Overflow headroom: 85 * n_nodes * PR_SCALE
    must stay under 2^63 => n_nodes < ~1e8 at SCALE=1e9; shrink
    PR_SCALE for larger graphs. The PR_ITERS=3 unroll is chained into
    ONE action (each iteration references the previous ranks exactly
    once, so the plan grows linearly) — the same barrier-count
    discipline as the dedup connected-components loop (cluster.py);
    larger unrolls would checkpoint every ~3 rounds.
    """
    # memoized localCheckpoint: the degree aggregation plus one join
    # per unrolled iteration all consume this frame — every consumer
    # reads materialized blocks (no per-query cache + count barrier).
    directed = _directed_edges_cached(spark, sf_dir)
    deg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # The per-node frames (deg/ranks, n_nodes rows) are tiny next to
    # the edge list; the explicit broadcast keeps the cached edge frame
    # from re-shuffling on src every iteration. The PR_ITERS=3 unroll
    # is CHAINED inside one action (round 7): each iteration references
    # the previous ranks exactly once, so the plan grows linearly, and
    # dropping the per-iteration eager localCheckpoint removes 3 job
    # barriers (measured at sf0.1 under identical load: 8.2-12.6 s ->
    # 5.1-5.5 s, bit-identical output — the barrier cost, not the
    # 3-deep plan, dominated). For a large iteration count, insert a
    # localCheckpoint every ~3 rounds like cluster.py; web-scale graphs
    # (>~1e7 nodes) drop the broadcast hint (shuffle join) and use a
    # reliable checkpoint dir.
    nodes = deg.select(F.col("src").alias("node"), "deg").cache()
    ranks = nodes.select(
        "node", "deg", F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = directed.join(
            F.broadcast(
                ranks.select(F.col("node").alias("src"), "rank", "deg")
            ),
            "src",
        ).select("dst", F.expr("rank div deg").alias("c"))
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(
                F.broadcast(summed), nodes["node"] == summed["dst"], "left"
            )
            .select(
                "node",
                "deg",
                (
                    F.lit((15 * PR_SCALE) // 100)
                    + F.expr("(85 * COALESCE(s, 0)) div 100")
                ).cast("bigint").alias("rank"),
            )
        )
    from pyspark.sql import Window

    # Top-k FIRST via orderBy().limit() (TakeOrderedAndProject:
    # per-partition heaps, no global sort), THEN number the <=k
    # surviving rows — the single-partition window never sees more
    # than PR_TOPK rows, so this holds at any node count (the r3
    # verdict flagged the old rank-everything-then-filter shape as
    # single-partitioning n_nodes rows).
    top = (
        ranks.select(
            F.col("node").cast("bigint").alias("node"),
            F.col("rank").alias("pr_score"),
        )
        .orderBy(F.col("pr_score").desc(), F.col("node"))
        .limit(PR_TOPK)
    )
    w = Window.orderBy(F.col("pr_score").desc(), F.col("node"))
    return top.withColumn("pos", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# Market-basket association mining (round-5 third session): support /
# confidence / lift for part pairs co-occurring in an order — the
# classic retail association rule surface. The pair generation is a
# per-order self-join; its blowup is bounded by the lineitem count
# per order (TPC-H: <= 7, so <= 21 pairs/order) — the same
# bounded-pairing argument as the coactivity graph, no density cap
# needed. Marginals broadcast back; only pairs above MIN_PAIR_SUPPORT
# survive to the lift ranking.
# ---------------------------------------------------------------------------

MIN_PAIR_SUPPORT = 3
BASKET_TOP_K = 20


@query(
    "part_copurchase_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
      FROM lineitem
    ), n_orders AS (
      SELECT COUNT(DISTINCT okey) AS n FROM items
    ), marg AS (
      SELECT part, COUNT(*) AS cnt FROM items GROUP BY part
    ), pairs AS (
      SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS together
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.part < b.part
      GROUP BY 1, 2
      HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ), scored AS (
      SELECT part_a, part_b, together,
        CAST(ma.cnt AS BIGINT) AS cnt_a, CAST(mb.cnt AS BIGINT) AS cnt_b,
        round(CAST(together AS DOUBLE) * n
              / (CAST(ma.cnt AS DOUBLE) * mb.cnt), 6) AS lift,
        round(CAST(together AS DOUBLE) / ma.cnt, 6) AS conf_a_to_b
      FROM pairs
      JOIN marg ma ON ma.part = part_a
      JOIN marg mb ON mb.part = part_b
      CROSS JOIN n_orders
    )
    SELECT * FROM scored
    ORDER BY lift DESC, together DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
)
def part_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BASKET_TOP_K} part pairs by lift (co-purchase rate vs the
    independence baseline), with support and A->B confidence — the
    association-rule primitive behind "frequently bought together".

    DISTINCT (order, part) first so line-level duplicates don't
    inflate support; the pair self-join is per-order-bounded; the
    total-order sort key (lift, together, part_a, part_b) makes the
    top-k hash-stable.
    """
    # NOT cached (round-13 measured): AQE's ReusedExchange already
    # dedupes the distinct across the four consumers; an explicit
    # cache measured neutral-to-slower (the round-10 persist-campaign
    # lesson — static plan counts overstate recompute).
    # Round-14 (guide §2.4, §5): per-order baskets are gathered ONCE
    # (collect_set bounded by lineitems-per-order, <= 7 in TPC-H), the
    # i<j pairs come from the sorted basket array in-row (tiny arrays —
    # unlike the coactivity 256-wide case this beats the self-join's
    # two shuffles), and the order count rides the same aggregate as a
    # 1-row broadcast instead of the former driver-side .count() action
    # that executed — and threw away — the whole distinct subtree
    # before the real query even started.
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    baskets = items.groupBy("okey").agg(
        F.sort_array(F.collect_list("part")).alias("parts")
    )
    n_orders = baskets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    marg = items.groupBy("part").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts) - i - 1),"
                    "           y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together"))
        .filter(F.col("together") >= MIN_PAIR_SUPPORT)
    )
    ma = marg.select(F.col("part").alias("pa"), F.col("cnt").alias("cnt_a"))
    mb = marg.select(F.col("part").alias("pb"), F.col("cnt").alias("cnt_b"))
    scored = (
        pairs.join(ma, F.col("part_a") == F.col("pa"))
        .join(mb, F.col("part_b") == F.col("pb"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "together",
            F.col("cnt_a").cast("bigint").alias("cnt_a"),
            F.col("cnt_b").cast("bigint").alias("cnt_b"),
            F.round(
                F.col("together").cast("double")
                * F.col("n_orders")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
            F.round(
                F.col("together").cast("double") / F.col("cnt_a"), 6
            ).alias("conf_a_to_b"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.desc("together"), "part_a", "part_b"
    ).limit(BASKET_TOP_K)


# ---------------------------------------------------------------------------
# k-core peeling (round-8): the densest-region extractor next to the
# triangle census and PageRank — the standard graph-cleaning step for
# spam/bot clusters (nodes surviving a k-core are mutually, not just
# individually, well-connected). Exact full decomposition needs a
# data-dependent number of rounds; the engine operator fixes the
# round count (KCORE_ROUNDS synchronous peels — Matula/Beck's
# algorithm truncated), which makes the semantics a pure function of
# the data that BOTH engines unroll identically, hash-oracle
# included — the PageRank fixed-iteration pattern. The parity test
# additionally asserts the fixture CONVERGED within the unroll (one
# more peel removes nothing), so at test scale the output IS the
# exact k-core.
#
# Scale shape: each peel is one semi-join of the cached edge frame
# against the surviving-node frame (both endpoints) + one map-side-
# combinable degree count. Node frames are broadcast here (bounded
# graphs); web-scale graphs drop the hint and take keyed shuffles.
# Lineage is cut every 3 peels via the CC loop's checkpoint helper.
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 6
# Node frames at or below this row count broadcast in the peel joins
# (~5M bigint ids ≈ 40 MB serialized — comfortable executor memory);
# above it the hints drop and the peels run as keyed shuffle joins.
# Gated by ONE count of the first peel's survivors (peeling is
# monotone decreasing, so that count bounds every later round).
KCORE_BROADCAST_MAX_NODES = 5_000_000


def _kcore_iter_sql(r: int, k: int) -> str:
    prev = "d" if r == 1 else f"kc{r - 1}"
    inner = (
        "d"
        if r == 1
        else f"""(
          SELECT d.src, d.dst FROM d
          JOIN kc{r - 1} a ON d.src = a.node
          JOIN kc{r - 1} b ON d.dst = b.node
        ) d"""
    )
    return f"""
    kc{r} AS (
      SELECT d.src AS node FROM {inner}
      GROUP BY d.src HAVING count(*) >= {k}
    )
    """


@query(
    "coactivity_kcore",
    oracle=f"""
    WITH {_COACT_EDGE_SQL},
    {",".join(_kcore_iter_sql(r, KCORE_K) for r in range(1, KCORE_ROUNDS + 1))},
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS total_deg
      FROM d GROUP BY 1
    ),
    core AS (
      SELECT d.src AS node, CAST(count(*) AS BIGINT) AS core_deg
      FROM d
      JOIN kc{KCORE_ROUNDS} a ON d.src = a.node
      JOIN kc{KCORE_ROUNDS} b ON d.dst = b.node
      GROUP BY 1
    )
    SELECT CAST(core.node AS BIGINT) AS node, deg.total_deg, core.core_deg
    FROM core JOIN deg ON deg.node = core.node
    """,
)
def coactivity_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users surviving KCORE_ROUNDS synchronous k=KCORE_K peels of the
    co-activity graph, with their total and in-core degrees.

    Every surviving node has >= KCORE_K surviving neighbors, so
    core_deg >= KCORE_K >= (some nodes') pre-peel shortfall — the
    membership a per-node degree filter gets wrong (degree >= k does
    NOT imply k-core membership; peeling cascades)."""
    from clickhouse_batcher_spark.operators.cluster import _cut_lineage

    # memoized localCheckpoint: consumed by every peel + both degree
    # aggs — a block scan, no per-query cache + count barrier
    directed = _directed_edges_cached(spark, sf_dir)

    def surviving(edges: DataFrame) -> DataFrame:
        return (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select(F.col("src").alias("node"))
        )

    # Broadcast gate (round-9): the node-frame hints are only correct
    # while the surviving set fits an executor. Peeling is MONOTONE
    # decreasing, so one count of the first peel's survivors soundly
    # gates every later round; above the threshold the hints drop and
    # the peels run as shuffle joins (AQE may still re-plan small
    # sides at runtime).
    rem = surviving(directed)
    bcast = rem.count() <= KCORE_BROADCAST_MAX_NODES

    def hint(nodes: DataFrame) -> DataFrame:
        return F.broadcast(nodes) if bcast else nodes

    def within(nodes: DataFrame) -> DataFrame:
        return directed.join(
            hint(nodes.select(F.col("node").alias("src"))), "src"
        ).join(
            hint(nodes.select(F.col("node").alias("dst"))), "dst"
        )

    # Each peel counts, for EVERY node, its neighbors inside the
    # surviving set, then keeps count >= k — the "src is itself
    # surviving" test is provably redundant in synchronous peeling:
    # rem_t = f(rem_{t-1}) is monotone and decreasing, so a node
    # dropped at round s has |nb ∩ rem_{t-1}| <= |nb ∩ rem_{s-1}| < k
    # for every t > s and can never requalify. One join + one
    # aggregate per round (not two joins), and rem is referenced
    # ONCE, so the chained plan grows linearly like the PageRank
    # unroll (lineage still cut every 3 rounds as loop discipline).
    def next_rem(nodes: DataFrame) -> DataFrame:
        return surviving(
            directed.join(
                hint(nodes.select(F.col("node").alias("dst"))),
                "dst",
            )
        )

    for r in range(2, KCORE_ROUNDS + 1):
        rem = next_rem(rem)
        # the r == KCORE_ROUNDS cut is NOT wasted: within(rem)
        # references rem twice (src + dst semi-joins), so the final
        # action would otherwise compute the 3-round chained plan
        # twice — once per broadcast build
        if r % 3 == 0:
            rem = _cut_lineage(rem)
    core = (
        within(rem)
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        .select(F.col("src").alias("node"), "core_deg")
    )
    deg = directed.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_deg")
    )
    return (
        core.join(deg, core["node"] == deg["src"])
        .select(
            F.col("node").cast("bigint").alias("node"),
            "total_deg",
            "core_deg",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic synchronous label propagation (community detection)
# ---------------------------------------------------------------------------
LP_ROUNDS = 4


def _lp_iter_sql(r: int) -> str:
    """One synchronous LP round as a CTE pair: per (node, neighbor
    label) counts, then argmax with the deterministic
    (count DESC, label ASC) tiebreak."""
    prev = f"lp{r - 1}"
    return f"""
    cnt{r} AS (
      SELECT d.src AS node, p.label, COUNT(*) AS c
      FROM d JOIN {prev} p ON p.node = d.dst
      GROUP BY 1, 2
    ),
    lp{r} AS (
      SELECT node, label FROM (
        SELECT node, label,
          row_number() OVER (PARTITION BY node
                             ORDER BY c DESC, label) AS rn
        FROM cnt{r}) x WHERE rn = 1
    )"""


@query(
    "coactivity_label_propagation",
    oracle=f"""
    WITH {_COACT_EDGE_SQL},
    lp0 AS (SELECT DISTINCT src AS node, src AS label FROM d),
    {",".join(_lp_iter_sql(r) for r in range(1, LP_ROUNDS + 1))}
    SELECT CAST(label AS BIGINT) AS community,
      CAST(COUNT(*) AS BIGINT) AS n_members,
      CAST(MIN(node) AS BIGINT) AS min_node,
      CAST(MAX(node) AS BIGINT) AS max_node
    FROM lp{LP_ROUNDS} GROUP BY label
    """,
)
def coactivity_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community sizes after LP_ROUNDS rounds of SYNCHRONOUS label
    propagation over the co-activity graph (Raghavan et al. 2007,
    made deterministic: every node simultaneously adopts its
    neighborhood's most frequent label, ties broken by the SMALLER
    label — no randomness, no update-order dependence, so the result
    is engine-exact and oracle-checkable, unlike classic async LPA).

    Fixed-round unroll, one join + one argmax aggregate per round over
    the cached edge frame — the same chained-plan discipline as the
    PageRank/k-core loops (lineage cut every 3 rounds). Labels move as
    (node, label) pairs only."""
    from pyspark.sql.window import Window

    from clickhouse_batcher_spark.operators.cluster import _cut_lineage

    directed = _directed_edges_cached(spark, sf_dir)
    labels = directed.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("src").orderBy(F.desc("c"), F.asc("label"))
    for r in range(1, LP_ROUNDS + 1):
        cnt = (
            directed.join(
                labels.select(
                    F.col("node").alias("dst"), "label"
                ),
                "dst",
            )
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "label")
        )
        if r % 3 == 0:
            labels = _cut_lineage(labels)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
    ).select(
        F.col("label").cast("bigint").alias("community"),
        "n_members",
        "min_node",
        "max_node",
    )


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002): Pearson r of endpoint degrees
# ---------------------------------------------------------------------------
@query(
    "coactivity_assortativity",
    oracle=f"""
    WITH {_COACT_EDGE_SQL},
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS k FROM d GROUP BY 1
    ),
    de AS (
      SELECT CAST(ka.k AS DECIMAL(38,0)) AS x,
             CAST(kb.k AS DECIMAL(38,0)) AS y
      FROM d
      JOIN deg ka ON ka.node = d.src
      JOIN deg kb ON kb.node = d.dst
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS m,
        SUM(x) AS sx, SUM(y) AS sy,
        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM de
    )
    SELECT CAST(m AS BIGINT) AS n_directed_edges,
      CASE WHEN (m * sxx - sx * sx) > 0 AND (m * syy - sy * sy) > 0
        THEN round(CAST(m * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                          * CAST(m * syy - sy * sy AS DOUBLE)), 6)
        ELSE 0.0 END AS assortativity
    FROM m
    """,
)
def coactivity_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-activity graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the directed edge
    list — positive = hubs link to hubs (social-graph shape), negative
    = hub-and-spoke. The one-number structural diagnostic next to the
    clustering coefficient, and an input to the salting/broadcast
    decisions skewed graphs force.

    Exactness: degree moments accumulate as DECIMAL(38,0) (order-
    independent, overflow-safe to ~1e9-degree graphs), and the final
    Pearson is ONE double expression over identical exact integers,
    rounded to 6. Plan: two keyed joins of the degree table onto the
    edge list + one combinable moment aggregate."""
    directed = _directed_edges_cached(spark, sf_dir)
    deg = directed.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    ).select(F.col("src").alias("node"), "k")
    de = (
        directed.join(deg.select(F.col("node").alias("src"), F.col("k").alias("xk")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("k").alias("yk")), "dst")
        .select(
            F.col("xk").cast("decimal(38,0)").alias("x"),
            F.col("yk").cast("decimal(38,0)").alias("y"),
        )
    )
    m = de.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    varx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.round(
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / F.sqrt(varx.cast("double") * vary.cast("double")),
        6,
    )
    # zero degree variance (regular graph / too-small fixture) leaves
    # Pearson undefined — emit 0.0 by convention on both engines
    return m.select(
        F.col("m").cast("bigint").alias("n_directed_edges"),
        F.when((varx > 0) & (vary > 0), r)
        .otherwise(F.lit(0.0))
        .alias("assortativity"),
    )
