"""Count-Min sketch: sublinear-memory frequency estimation.

The streaming-friendly heavy-hitter sketch: d hash rows x w buckets of
counters; an item's estimate is the MIN over its d bucket counters —
always an overestimate, bounded by collisions. At 100 TB the sketch
(d*w counters per partition, merged by addition) replaces a
full-cardinality groupBy when only heavy hitters matter; here the
sketch is built relationally (a (salt, bucket) groupBy whose result
IS the merged sketch — Spark's partial aggregation does the per-
partition sketching automatically).

Hashing is the engine-portable SHA-prefix arithmetic, so the entire
sketch — build AND query — is reproduced exactly by the DuckDB oracle:
estimates are deterministic integers, not approximations-with-noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import tokens
from clickhouse_batcher_spark.tables import load_table

CMS_DEPTH = 4    # hash rows
CMS_WIDTH = 64   # buckets per row


def _bucket(col: Column, salt: str) -> Column:
    return (
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(salt), col), 256), 1, 4), 16, 10
        ).cast("bigint")
        % CMS_WIDTH
    )


def _sql_bucket(expr: str, salt: str) -> str:
    h = f"substring(sha256('{salt}' || {expr}), 1, 4)"
    digit = lambda i: f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    val = " + ".join(f"{digit(i)} * {16 ** (4 - i)}" for i in range(1, 5))
    return f"(({val}) % {CMS_WIDTH})"


@query(
    "token_count_min_sketch",
    oracle=f"""
    WITH hist AS (
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t <> '')) AS tok
            FROM documents) u
      GROUP BY tok
    ),
    est AS (
      SELECT a.tok,
        least({", ".join(
            f"(SELECT CAST(SUM(b.cnt) AS BIGINT) FROM hist b"
            f" WHERE {_sql_bucket('b.tok', f'{i:02d}|')}"
            f" = {_sql_bucket('a.tok', f'{i:02d}|')})"
            for i in range(CMS_DEPTH)
        )}) AS cms_estimate
      FROM hist a
    )
    SELECT h.tok, h.cnt AS exact_cnt, e.cms_estimate
    FROM hist h JOIN est e ON e.tok = h.tok
    """,
)
def token_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token counts next to their CMS estimates (est >= exact,
    equal when the item's buckets are collision-free)."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    estimates = []
    for i in range(CMS_DEPTH):
        salt = f"{i:02d}|"
        # merged sketch row i: bucket -> total count (this IS the CMS row)
        row = hist.groupBy(_bucket(F.col("tok"), salt).alias("bucket")).agg(
            F.sum("cnt").alias(f"row_cnt_{i}")
        )
        estimates.append(
            hist.select(
                "tok", _bucket(F.col("tok"), salt).alias("bucket")
            ).join(F.broadcast(row), "bucket").select("tok", f"row_cnt_{i}")
        )
    est = estimates[0]
    for other in estimates[1:]:
        est = est.join(other, "tok")
    cms = F.least(*[F.col(f"row_cnt_{i}") for i in range(CMS_DEPTH)]).cast("bigint")
    return (
        hist.join(est, "tok")
        .select("tok", F.col("cnt").alias("exact_cnt"), cms.alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch: fixed-width bin counts per group, with
# quantiles read off the cumulative histogram. The mergeable-quantile
# design for streams and 100-TB scans: per-partition (group, bin)
# counts merge by addition (Spark's partial aggregation does it
# map-side), the shuffle moves only |groups| x |bins| rows, and the
# estimate is deterministic — unlike t-digest/GK sketches whose
# estimates depend on merge order, every engine computing this
# histogram reads the same quantile edges. Bin-width error is bounded
# by construction (est in [true - W, true]).
# ---------------------------------------------------------------------------
HIST_BIN_WIDTH = 10.0
HIST_QS = (0.5, 0.9, 0.99)


def _sql_hist_q(q: float) -> str:
    pct = int(q * 100)
    return (
        f"CAST(MIN(CASE WHEN cum >= ceil({q} * n) THEN bin END)"
        f" * {HIST_BIN_WIDTH} AS DOUBLE) AS q{pct}_est"
    )


@query(
    "value_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin
      FROM events
    ), c AS (
      SELECT event_type, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2
    ), cc AS (
      SELECT event_type, bin,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           {", ".join(_sql_hist_q(q) for q in HIST_QS)}
    FROM cc GROUP BY event_type
    """,
)
def value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: q50/q90/q99 of ``value`` estimated from a
    fixed-width cumulative histogram (estimate = lower edge of the
    first bin whose cumulative count reaches ceil(q*n))."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    c = (
        events.select(
            "event_type",
            F.floor(F.col("value") / HIST_BIN_WIDTH).cast("bigint").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cc = c.select(
        "event_type",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    q_cols = [
        (
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bin")
                )
            )
            * HIST_BIN_WIDTH
        )
        .cast("double")
        .alias(f"q{int(q * 100)}_est")
        for q in HIST_QS
    ]
    return cc.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"), *q_cols
    )


# ---------------------------------------------------------------------------
# Linear-counting distinct sketch (deterministic, hence fully oracled)
# ---------------------------------------------------------------------------
LC_BITS = 4096              # sketch size m (128 x 32-bit words)
LC_WORD_BITS = 32           # bits per word (masks exact via pow(2, b))


def _lc_pos(col: Column, salt: str = "lc|") -> Column:
    """Bit position in [0, LC_BITS): 16 hash bits fold evenly (65536
    is a multiple of LC_BITS) via the engine-portable SHA prefix."""
    return (
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(salt), col), 256), 1, 4), 16, 10
        ).cast("bigint")
        % LC_BITS
    )


def _sql_lc_pos(expr: str, salt: str = "lc|") -> str:
    h = f"substring(sha256('{salt}' || {expr}), 1, 4)"
    digit = lambda i: f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    val = " + ".join(f"{digit(i)} * {16 ** (4 - i)}" for i in range(1, 5))
    return f"(({val}) % {LC_BITS})"


@query(
    "distinct_users_linear_count",
    oracle=f"""
    WITH coords AS (
      SELECT event_type, {_sql_lc_pos("CAST(user_id AS VARCHAR)")} AS pos
      FROM events
    ),
    words AS (
      SELECT event_type, pos // {LC_WORD_BITS} AS word,
             bit_or(CAST(pow(2, pos % {LC_WORD_BITS}) AS BIGINT)) AS bits
      FROM coords GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_set_bits
      FROM words GROUP BY 1
    )
    SELECT event_type, n_set_bits,
           round(-{LC_BITS}.0 * ln(({LC_BITS}.0 - n_set_bits) / {LC_BITS}.0),
                 6) AS est_distinct
    FROM s
    """,
)
def distinct_users_linear_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate by linear counting.

    The classic Whang et al. load-factor estimator: every occurrence
    sets bit ``h(user) % m``; duplicates collapse in the map-side
    partial ``bit_or``, so — unlike ``COUNT(DISTINCT)`` — NO distinct
    shuffle of the key universe happens. Only (event_type x m/32)
    bitmap words cross the wire, regardless of row count: the whole
    point at 100 TB, and the mergeability story is the same as the
    count-min sketch above (bit_or is the merge).

    Deterministic (SHA positions), so the estimate itself is
    reproduced bit-for-bit by the DuckDB oracle; accuracy vs the true
    count is asserted in pytest (est within a few % at this load).
    ``est = -m * ln(V)`` where V is the zero-bit fraction; ln rounded
    to 6 per the repo transcendental convention.
    """
    events = load_table(spark, sf_dir, "events")
    pos = _lc_pos(F.col("user_id").cast("string"))
    coords = events.select(
        "event_type",
        F.floor(pos / LC_WORD_BITS).cast("int").alias("word"),
        F.pow(F.lit(2.0), (pos % LC_WORD_BITS).cast("double"))
        .cast("long")
        .alias("mask"),
    )
    words = coords.groupBy("event_type", "word").agg(
        F.bit_or("mask").alias("bits")
    )
    s = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_set_bits")
    )
    est = F.round(
        F.lit(-float(LC_BITS))
        * F.log(
            (F.lit(float(LC_BITS)) - F.col("n_set_bits").cast("double"))
            / F.lit(float(LC_BITS))
        ),
        6,
    )
    return s.select("event_type", "n_set_bits", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# Sliding-window distinct estimate (sketch x window composition)
# ---------------------------------------------------------------------------
LC_WINDOW_HOURS = 6  # sliding window length (hop = 1 hour)


@query(
    "sliding_distinct_users",
    oracle=f"""
    WITH hours AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             {_sql_lc_pos("CAST(user_id AS VARCHAR)")} AS pos
      FROM events
    ),
    covered AS (
      SELECT h - to_hours(off) AS window_start, pos
      FROM hours, unnest(generate_series(0, {LC_WINDOW_HOURS - 1})) AS t(off)
    ),
    words AS (
      SELECT window_start, pos // {LC_WORD_BITS} AS word,
             bit_or(CAST(pow(2, pos % {LC_WORD_BITS}) AS BIGINT)) AS bits
      FROM covered GROUP BY 1, 2
    ),
    s AS (
      SELECT window_start, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_set_bits
      FROM words GROUP BY 1
    )
    SELECT window_start, n_set_bits,
           round(-{LC_BITS}.0 * ln(({LC_BITS}.0 - n_set_bits) / {LC_BITS}.0),
                 6) AS est_distinct
    FROM s
    """,
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate per 6-hour sliding window (1-hour hop).

    Sliding distinct counts are THE painful streaming aggregate:
    exact answers need per-window user sets (memory ~ windows x
    users) because distinct does not decompose over overlapping
    windows. The sketch composition sidesteps it: each event explodes
    into the LC_WINDOW_HOURS windows covering it (bounded constant
    fan-out), duplicates collapse in the map-side partial ``bit_or``,
    and only (window x m/32) bitmap words shuffle — the identical
    plan Structured Streaming would run incrementally, since bit_or
    states merge across micro-batches like every sketch in this
    module.
    """
    events = load_table(spark, sf_dir, "events")
    pos = _lc_pos(F.col("user_id").cast("string"))
    hours = events.select(
        F.date_trunc("hour", "ts").alias("h"), pos.alias("pos")
    )
    covered = (
        hours.select(
            "h",
            "pos",
            F.explode(
                F.sequence(F.lit(0), F.lit(LC_WINDOW_HOURS - 1))
            ).alias("off"),
        )
        .select(
            (F.col("h") - F.make_dt_interval(hours=F.col("off"))).alias(
                "window_start"
            ),
            "pos",
        )
    )
    words = covered.select(
        "window_start",
        F.floor(F.col("pos") / LC_WORD_BITS).cast("int").alias("word"),
        F.pow(F.lit(2.0), (F.col("pos") % LC_WORD_BITS).cast("double"))
        .cast("long")
        .alias("mask"),
    ).groupBy("window_start", "word").agg(F.bit_or("mask").alias("bits"))
    s = words.groupBy("window_start").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_set_bits")
    )
    est = F.round(
        F.lit(-float(LC_BITS))
        * F.log(
            (F.lit(float(LC_BITS)) - F.col("n_set_bits").cast("double"))
            / F.lit(float(LC_BITS))
        ),
        6,
    )
    return s.select("window_start", "n_set_bits", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# Sketch set algebra: pairwise distinct-user overlap between event types
# ---------------------------------------------------------------------------
_LC_EST = (
    f"-{LC_BITS}.0 * ln(({LC_BITS}.0 - {{k}}) / {LC_BITS}.0)"
)


def _lc_est_col(k) -> "Column":
    return F.lit(-float(LC_BITS)) * F.log(
        (F.lit(float(LC_BITS)) - k.cast("double")) / F.lit(float(LC_BITS))
    )


@query(
    "distinct_users_type_overlap",
    oracle=f"""
    WITH coords AS (
      SELECT event_type, {_sql_lc_pos("CAST(user_id AS VARCHAR)")} AS pos
      FROM events
    ),
    words AS (
      SELECT event_type, pos // {LC_WORD_BITS} AS word,
             bit_or(CAST(pow(2, pos % {LC_WORD_BITS}) AS BIGINT)) AS bits
      FROM coords GROUP BY 1, 2
    ),
    k AS (
      SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS k
      FROM words GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.k AS ka, b.k AS kb
      FROM k a JOIN k b ON a.event_type < b.event_type
    ),
    members AS (
      SELECT type_a, type_b, type_a AS event_type FROM pairs
      UNION ALL
      SELECT type_a, type_b, type_b AS event_type FROM pairs
    ),
    uw AS (
      SELECT m.type_a, m.type_b, w.word, bit_or(w.bits) AS bits
      FROM members m JOIN words w ON w.event_type = m.event_type
      GROUP BY 1, 2, 3
    ),
    u AS (
      SELECT type_a, type_b, CAST(SUM(bit_count(bits)) AS BIGINT) AS ku
      FROM uw GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.ka AS bits_a, p.kb AS bits_b,
           u.ku AS bits_union,
           round(greatest(0.0, ({_LC_EST.format(k="p.ka")})
                               + ({_LC_EST.format(k="p.kb")})
                               - ({_LC_EST.format(k="u.ku")})), 6)
             AS est_intersection,
           CASE WHEN u.ku > 0 THEN
             round(greatest(0.0, ({_LC_EST.format(k="p.ka")})
                                 + ({_LC_EST.format(k="p.kb")})
                                 - ({_LC_EST.format(k="u.ku")}))
                   / ({_LC_EST.format(k="u.ku")}), 6)
           ELSE 0.0 END AS est_jaccard
    FROM pairs p
    JOIN u ON u.type_a = p.type_a AND u.type_b = p.type_b
    """,
)
def distinct_users_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct-user intersection / Jaccard for every
    event-type pair, by linear-count inclusion-exclusion.

    The sketch-algebra payoff: exact pairwise overlap needs either a
    |types|²-way COUNT(DISTINCT) or a self-join of the (type, user)
    frame — both reshuffle the user universe. Here each type's m-bit
    bitmap is built once (map-side bit_or, m/32 words per type on the
    wire), pairwise union is a bit_or of two bitmaps, and
    |A ∩ B| ≈ est(ka) + est(kb) - est(ku) — the standard
    inclusion-exclusion over load-factor estimates (Whang et al.;
    same algebra as theta-sketch intersection). Accuracy vs the exact
    overlap is asserted in pytest; the estimate itself is
    deterministic (SHA positions) and reproduced bit-for-bit by the
    oracle, ln terms rounded to 6 per the repo convention.

    The type-pair enumeration is a self-join of the per-type count
    frame — bounded by the event-type vocabulary, broadcast by
    construction (BNLJ-whitelisted in tests/test_plans.py).
    """
    events = load_table(spark, sf_dir, "events")
    pos = _lc_pos(F.col("user_id").cast("string"))
    coords = events.select(
        "event_type",
        F.floor(pos / LC_WORD_BITS).cast("int").alias("word"),
        F.pow(F.lit(2.0), (pos % LC_WORD_BITS).cast("double"))
        .cast("long")
        .alias("mask"),
    )
    words = coords.groupBy("event_type", "word").agg(
        F.bit_or("mask").alias("bits")
    )
    words = words.cache()  # feeds per-type counts AND pair unions
    k = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("k")
    )
    ka = k.select(F.col("event_type").alias("type_a"), F.col("k").alias("ka"))
    kb = k.select(F.col("event_type").alias("type_b"), F.col("k").alias("kb"))
    pairs = ka.join(kb, F.col("type_a") < F.col("type_b"))
    members = pairs.select(
        "type_a",
        "type_b",
        F.explode(F.array("type_a", "type_b")).alias("event_type"),
    )
    uw = (
        F.broadcast(members)
        .join(words, "event_type")
        .groupBy("type_a", "type_b", "word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    u = uw.groupBy("type_a", "type_b").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("ku")
    )
    j = pairs.join(u, ["type_a", "type_b"])
    raw_i = (
        _lc_est_col(F.col("ka"))
        + _lc_est_col(F.col("kb"))
        - _lc_est_col(F.col("ku"))
    )
    est_i = F.round(F.greatest(F.lit(0.0), raw_i), 6)
    est_j = F.when(
        F.col("ku") > 0,
        F.round(
            F.greatest(F.lit(0.0), raw_i) / _lc_est_col(F.col("ku")), 6
        ),
    ).otherwise(F.lit(0.0))
    return j.select(
        "type_a",
        "type_b",
        F.col("ka").alias("bits_a"),
        F.col("kb").alias("bits_b"),
        F.col("ku").alias("bits_union"),
        est_i.alias("est_intersection"),
        est_j.alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (round-5): the industry-standard
# cardinality estimator (ClickHouse uniq/uniqHLL12 family), built so
# the ENTIRE sketch is engine-portable and the oracle is hash-exact
# (a Spark-internal HLL++ estimate could only be rows-only checked;
# such a query was superseded by this one and deleted in round 6).
#
# Portability recipe (same spirit as the Count-Min sketch above):
# - item hash = 60-bit SHA-prefix integer (portable_hash64 semantics);
# - register = low 8 bits, rho = leading-zero rank of the remaining
#   52 bits computed via the exact string length of bin(w) — integer/
#   string ops only, no log2;
# - the harmonic sum is kept in INTEGERS: sum of 2^(53 - Mj) scaled
#   terms (each a power of two <= 2^52, total <= 2^61 — fits BIGINT
#   exactly in both engines), missing registers contributing 2^53;
# - the only doubles are one cast of that exact integer and one
#   division by an embedded literal constant (alpha * m^2 * 2^53
#   precomputed in Python so neither engine's decimal-literal
#   arithmetic can diverge), plus the standard small-range
#   linear-counting branch whose ln() is rounded to 6 (the repo's
#   transcendental convention).
#
# Scale shape: groupBy (group, register) max(rho) IS the mergeable
# sketch — map-side partials are per-partition HLLs, the reduce is
# register-wise max, and the final estimate reads 256 rows per group.
# The exact countDistinct column exists for the accuracy contract at
# test scale; a 100-TB deployment drops it and keeps the sketch.
# ---------------------------------------------------------------------------
HLL_REGISTERS = 256  # m = 2^8
_HLL_ALPHA_M2_2P53 = "4.2399330249068963e+20"  # alpha_256 * 256^2 * 2^53
_HLL_SMALL_RANGE = 2.5 * HLL_REGISTERS


@query(
    "hll_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substr(sha256('hll:' || user_id::VARCHAR), 1, 15))
                  AS BIGINT) AS hash
      FROM events
    ), regs AS (
      SELECT event_type, hash % {HLL_REGISTERS} AS register,
             MAX(CASE WHEN hash // {HLL_REGISTERS} = 0 THEN 53
                      ELSE 53 - length(bin(hash // {HLL_REGISTERS})) END)
               AS mj
      FROM h GROUP BY 1, 2
    ), agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS registers_hit,
             CAST(SUM(1::BIGINT << (53 - mj)) AS BIGINT) AS s_obs
      FROM regs GROUP BY 1
    ), est AS (
      SELECT event_type, registers_hit,
             s_obs + ({HLL_REGISTERS} - registers_hit)
                     * (1::BIGINT << 53) AS s_scaled
      FROM agg
    ), ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT e.event_type, e.registers_hit, e.s_scaled,
           CASE WHEN {_HLL_ALPHA_M2_2P53} / CAST(e.s_scaled AS DOUBLE)
                     <= {_HLL_SMALL_RANGE}
                 AND e.registers_hit < {HLL_REGISTERS}
                THEN round({HLL_REGISTERS}.0
                           * ln({HLL_REGISTERS}.0
                                / ({HLL_REGISTERS} - e.registers_hit)), 6)
                ELSE {_HLL_ALPHA_M2_2P53} / CAST(e.s_scaled AS DOUBLE)
           END AS hll_estimate,
           ex.exact_distinct
    FROM est e JOIN ex USING (event_type)
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL cardinality estimate next to the exact
    count: (event_type, registers_hit, s_scaled, hll_estimate,
    exact_distinct)."""
    events = load_table(spark, sf_dir, "events")
    m = HLL_REGISTERS
    h = events.select(
        "event_type",
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit("hll:"), F.col("user_id").cast("string")), 256),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hash"),
    )
    regs = (
        h.select(
            "event_type",
            (F.col("hash") % m).alias("register"),
            F.expr(
                "CASE WHEN hash div 256 = 0 THEN 53 "
                "ELSE 53 - length(bin(hash div 256)) END"
            ).alias("rho"),
        )
        .groupBy("event_type", "register")
        .agg(F.max("rho").alias("mj"))
    )
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("registers_hit"),
        F.sum(F.expr("shiftleft(1L, cast(53 - mj AS INT))"))
        .cast("bigint")
        .alias("s_obs"),
    )
    est = agg.select(
        "event_type",
        "registers_hit",
        (
            F.col("s_obs")
            + (F.lit(m) - F.col("registers_hit")) * F.lit(1 << 53)
        ).alias("s_scaled"),
    )
    ex = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    raw = F.lit(float(_HLL_ALPHA_M2_2P53)) / F.col("s_scaled").cast("double")
    small = (raw <= F.lit(_HLL_SMALL_RANGE)) & (
        F.col("registers_hit") < F.lit(m)
    )
    lin = F.round(
        F.lit(float(m))
        * F.log(F.lit(float(m)) / (F.lit(m) - F.col("registers_hit"))),
        6,
    )
    return est.join(ex, "event_type").select(
        "event_type",
        "registers_hit",
        "s_scaled",
        F.when(small, lin).otherwise(raw).alias("hll_estimate"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Heavy hitters from the sketch (ClickHouse topK() analogue): rank by
# CMS estimate instead of an exact full-cardinality groupBy. In this
# oracled form the exact histogram still exists (it feeds the
# estimate-vs-exact columns); the 100-TB deployment keeps only the
# d x w counter sketch + a per-partition candidate heap, which is the
# SpaceSaving/topK trade: estimates may overcount (est >= exact), so
# ranking by estimate can only promote a light item, never drop a
# heavy one below its true rank bound.
# ---------------------------------------------------------------------------
TOPK_HEAVY = 20


@query("topk_heavy_hitters", oracle=None)  # composed below
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TOPK_HEAVY tokens by CMS estimate: (tok, cms_estimate,
    exact_cnt, rank), ties broken by token."""
    from pyspark.sql import Window

    est = token_count_min_sketch(spark, sf_dir)
    top = est.orderBy(
        F.desc("cms_estimate"), F.asc("tok")
    ).limit(TOPK_HEAVY)
    w = Window.orderBy(F.desc("cms_estimate"), F.asc("tok"))
    return top.select(
        "tok",
        "cms_estimate",
        "exact_cnt",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def _topk_oracle() -> str:
    from clickhouse_batcher_spark.catalog import ORACLES

    cms = ORACLES["token_count_min_sketch"]
    return (
        f"WITH cms AS ({cms}) "
        f"SELECT tok, cms_estimate, exact_cnt, rank FROM ("
        f"  SELECT tok, cms_estimate, exact_cnt,"
        f"         CAST(ROW_NUMBER() OVER (ORDER BY cms_estimate DESC, tok)"
        f"              AS BIGINT) AS rank"
        f"  FROM cms"
        f") WHERE rank <= {TOPK_HEAVY}"
    )


from clickhouse_batcher_spark.catalog import ORACLES as _SK_ORACLES  # noqa: E402

_SK_ORACLES["topk_heavy_hitters"] = " ".join(_topk_oracle().split())


# ---------------------------------------------------------------------------
# topKWeighted analogue: heavy hitters by total VALUE, ranked by a
# weight-summing Count-Min estimate (weights integer-quantized to
# cents so every sketch counter is exact and engine-identical).
# ---------------------------------------------------------------------------

TOPK_WEIGHTED = 10
_WSALT = "w"
WCMS_WIDTH = 1024  # wider than the count CMS: the ranking must be
                   # collision-clean enough that estimate order tracks
                   # true-weight order (64 buckets vs 150+ keys would
                   # make the "top" list collision noise)


def _wbucket(col, salt):
    return (
        F.conv(
            F.substring(F.sha2(F.concat(F.lit(salt), col), 256), 1, 4), 16, 10
        ).cast("bigint")
        % WCMS_WIDTH
    )


def _sql_wbucket(expr: str, salt: str) -> str:
    h = f"substring(sha256('{salt}' || {expr}), 1, 4)"
    digit = lambda i: f"(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    val = " + ".join(f"{digit(i)} * {16 ** (4 - i)}" for i in range(1, 5))
    return f"(({val}) % {WCMS_WIDTH})"


def _weighted_cms_oracle() -> str:
    wsum = (
        "SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT))"
        " AS BIGINT) AS w FROM events GROUP BY user_id"
    )
    key = "CAST(a.user_id AS VARCHAR)"
    bkey = "CAST(b.user_id AS VARCHAR)"
    ests = ", ".join(
        f"(SELECT CAST(SUM(b.w) AS BIGINT) FROM ws b"
        f" WHERE {_sql_wbucket(bkey, f'{_WSALT}{i:02d}|')}"
        f" = {_sql_wbucket(key, f'{_WSALT}{i:02d}|')})"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH ws AS ({wsum}),
    est AS (
      SELECT a.user_id, a.w AS exact_weight, least({ests}) AS cms_estimate
      FROM ws a
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY cms_estimate DESC, user_id) AS rank
      FROM est
    )
    SELECT user_id, cms_estimate, exact_weight, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOPK_WEIGHTED}
    """


@query("topk_weighted_users", oracle=None)  # composed below
def topk_weighted_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted`` analog: the top users by TOTAL event
    value, ranked by a weight-summing CMS estimate (exact weight shown
    beside it; estimate >= exact always).

    Weights quantize to integer cents BEFORE sketching, so counters
    are exact integers — partition-order independent and hash-stable —
    and the sketch itself is the same merged (hash-row, bucket) grid
    as the count CMS: map-side partials ARE the per-partition sketch.
    Top-k via orderBy().limit() then a <=k-row window for the rank.
    """
    from pyspark.sql import Window

    ws = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("w")
        )
        .cache()
    )
    key = F.col("user_id").cast("string")
    est = None
    for i in range(CMS_DEPTH):
        salt = f"{_WSALT}{i:02d}|"
        row = ws.groupBy(_wbucket(key, salt).alias("bucket")).agg(
            F.sum("w").alias(f"row_w_{i}")
        )
        part = ws.select(
            "user_id", _wbucket(key, salt).alias("bucket")
        ).join(F.broadcast(row), "bucket").select("user_id", f"row_w_{i}")
        est = part if est is None else est.join(part, "user_id")
    cms = F.least(*[F.col(f"row_w_{i}") for i in range(CMS_DEPTH)]).cast(
        "bigint"
    )
    scored = ws.join(est, "user_id").select(
        "user_id", F.col("w").alias("exact_weight"), cms.alias("cms_estimate")
    )
    top = scored.orderBy(F.desc("cms_estimate"), "user_id").limit(
        TOPK_WEIGHTED
    )
    w_rank = Window.orderBy(F.desc("cms_estimate"), "user_id")
    return top.select(
        "user_id",
        "cms_estimate",
        "exact_weight",
        F.row_number().over(w_rank).cast("bigint").alias("rank"),
    )


from clickhouse_batcher_spark.catalog import ORACLES as _SK_ORACLES  # noqa: E402

_SK_ORACLES["topk_weighted_users"] = " ".join(_weighted_cms_oracle().split())


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — the ClickHouse
# ``uniqTheta`` family's core estimator (theta sketches ARE KMV with
# adaptive theta). Keep the k smallest DISTINCT 60-bit hashes per
# group; if the k-th smallest is h_k, the space "density" k/h_k
# extrapolates to (k-1) * 2^60 / h_k distinct values (the -1 makes the
# estimator unbiased). Everything is integer hashes + one bounded
# top-k per group — fully mergeable (union = merge the min-sets), and
# the oracle replicates it exactly, so unlike a library sketch this
# one is hash-exact checkable.
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_SPACE = float(1 << 60)


@query(
    "kmv_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(sha256('kmv:' || user_id::VARCHAR), 1, 15))
                  AS BIGINT) AS hash
      FROM events
    ), r AS (
      SELECT event_type, hash,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY hash) AS rn
      FROM h
    ), s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_used,
             CAST(MAX(hash) AS BIGINT) AS kth_hash
      FROM r WHERE rn <= {KMV_K} GROUP BY 1
    )
    SELECT event_type, k_used, kth_hash,
      CASE WHEN k_used < {KMV_K} THEN k_used
           ELSE CAST(floor(({KMV_K} - 1) * {_KMV_SPACE!r}
                           / CAST(kth_hash AS DOUBLE)) AS BIGINT)
      END AS est_distinct
    FROM s
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct users per event type via a k=64 KMV sketch
    (uniqTheta analogue) — the mergeable alternative to
    `hll_distinct_users` with direct set-operation support (theta
    sketches intersect/difference; HLL cannot).

    The per-group state is k 64-bit integers; a distributed top-k of
    distinct hashes is one partial-aggregating shuffle. The estimate
    arithmetic runs on identical integers in both engines, so the
    driver compare is hash-exact despite this being an approximate
    sketch.
    """
    from clickhouse_batcher_spark.functions import portable_hash64

    h = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            portable_hash64(
                F.col("user_id").cast("string"), salt="kmv:"
            ).alias("hash"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("hash")
    s = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.max("hash").cast("bigint").alias("kth_hash"),
        )
    )
    est = F.when(F.col("k_used") < KMV_K, F.col("k_used")).otherwise(
        F.floor(
            (KMV_K - 1) * F.lit(_KMV_SPACE) / F.col("kth_hash").cast("double")
        ).cast("bigint")
    )
    return s.select(
        "event_type", "k_used", "kth_hash", est.alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# HLL STATE MERGE (round-5 third session): ClickHouse's
# ``uniqState`` / ``uniqMerge`` AggregatingMergeTree workflow — store
# per-day sketch STATES, answer total-period questions by merging
# states without touching raw data. The register frame IS the
# mergeable state (merge = MAX per register), so the day->total
# rollup is a groupBy over |days| x m rows; the query emits the
# merged estimate NEXT TO the direct-from-raw estimate, which must
# agree exactly (MAX is associative) — self-checking mergeability.
# ---------------------------------------------------------------------------


@query(
    "hll_state_merge_daily",
    oracle=f"""
    WITH h AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        CAST(('0x' || substr(sha256('hll:' || user_id::VARCHAR), 1, 15))
             AS BIGINT) AS hash
      FROM events
    ), day_regs AS (
      SELECT event_type, day, hash % {HLL_REGISTERS} AS register,
        MAX(CASE WHEN hash // 256 = 0 THEN 53
                 ELSE 53 - length(bin(hash // 256)) END) AS mj
      FROM h GROUP BY 1, 2, 3
    ), merged AS (
      SELECT event_type, register, MAX(mj) AS mj
      FROM day_regs GROUP BY 1, 2
    ), direct AS (
      SELECT event_type, hash % {HLL_REGISTERS} AS register,
        MAX(CASE WHEN hash // 256 = 0 THEN 53
                 ELSE 53 - length(bin(hash // 256)) END) AS mj
      FROM h GROUP BY 1, 2
    ), est_m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS registers_hit,
        SUM(1::BIGINT << (53 - mj))
          + ({HLL_REGISTERS} - COUNT(*)) * (1::BIGINT << 53) AS s_scaled
      FROM merged GROUP BY 1
    ), est_d AS (
      SELECT event_type,
        SUM(1::BIGINT << (53 - mj))
          + ({HLL_REGISTERS} - COUNT(*)) * (1::BIGINT << 53) AS s_scaled
      FROM direct GROUP BY 1
    ), days AS (
      SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM h GROUP BY 1
    )
    SELECT m.event_type, days.n_days, m.registers_hit,
      round({_HLL_ALPHA_M2_2P53} / CAST(m.s_scaled AS DOUBLE), 2)
        AS est_merged,
      round({_HLL_ALPHA_M2_2P53} / CAST(d.s_scaled AS DOUBLE), 2)
        AS est_direct,
      (m.s_scaled = d.s_scaled) AS states_equal
    FROM est_m m
    JOIN est_d d ON d.event_type = m.event_type
    JOIN days ON days.event_type = m.event_type
    """,
)
def hll_state_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqState/uniqMerge analog: per-day HLL register states MAX-
    merged into a total-period estimate, emitted next to the
    direct-from-raw estimate — ``states_equal`` is TRUE for every row
    because register MAX is associative, which is the whole point:
    a year of dailies answers any-period distinct counts without
    rescanning raw events.

    (The raw harmonic estimate is used on both paths — the bias
    corrections live in `hll_distinct_users`; this query isolates
    state mergeability.) At 100 TB the day-state table is
    |days| x m rows per group key — the continuous-aggregate pattern
    `incremental_rollup_events` uses for sums, extended to sketches.
    """
    m = HLL_REGISTERS
    h = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(F.lit("hll:"), F.col("user_id").cast("string")),
                    256,
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hash"),
    )
    rho = F.expr(
        "CASE WHEN hash div 256 = 0 THEN 53 "
        "ELSE 53 - length(bin(hash div 256)) END"
    )
    day_regs = (
        h.select("event_type", "day", (F.col("hash") % m).alias("register"), rho.alias("rho"))
        .groupBy("event_type", "day", "register")
        .agg(F.max("rho").alias("mj"))
    )
    merged = day_regs.groupBy("event_type", "register").agg(
        F.max("mj").alias("mj")
    )
    direct = (
        h.select("event_type", (F.col("hash") % m).alias("register"), rho.alias("rho"))
        .groupBy("event_type", "register")
        .agg(F.max("rho").alias("mj"))
    )

    def _scaled(regs: DataFrame) -> DataFrame:
        return regs.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("registers_hit"),
            (
                F.sum(F.expr("shiftleft(1L, cast(53 - mj AS INT))"))
                + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 53)
            )
            .cast("bigint")
            .alias("s_scaled"),
        )

    est_m = _scaled(merged)
    est_d = _scaled(direct).select(
        F.col("event_type").alias("et_d"), F.col("s_scaled").alias("s_d")
    )
    days = h.groupBy(F.col("event_type").alias("et_days")).agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    alpha = F.lit(float(_HLL_ALPHA_M2_2P53))
    return (
        est_m.join(est_d, F.col("event_type") == F.col("et_d"))
        .join(F.broadcast(days), F.col("event_type") == F.col("et_days"))
        .select(
            "event_type",
            "n_days",
            "registers_hit",
            F.round(alpha / F.col("s_scaled").cast("double"), 2).alias(
                "est_merged"
            ),
            F.round(alpha / F.col("s_d").cast("double"), 2).alias(
                "est_direct"
            ),
            (F.col("s_scaled") == F.col("s_d")).alias("states_equal"),
        )
    )


@query(
    "kmv_union_intersection",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(sha256('kmv:' || user_id::VARCHAR), 1, 15))
                  AS BIGINT) AS hash
      FROM events WHERE event_type IN ('click', 'view')
    ), per AS (
      SELECT event_type, hash,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hash) AS rn
      FROM h
    ), per_est AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_used,
             MAX(hash) AS kth
      FROM per WHERE rn <= {KMV_K} GROUP BY 1
    ), uh AS (
      SELECT DISTINCT hash FROM h
    ), ur AS (
      SELECT hash, ROW_NUMBER() OVER (ORDER BY hash) AS rn FROM uh
    ), u_est AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(hash) AS kth
      FROM ur WHERE rn <= {KMV_K}
    ), ests AS (
      SELECT
        (SELECT CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                ELSE floor(({KMV_K} - 1) * {_KMV_SPACE!r}
                           / CAST(kth AS DOUBLE)) END
         FROM per_est WHERE event_type = 'click') AS est_a,
        (SELECT CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                ELSE floor(({KMV_K} - 1) * {_KMV_SPACE!r}
                           / CAST(kth AS DOUBLE)) END
         FROM per_est WHERE event_type = 'view') AS est_b,
        (SELECT CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
                ELSE floor(({KMV_K} - 1) * {_KMV_SPACE!r}
                           / CAST(kth AS DOUBLE)) END
         FROM u_est) AS est_union
    )
    SELECT CAST(est_a AS BIGINT) AS est_a, CAST(est_b AS BIGINT) AS est_b,
      CAST(est_union AS BIGINT) AS est_union,
      CAST(greatest(est_a + est_b - est_union, 0) AS BIGINT)
        AS est_intersection
    FROM ests
    """,
)
def kmv_union_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra — the capability HLL registers lack and the
    reason theta sketches exist: the union sketch is just KMV over the
    merged min-sets (here recomputed over the union of hash streams —
    identical by construction), and intersection follows by
    inclusion-exclusion. One row: est_a (click users), est_b (view
    users), est_union, est_intersection.

    All estimates run the same integer-hash arithmetic on both
    engines (hash-exact oracle); `distinct_users_type_overlap` holds
    the exact answers this approximates.
    """
    h = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(
                            F.lit("kmv:"), F.col("user_id").cast("string")
                        ),
                        256,
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("hash"),
        )
        .distinct()
    )

    def _est(frame: DataFrame, part_cols: list[str]) -> F.Column:
        w = (
            Window.partitionBy(*part_cols).orderBy("hash")
            if part_cols
            else Window.partitionBy().orderBy("hash")
        )
        top = frame.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= KMV_K
        )
        agg = top.groupBy(*part_cols) if part_cols else top.groupBy()
        return agg.agg(
            F.count(F.lit(1)).alias("k_used"), F.max("hash").alias("kth")
        ).select(
            *part_cols,
            F.when(
                F.col("k_used") < KMV_K, F.col("k_used").cast("double")
            )
            .otherwise(
                F.floor(
                    (KMV_K - 1)
                    * F.lit(_KMV_SPACE)
                    / F.col("kth").cast("double")
                )
            )
            .alias("est"),
        )

    per = _est(h, ["event_type"])
    a = per.filter(F.col("event_type") == "click").select(
        F.col("est").alias("est_a")
    )
    b = per.filter(F.col("event_type") == "view").select(
        F.col("est").alias("est_b")
    )
    u = _est(h.select("hash").distinct(), []).select(
        F.col("est").alias("est_union")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(u))
        .select(
            F.col("est_a").cast("bigint").alias("est_a"),
            F.col("est_b").cast("bigint").alias("est_b"),
            F.col("est_union").cast("bigint").alias("est_union"),
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0.0),
            )
            .cast("bigint")
            .alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# QUANTILE STATE MERGE: ClickHouse's ``quantileState`` /
# ``quantileMerge`` workflow on a fixed-bin histogram sketch — store
# per-day bin-count STATES, answer total-period quantiles by merging
# states (merge = per-bin SUM, exactly additive), never rescanning
# raw data. Bin = floor(value): integer edges, integer counts,
# integer rank rule — the whole sketch is hash-exact.
# ---------------------------------------------------------------------------


@query(
    "quantile_state_merge_daily",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(FLOOR(value) AS BIGINT) AS bin
      FROM events
    ), day_state AS (
      SELECT event_type, day, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM h GROUP BY 1, 2, 3
    ), merged AS (
      SELECT event_type, bin, CAST(SUM(c) AS BIGINT) AS c
      FROM day_state GROUP BY 1, 2
    ), direct AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM h GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, c,
        SUM(c) OVER (PARTITION BY event_type ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        SUM(c) OVER (PARTITION BY event_type) AS n
      FROM merged
    ), q AS (
      SELECT event_type,
        CAST(MAX(n) AS BIGINT) AS n_events,
        CAST(MIN(CASE WHEN cc >= (50 * n + 99) // 100 THEN bin END)
             AS BIGINT) AS p50_bin,
        CAST(MIN(CASE WHEN cc >= (90 * n + 99) // 100 THEN bin END)
             AS BIGINT) AS p90_bin,
        CAST(MIN(CASE WHEN cc >= (99 * n + 99) // 100 THEN bin END)
             AS BIGINT) AS p99_bin
      FROM cum GROUP BY 1
    ), eqc AS (
      SELECT m.event_type,
        CAST(COUNT(*) AS BIGINT) AS n_bins,
        BOOL_AND(m.c = d.c) AS states_equal
      FROM merged m
      JOIN direct d ON d.event_type = m.event_type AND d.bin = m.bin
      GROUP BY 1
    ), days AS (
      SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM h GROUP BY 1
    )
    SELECT q.event_type, days.n_days, eqc.n_bins, q.n_events,
           q.p50_bin, q.p90_bin, q.p99_bin, eqc.states_equal
    FROM q
    JOIN eqc ON eqc.event_type = q.event_type
    JOIN days ON days.event_type = q.event_type
    """,
)
def quantile_state_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantileState/quantileMerge analog: per-day unit-bin histogram
    states SUM-merged into total-period p50/p90/p99, emitted next to a
    bin-count equality check against the direct-from-raw histogram —
    ``states_equal`` is TRUE everywhere because bin counts are
    additive, which is the point: a year of daily states answers
    any-period quantiles without rescanning raw events.

    Everything is integer-exact: unit bins (floor(value)), integer
    counts, and the ceil-rank rule r_q = (q*n + 99) div 100 with the
    quantile reported as the smallest bin whose cumulative count
    reaches r_q (bin-resolution answers, the standard sketch
    contract). At 100 TB the day-state table is |days| x |bins| rows
    per type — the cumulative window runs over the BIN frame (value
    range, ~500 rows here), never raw events.
    """
    h = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.floor("value").cast("bigint").alias("bin"),
    )
    day_state = h.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    merged = day_state.groupBy("event_type", "bin").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    direct = h.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(wall).alias("n"),
    )
    rank = lambda qq: F.expr(f"({qq} * n + 99) DIV 100")  # noqa: E731
    q = cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        *[
            F.min(F.when(F.col("cc") >= rank(qq), F.col("bin")))
            .cast("bigint")
            .alias(f"p{qq}_bin")
            for qq in (50, 90, 99)
        ],
    )
    eqc = (
        merged.alias("m")
        .join(
            direct.alias("d"),
            ["event_type", "bin"],
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.min(F.col("m.c") == F.col("d.c")).alias("states_equal"),
        )
    )
    days = h.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    return (
        q.join(eqc, "event_type")
        .join(days, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_bins",
            "n_events",
            "p50_bin",
            "p90_bin",
            "p99_bin",
            "states_equal",
        )
    )
