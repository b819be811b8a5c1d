"""ClickHouse-flavored aggregate parity: argMin/argMax (OHLC bars) and
ordered groupArray (behavior sequences).

The reference delegates its query surface to a ClickHouse server,
whose signature aggregates are ``argMin``/``argMax``/``groupArray``.
Spark has native equivalents (``min_by``/``max_by`` with a struct
ordering key; ``sort_array(collect_list(struct(...)))``), so both
operators here are pure JVM aggregates — no UDFs, map-side partials,
one hash-shuffle on the group key.

Determinism: every ordering key includes the unique ``event_id``
tiebreak, so first/last per group are well-defined and hash-stable —
the precondition for the driver's value-hash gate (a bare
``min_by(value, ts)`` with duplicate timestamps would be
partition-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import dec
from clickhouse_batcher_spark.tables import load_table

SEQ_LEN = 5


@query(
    "events_ohlc_hourly",
    oracle="""
    WITH ranked AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        value,
        row_number() OVER (
          PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
          ORDER BY ts, event_id) AS rn_first,
        row_number() OVER (
          PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)), event_type
          ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
    )
    SELECT hour, event_type,
      MIN(CASE WHEN rn_first = 1 THEN value END) AS open,
      MAX(value) AS high,
      MIN(value) AS low,
      MIN(CASE WHEN rn_last = 1 THEN value END) AS close,
      COUNT(*) AS n_events
    FROM ranked
    GROUP BY hour, event_type
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical argMin/argMax
    (ClickHouse) downsampling shape, via Spark's native min_by/max_by
    with a (ts, event_id) struct ordering key. One aggregate pass,
    partials combine map-side; no window over the fact table."""
    events = load_table(spark, sf_dir, "events")
    ordkey = F.struct("ts", "event_id")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "user_event_sequences",
    oracle=f"""
    SELECT user_id,
      array_to_string(
        (list(event_type ORDER BY ts, event_id))[1:{SEQ_LEN}], '>'
      ) AS seq,
      COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-{SEQ_LEN} event-type sequence per user (ordered
    groupArray): the behavioral-modeling primitive (session prefixes
    for next-event prediction / markov features).

    collect_list gathers unordered (partial-aggregated map-side),
    sort_array orders the (ts, event_id, type) structs exactly once
    per group, then slice + transform + concat_ws emit the prefix as a
    plain string — deterministic, hash-comparable, and array-free on
    the driver compare path. Per-user state is bounded by the user's
    event count; at 100 TB a prefix cap would move into the aggregate
    via a monotonic (ts, event_id) filter pre-pass, same plan shape.
    """
    events = load_table(spark, sf_dir, "events")
    seq = F.concat_ws(
        ">",
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            1,
            SEQ_LEN,
        ),
    )
    return events.groupBy("user_id").agg(
        seq.alias("seq"), F.count(F.lit(1)).alias("n_events")
    )


RETENTION_STAGES = ("view", "click", "purchase")
UNIQ_UP_TO = 8


@query(
    "user_retention_flags",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
        MAX(CASE WHEN event_type = '{RETENTION_STAGES[0]}' THEN 1 ELSE 0 END) AS c0,
        MAX(CASE WHEN event_type = '{RETENTION_STAGES[1]}' THEN 1 ELSE 0 END) AS c1,
        MAX(CASE WHEN event_type = '{RETENTION_STAGES[2]}' THEN 1 ELSE 0 END) AS c2
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(SUM(c0) AS BIGINT) AS r0,
      CAST(SUM(c0 * c1) AS BIGINT) AS r1,
      CAST(SUM(c0 * c2) AS BIGINT) AS r2,
      CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    """,
)
def user_retention_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention()``: per-user condition flags where
    r[0] = cond0 held and r[i] = cond0 AND condi, summed over users.

    Two map-side-combinable aggregate passes (per-user MAX flags, then
    global sums) — the cohort-entry/return shape without windows or
    joins at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    flags = [
        F.max(
            F.when(F.col("event_type") == stage, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"c{i}")
        for i, stage in enumerate(RETENTION_STAGES)
    ]
    per_user = events.groupBy("user_id").agg(*flags)
    return per_user.groupBy().agg(
        F.sum("c0").cast("bigint").alias("r0"),
        F.sum(F.col("c0") * F.col("c1")).cast("bigint").alias("r1"),
        F.sum(F.col("c0") * F.col("c2")).cast("bigint").alias("r2"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


@query(
    "sequence_match_counts",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = '{RETENTION_STAGES[0]}' THEN ts END) AS t_first,
        MAX(CASE WHEN event_type = '{RETENTION_STAGES[2]}' THEN ts END) AS t_last
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(SUM(CASE WHEN t_first IS NOT NULL AND t_last IS NOT NULL
                     AND t_first < t_last THEN 1 ELSE 0 END) AS BIGINT)
        AS matched_users,
      CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    """,
)
def sequence_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')``: users with a
    '{RETENTION_STAGES[0]}' strictly before a later
    '{RETENTION_STAGES[2]}'.

    The regex-over-events pattern reduces to conditional MIN/MAX
    timestamps per user — one aggregate pass, no self-join, no window;
    the existence comparison is order-independent and exact.
    """
    events = load_table(spark, sf_dir, "events")
    t_first = F.min(
        F.when(F.col("event_type") == RETENTION_STAGES[0], F.col("ts"))
    ).alias("t_first")
    t_last = F.max(
        F.when(F.col("event_type") == RETENTION_STAGES[2], F.col("ts"))
    ).alias("t_last")
    per_user = events.groupBy("user_id").agg(t_first, t_last)
    matched = F.when(
        F.col("t_first").isNotNull()
        & F.col("t_last").isNotNull()
        & (F.col("t_first") < F.col("t_last")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return per_user.groupBy().agg(
        F.sum(matched).cast("bigint").alias("matched_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


@query(
    "uniq_up_to_types_per_user",
    oracle=f"""
    SELECT user_id,
      CAST(LEAST(COUNT(DISTINCT event_type), {UNIQ_UP_TO} + 1) AS BIGINT)
        AS uniq_types_capped
    FROM events GROUP BY user_id
    """,
)
def uniq_up_to_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)``: exact distinct count capped at N+1
    (the "N or more" bucket). The cap is semantic, not an
    optimization here — Spark's distinct aggregate state is already
    bounded by the type vocabulary; in ClickHouse the cap bounds
    hash-set memory, and the relational form preserves the contract.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.least(
            F.countDistinct("event_type"), F.lit(UNIQ_UP_TO + 1)
        ).cast("bigint").alias("uniq_types_capped")
    )


EMA_SCALE = 1_000_000  # fixed-point units: 1e-6 of an event


@query(
    "events_ema_hourly_counts",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
        list(cnt ORDER BY hour) AS counts,
        CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours,
      CAST(list_reduce(
        list_prepend(counts[1] * {EMA_SCALE}, counts[2:]),
        (acc, x) -> (x * {EMA_SCALE} + 3 * acc) // 4
      ) AS BIGINT) AS ema_fixed
    FROM series
    """,
)
def events_ema_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage`` analog: EMA (alpha=1/4)
    of the hourly event count per type, as an ordered fold.

    Float EMA is un-oracle-able (the recurrence compounds last-ULP
    drift), so the state is *fixed-point integer*: E_0 = c_0*SCALE,
    E_t = (c_t*SCALE + 3*E_{{t-1}}) div 4 — truncating integer steps
    that Spark's ``aggregate`` higher-order function and DuckDB's
    ``list_reduce`` reproduce bit-exactly.

    Scale shape: the per-type series is assembled by
    ``sort_array(collect_list(...))`` — one aggregation pass, state
    bounded by hours-per-type (time-bounded, not corpus-bounded) —
    and the fold runs in-row, no window, no shuffle beyond the
    groupBys. The same fold IS the streaming update rule: one state
    integer per type, applied per finalized hour.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    series = hourly.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("hour", "cnt"))),
            lambda x: x["cnt"],
        ).alias("counts"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(counts, 2, size(counts) - 1),
          element_at(counts, 1) * CAST({EMA_SCALE} AS BIGINT),
          (acc, x) -> (x * CAST({EMA_SCALE} AS BIGINT) + 3 * acc) div 4
        )
        """
    )
    return series.select(
        "event_type", "n_hours", fold.cast("bigint").alias("ema_fixed")
    )


# ---------------------------------------------------------------------------
# intervalLengthSum analogue: union-length of per-user activity windows
# ---------------------------------------------------------------------------

ACTIVE_WINDOW_SECONDS = 300  # each event opens a [ts, ts+300s) window


@query(
    "user_active_interval_sum",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL {ACTIVE_WINDOW_SECONDS} SECOND AS e,
             event_id
      FROM events
    ), m AS (
      SELECT user_id, s, e, event_id,
        MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS prev_max
      FROM iv
    ), g AS (
      SELECT user_id, s, e,
        SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY s, e, event_id
                ROWS UNBOUNDED PRECEDING) AS grp
      FROM m
    ), isl AS (
      SELECT user_id, grp, MIN(s) AS s0, MAX(e) AS e1
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(date_diff('second', s0, e1)) AS BIGINT) AS active_seconds,
           COUNT(*) AS n_islands
    FROM isl GROUP BY user_id
    """,
)
def user_active_interval_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``intervalLengthSum`` analog: total length of the
    UNION of per-user activity intervals (each event opens a 5-minute
    window; overlaps must not double-count).

    The union is the classic gaps-and-islands reduction: within each
    user's (start, end, event_id) total order, an island starts where
    the start exceeds the running max of all previous ends; a running
    conditional sum labels islands; min(start)/max(end) per island and
    two bigint aggregates finish it. One shuffle on user_id, two
    partition-local window passes, exact integer second arithmetic —
    no self-join, no interval pair explosion (an interval-overlap
    self-join would be quadratic per dense user at 100 TB).
    """
    w_order = [F.col("s"), F.col("e"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*w_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {ACTIVE_WINDOW_SECONDS} SECONDS")).alias("e"),
        "event_id",
    )
    flagged = iv.withColumn("prev_max", F.max("e").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
        ).otherwise(0),
    )
    grouped = flagged.withColumn("grp", F.sum("new_island").over(w_run))
    islands = grouped.groupBy("user_id", "grp").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return islands.groupBy("user_id").agg(
        F.sum(
            F.unix_timestamp("e1") - F.unix_timestamp("s0")
        ).cast("bigint").alias("active_seconds"),
        F.count(F.lit(1)).alias("n_islands"),
    )


# ---------------------------------------------------------------------------
# deltaSum / boundingRatio analogues
# ---------------------------------------------------------------------------


@query(
    "delta_sum_by_type",
    oracle="""
    WITH d AS (
      SELECT event_type,
        CAST(value AS DECIMAL(27,6))
          - lag(CAST(value AS DECIMAL(27,6))) OVER (
              PARTITION BY event_type
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS diff
      FROM events
    )
    SELECT event_type,
           CAST(COALESCE(SUM(CASE WHEN diff > 0 THEN diff END), 0)
                AS DOUBLE) AS delta_sum,
           COUNT(CASE WHEN diff > 0 THEN 1 END) AS n_increases
    FROM d GROUP BY event_type
    """,
)
def delta_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``deltaSum`` analog: per type, the sum of POSITIVE
    consecutive-value increments in event-time order — the standard
    counter-reset-tolerant rate aggregate (a reset shows as a negative
    diff and is skipped, so monotonic-counter totals survive restarts).

    One shuffle on event_type, a partition-local lag, decimal-exact
    increments (order fixed by the unique event_id tiebreak), map-side
    combined final sums.
    """
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", dec("value").alias("v"))
        .withColumn("diff", F.col("v") - F.lag("v").over(w))
    )
    return d.groupBy("event_type").agg(
        F.coalesce(
            F.sum(F.when(F.col("diff") > 0, F.col("diff"))), F.lit(0)
        ).cast("double").alias("delta_sum"),
        F.count(F.when(F.col("diff") > 0, F.lit(1))).alias("n_increases"),
    )


@query(
    "bounding_ratio_by_user",
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(value AS DECIMAL(27,6)) AS v,
        CAST(ts AS TIMESTAMP) AS t,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rf,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    ), b AS (
      SELECT user_id,
        MIN(CASE WHEN rf = 1 THEN v END) AS v_first,
        MIN(CASE WHEN rl = 1 THEN v END) AS v_last,
        MIN(t) AS t0, MAX(t) AS t1, COUNT(*) AS n
      FROM ranked GROUP BY user_id
    )
    SELECT user_id, n,
      CAST(v_last - v_first AS DOUBLE)
        / CAST(date_diff('second', t0, t1) AS DOUBLE) AS bounding_ratio
    FROM b
    WHERE n >= 2 AND date_diff('second', t0, t1) > 0
    """,
)
def bounding_ratio_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``boundingRatio`` analog: per user, (last value -
    first value) / (time span in seconds) — the coarse slope of the
    series.

    Pure single-pass aggregate: min_by/max_by keyed by the total order
    (ts, event_id) pick the endpoint values without any window or
    sort; the ratio is ONE IEEE division of a decimal-exact numerator
    by an integer-exact second count, so it is bit-identical across
    engines and partitionings.
    """
    key = F.struct(F.col("ts"), F.col("event_id"))
    b = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min_by(dec("value"), key).alias("v_first"),
            F.max_by(dec("value"), key).alias("v_last"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    span = F.unix_timestamp("t1") - F.unix_timestamp("t0")
    return (
        b.filter((F.col("n") >= 2) & (span > 0))
        .select(
            "user_id",
            "n",
            (
                (F.col("v_last") - F.col("v_first")).cast("double")
                / span.cast("double")
            ).alias("bounding_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# quantileExactWeighted analogue
# ---------------------------------------------------------------------------


@query(
    "lineitem_weighted_price_median",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             SUM(CAST(l_quantity AS BIGINT)) AS wt
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT flag, price, wt,
        SUM(wt) OVER (PARTITION BY flag ORDER BY price
                      ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(wt) OVER (PARTITION BY flag) AS total
      FROM agg
    )
    SELECT flag, MIN(price) AS weighted_median,
           CAST(MIN(total) AS BIGINT) AS total_weight
    FROM c WHERE cum * 2 >= total GROUP BY flag
    """,
)
def lineitem_weighted_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(0.5)`` analog: the
    quantity-weighted median extended price per return flag — the
    smallest price whose cumulative weight reaches half the total.

    Exact weighted quantiles inherently need a per-group ordered pass
    (ClickHouse's own implementation materializes the value/weight
    multiset); the pre-aggregation to distinct (group, value) rows
    bounds the window input, integer weights make every cumulative sum
    exact, and `cum * 2 >= total` avoids any fractional arithmetic.
    With only a handful of groups and high value cardinality the
    ordered pass concentrates on few tasks — at 100 TB use the binned
    `value_histogram_quantiles` shape instead when approximation is
    acceptable; this operator is the exact-answer complement.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("wt"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    c = agg.withColumn("cum", F.sum("wt").over(w_cum)).withColumn(
        "total", F.sum("wt").over(w_tot)
    )
    return (
        c.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.min("total").cast("bigint").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# sequenceNextNode / entropy analogues
# ---------------------------------------------------------------------------


def _next_node_oracle() -> str:
    from clickhouse_batcher_spark.catalog import ORACLES
    from clickhouse_batcher_spark.operators import timeseries  # noqa: F401

    tm = ORACLES["event_transition_matrix"]
    return f"""
    WITH tm AS ({tm}), r AS (
      SELECT prev_type, next_type, n_transitions,
        row_number() OVER (PARTITION BY prev_type
                           ORDER BY n_transitions DESC, next_type DESC) AS rn
      FROM tm
    )
    SELECT prev_type, next_type, n_transitions FROM r WHERE rn = 1
    """


@query("next_event_prediction", oracle=None)  # composed below
def next_event_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode`` analog: for each event type, the
    most frequent immediate successor (ties broken by type name).

    Pure aggregation over the already-oracled transition matrix —
    max_by with a (count, type) composite key gives the deterministic
    argmax without a window.
    """
    from clickhouse_batcher_spark.operators.timeseries import (
        event_transition_matrix,
    )

    tm = event_transition_matrix(spark, sf_dir)
    key = F.struct(F.col("n_transitions"), F.col("next_type"))
    return tm.groupBy("prev_type").agg(
        F.max_by("next_type", key).alias("next_type"),
        F.max("n_transitions").alias("n_transitions"),
    )


@query(
    "event_type_user_entropy",
    oracle="""
    WITH cu AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM cu GROUP BY 1
    )
    SELECT cu.event_type, MIN(tot.n_users) AS n_users,
      CAST(-1.0 * SUM(
        CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS DECIMAL(27,6))) AS DOUBLE) AS user_entropy
    FROM cu JOIN tot ON cu.event_type = tot.event_type
    GROUP BY cu.event_type
    """,
)
def event_type_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``entropy()`` analog: Shannon entropy of the user
    distribution within each event type — the audience-concentration
    signal (low entropy = a few users dominate the type).

    Determinism contract as everywhere: each p*ln(p) term rounds to 6
    decimals and sums exactly as decimal; two map-side-combinable
    aggregation passes, no windows.
    """
    cu = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cu.groupBy(F.col("event_type").alias("et")).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(p * F.log(p), 6).cast("decimal(27,6)")
    return (
        cu.join(F.broadcast(tot), F.col("event_type") == F.col("et"))
        .groupBy("event_type")
        .agg(
            F.min("n_users").alias("n_users"),
            (F.lit(-1.0) * F.sum(term).cast("double")).alias("user_entropy"),
        )
    )


from clickhouse_batcher_spark.catalog import ORACLES as _CH_ORACLES  # noqa: E402

_CH_ORACLES["next_event_prediction"] = " ".join(_next_node_oracle().split())


@query(
    "max_concurrent_intervals",
    oracle=f"""
    WITH iv AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP)
               + INTERVAL {ACTIVE_WINDOW_SECONDS} SECOND AS e,
             event_id
      FROM events
    ), pts AS (
      SELECT event_type, day, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, day, e AS t, -1 AS delta, event_id FROM iv
    ), c AS (
      SELECT event_type, day,
        SUM(delta) OVER (PARTITION BY event_type, day
                         ORDER BY t, delta, event_id
                         ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    )
    SELECT event_type, day, CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM c GROUP BY event_type, day
    """,
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``maxIntersections`` analog: per (type, day-of-start)
    the PEAK number of simultaneously active 5-minute event windows —
    the load-spike companion to `user_active_interval_sum`'s total.

    The textbook sweep-line, relationally: +1/-1 boundary points, a
    partition-local running sum in the (time, delta, event_id) total
    order (ends sort before coincident starts, so touching intervals
    never count as overlapping), MAX per group. The explode is exactly
    2 rows per event and the window partitions by (type, day) — a
    bounded sweep per partition, no global ordering, no self-join.
    """
    iv = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.col("ts").alias("s"),
        (
            F.col("ts") + F.expr(f"INTERVAL {ACTIVE_WINDOW_SECONDS} SECONDS")
        ).alias("e"),
        "event_id",
    )
    pts = iv.select(
        "event_type", "day", F.col("s").alias("t"), F.lit(1).alias("delta"),
        "event_id",
    ).unionByName(
        iv.select(
            "event_type", "day", F.col("e").alias("t"),
            F.lit(-1).alias("delta"), "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conc = pts.withColumn("conc", F.sum("delta").over(w))
    return conc.groupBy("event_type", "day").agg(
        F.max("conc").cast("bigint").alias("max_concurrent")
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands over per-customer order days
# ---------------------------------------------------------------------------
@query(
    "customer_order_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey,
        CAST(epoch(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)))
             AS BIGINT) // 86400 AS d
      FROM orders
    ), grp AS (
      SELECT o_custkey, d,
        d - row_number() OVER (PARTITION BY o_custkey ORDER BY d)
          AS island_key,
        d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d) AS gap
      FROM days
    ), islands AS (
      SELECT o_custkey, island_key,
        CAST(COUNT(*) AS BIGINT) AS island_len
      FROM grp GROUP BY 1, 2
    )
    SELECT i.o_custkey,
      CAST(SUM(i.island_len) AS BIGINT) AS n_order_days,
      CAST(COUNT(*) AS BIGINT) AS n_islands,
      CAST(MAX(i.island_len) AS BIGINT) AS max_island_len,
      CAST(g.max_gap AS BIGINT) AS max_gap_days
    FROM islands i
    JOIN (
      SELECT o_custkey, COALESCE(MAX(gap), 0) AS max_gap
      FROM grp GROUP BY 1
    ) g ON g.o_custkey = i.o_custkey
    GROUP BY 1, 5
    """,
)
def customer_order_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per customer: consecutive-day runs of order
    activity (the classic `day - row_number()` island key) rolled up
    to per-customer streak analytics — active-day count, island count,
    longest streak, and the longest silence. The retention shape
    (streaky vs steady buyers) that lifecycle and churn models
    consume; same family as `user_active_interval_sum` but on the
    DISCRETE day grid, where runs need the rank trick rather than
    interval arithmetic.

    Exact integers end-to-end (epoch-day arithmetic, counts, integer
    gaps). Scale: one distinct + two windows, all partitioned by
    customer (a customer's order days fit an executor by the same
    assumption as sessionization); the rollup is map-side combinable.
    """
    orders = load_table(spark, sf_dir, "orders")
    days = orders.select(
        "o_custkey",
        (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / 86400)
        .cast("bigint")
        .alias("d"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    grp = days.select(
        "o_custkey",
        "d",
        (F.col("d") - F.row_number().over(w)).alias("island_key"),
        (F.col("d") - F.lag("d").over(w)).alias("gap"),
    )
    islands = grp.groupBy("o_custkey", "island_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("island_len")
    )
    gaps = grp.groupBy("o_custkey").agg(
        F.coalesce(F.max("gap"), F.lit(0)).cast("bigint").alias(
            "max_gap_days"
        )
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.sum("island_len").cast("bigint").alias("n_order_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.max("island_len").cast("bigint").alias("max_island_len"),
        )
        .join(gaps, "o_custkey")
        .select(
            "o_custkey",
            "n_order_days",
            "n_islands",
            "max_island_len",
            "max_gap_days",
        )
    )


# ---------------------------------------------------------------------------
# Burstiness of per-customer order inter-arrival times
# ---------------------------------------------------------------------------
@query(
    "orders_interarrival_burstiness",
    oracle="""
    WITH d AS (
      SELECT o_custkey,
        CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS es,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey) AS rn
      FROM orders
    ), gaps AS (
      SELECT a.o_custkey, CAST(b.es - a.es AS BIGINT) AS gap_s
      FROM d a JOIN d b
        ON b.o_custkey = a.o_custkey AND b.rn = a.rn + 1
    ), m AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_gaps,
        SUM(CAST(gap_s AS HUGEINT)) AS s1i,
        CAST(SUM(CAST(gap_s AS HUGEINT)) AS DOUBLE) AS s1,
        CAST(SUM(CAST(gap_s AS HUGEINT) * gap_s) AS DOUBLE) AS s2
      FROM gaps
    )
    SELECT n_gaps,
      CAST(s1i // n_gaps AS BIGINT) AS mean_gap_s,
      round(sqrt((CAST(n_gaps AS DOUBLE) * s2 - s1 * s1))
            / CAST(n_gaps AS DOUBLE), 2)
        AS stddev_gap_s,
      round((sqrt((CAST(n_gaps AS DOUBLE) * s2 - s1 * s1)
                  / (CAST(n_gaps AS DOUBLE) * n_gaps)) - s1 / n_gaps)
            / (sqrt((CAST(n_gaps AS DOUBLE) * s2 - s1 * s1)
                    / (CAST(n_gaps AS DOUBLE) * n_gaps)) + s1 / n_gaps),
            6) AS burstiness
    FROM m
    """,
)
def orders_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of the
    per-customer order inter-arrival times, pooled corpus-wide: B -> -1
    for clockwork ordering, 0 for Poisson, -> +1 for extreme bursts —
    the one-number answer to "are purchases scheduled or bursty" that
    capacity planning and the islands/streak view (`customer_order_
    islands`) read together.

    Gaps are exact integer epoch-second differences of CONSECUTIVE
    orders per customer (rank self-join, same per-user discipline as
    the transition matrix); moments are HUGEINT/DECIMAL(38)-exact;
    sigma/mu/B are one fixed IEEE sequence rounded once each. One
    customer-partitioned window + one 1-row reduce.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.unix_timestamp("o_orderdate").alias("es"),
            (
                F.unix_timestamp("o_orderdate")
                - F.lag(F.unix_timestamp("o_orderdate")).over(w)
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
        .select(F.col("gap_s").cast("bigint").alias("gap_s"))
    )
    big = "decimal(38,0)"
    m = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.col("gap_s").cast(big)).alias("s1i"),
        F.sum(F.col("gap_s").cast(big)).cast("double").alias("s1"),
        F.sum(F.col("gap_s").cast(big) * F.col("gap_s"))
        .cast("double")
        .alias("s2"),
    )
    nd = F.col("n_gaps").cast("double")
    mu = F.col("s1") / nd
    sigma = F.sqrt((nd * F.col("s2") - F.col("s1") * F.col("s1")) / (nd * nd))
    return m.select(
        "n_gaps",
        # exact integer mean: a double->BIGINT cast ROUNDS on DuckDB
        # and TRUNCATES on Spark (the round-10 verify-skill trap)
        F.expr("CAST(s1i DIV n_gaps AS BIGINT)").alias("mean_gap_s"),
        # population sigma = sqrt(n*s2 - s1^2)/n — the SAME sigma the
        # burstiness column uses (an earlier draft divided by an extra
        # sqrt(n), i.e. reported the standard error of the mean)
        F.round(
            F.sqrt(nd * F.col("s2") - F.col("s1") * F.col("s1")) / nd,
            2,
        ).alias("stddev_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )
