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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
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
