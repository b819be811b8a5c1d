"""Driver-gated ClickHouse-dialect queries: end-to-end through
``plans.chsql.translate`` -> ``spark.sql`` -> DuckDB oracle.

The reference's users write ClickHouse SQL against the server it
batches into (`hashes_test.go:192-196,229,237` are literal
``SELECT count() FROM ...`` strings); ``tables.run_sql(dialect=
"clickhouse")`` is this engine's migration story for those queries.
Until round 7 the 1.9k-LoC transpiler was verified only by pytest —
these catalog entries put the translate() path itself under the
driver's Spark-vs-DuckDB correctness gate, one per flagship construct
family:

- aggregate combinators + LIMIT BY (``count/countIf/quantileExact``),
- ``ARRAY JOIN`` + ``arrayReduce`` + ``splitByChar`` text pipeline,
- ``FINAL SAMPLE`` read (latest-row-per-key over a deterministic
  keyed sample),
- ``PREWHERE`` + ``WITH TOTALS`` clause rewrites,
- the reference's positional-parameter count (engine-side binding),
- ``windowFunnel`` default-mode levels (the chain-start fold as one
  ``aggregate()`` expression),
- ``retention`` + ``sequenceCount`` cohort counts (flag algebra +
  ordered-string regex).

Every query here MUST route through ``run_sql(..., dialect=
"clickhouse")`` — using the DataFrame API would defeat the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_batcher_spark.catalog import ORACLES, query
from clickhouse_batcher_spark.operators.sampling import _sql_bucket
from clickhouse_batcher_spark.tables import run_sql

# Import the transpiler's own sampling space so the DuckDB oracle can
# never desynchronize from the translated query's hash threshold (a
# local re-hardcoded 65536 would go silently stale if the transpiler
# ever widened its hex-prefix space).
from clickhouse_batcher_spark.plans.chsql import _SAMPLE_SPACE  # noqa: E402

_FINAL_SAMPLE_FRAC = 0.25
_FINAL_SAMPLE_THRESH = round(_FINAL_SAMPLE_FRAC * _SAMPLE_SPACE)


@query(
    "chsql_limit_by_top_users",
    oracle="""
    SELECT event_type, user_id, n_events, n_big, med_value FROM (
      SELECT event_type, user_id,
             COUNT(*) AS n_events,
             COUNT(*) FILTER (WHERE value > 50) AS n_big,
             ROUND(quantile_cont(value, 0.5), 6) AS med_value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, user_id)
               AS __rn
      FROM events GROUP BY event_type, user_id
    ) ranked WHERE __rn <= 3
    """,
)
def chsql_limit_by_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per event type by activity, written in the
    ClickHouse dialect (``count()``/``countIf``/``quantileExact`` +
    ``ORDER BY .. LIMIT n BY``) and executed through ``translate()``.

    The LIMIT BY rewrite becomes one row_number window partitioned on
    the by-tuple — a single hash shuffle with one counter of state per
    group, scale-safe. Ties in n_events break on user_id, so the
    selection is deterministic. The median rounds to 6 decimals on
    both sides (the repo's float contract).
    """
    return run_sql(
        spark,
        """
        SELECT event_type, user_id, count() AS n_events,
               countIf(value > 50) AS n_big,
               round(quantileExact(0.5)(value), 6) AS med_value
        FROM events
        GROUP BY event_type, user_id
        ORDER BY n_events DESC, user_id
        LIMIT 3 BY event_type
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_array_join_token_stats",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    )
    SELECT u.tok AS token, COUNT(*) AS n_occurrences,
           ROUND(AVG(length(list_distinct(toks))), 6) AS avg_doc_vocab
    FROM d, UNNEST(d.toks) AS u(tok)
    GROUP BY u.tok
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
)
def chsql_array_join_token_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token frequency over documents via the ClickHouse text-array
    pipeline: ``splitByChar`` -> ``arrayFilter`` -> ``ARRAY JOIN`` ->
    ``arrayReduce('uniq')``, executed through ``translate()``.

    ARRAY JOIN lowers to LATERAL VIEW explode (generator inside
    whole-stage codegen, no Python), and the per-document vocabulary
    ``arrayReduce('uniq', toks)`` stays an in-row array fold — the only
    shuffle is the token groupBy. avg() over integer vocab sizes is
    order-independent (integer-valued doubles sum exactly), so the
    hash comparison is safe without decimal plumbing.
    """
    return run_sql(
        spark,
        """
        SELECT tok AS token, count() AS n_occurrences,
               round(avg(arrayReduce('uniq', toks)), 6) AS avg_doc_vocab
        FROM (SELECT arrayFilter(t -> notEmpty(t),
                                 splitByChar(' ', text)) AS toks
              FROM documents)
        ARRAY JOIN toks AS tok
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 50
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_prewhere_totals_by_status",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    WHERE o_totalprice > 100 AND o_orderpriority <> '1-URGENT'
    GROUP BY GROUPING SETS ((o_orderstatus), ())
    """,
)
def chsql_prewhere_totals_by_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order counts by status with a grand-total row, written as the
    ClickHouse read idiom ``PREWHERE ... WHERE ... GROUP BY ... WITH
    TOTALS`` and executed through ``translate()``.

    PREWHERE is ClickHouse's manual pushdown staging — folded into the
    WHERE because Catalyst pushes predicates itself; WITH TOTALS
    becomes GROUPING SETS ((status), ()) — one extra all-NULL total
    row from the same shuffle. Aggregates are count/distinct-count:
    order-independent, hash-safe.
    """
    return run_sql(
        spark,
        """
        SELECT o_orderstatus, count() AS n_orders,
               uniqExact(o_custkey) AS n_customers
        FROM orders
        PREWHERE o_totalprice > 100
        WHERE o_orderpriority != '1-URGENT'
        GROUP BY o_orderstatus WITH TOTALS
        """,
        sf_dir,
        dialect="clickhouse",
    )


_PARAM_TYPE = "click"
_PARAM_MAX_USER = 50


@query(
    "chsql_positional_params_count",
    oracle=f"""
    SELECT COUNT(*) AS n FROM events
    WHERE event_type = '{_PARAM_TYPE}' AND user_id < {_PARAM_MAX_USER}
    """,
)
def chsql_positional_params_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's exact parameterized-count shape
    (`hashes_test.go:192-196`: ``SELECT count() FROM ... WHERE x = ?``
    with driver-bound args), run through the dialect path with
    engine-side positional binding — never string splicing.
    """
    return run_sql(
        spark,
        "SELECT count() AS n FROM events WHERE event_type = ? AND user_id < ?",
        sf_dir,
        dialect="clickhouse",
        params=[_PARAM_TYPE, _PARAM_MAX_USER],
    )


@query(
    "chsql_final_sample_latest_state",
    oracle=f"""
    WITH sampled AS (
      SELECT * FROM events
      WHERE {_sql_bucket("user_id", _SAMPLE_SPACE, "")}
            < {_FINAL_SAMPLE_THRESH}
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY event_id DESC) AS __rn
        FROM sampled
      ) w WHERE __rn = 1
    )
    SELECT event_type, COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM latest GROUP BY event_type
    """,
)
def chsql_final_sample_latest_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Current state per event type over a deterministic 25% keyed
    sample, written as the ClickHouse read idiom ``FROM events FINAL
    SAMPLE 0.25`` and executed through ``translate()``.

    FINAL collapses to latest-row-per-(user_id, event_type) using
    event_id as the version (unique, so the collapse is
    deterministic); SAMPLE becomes the engine-portable sha2 hash
    filter on the DDL-declared sampling key. The sample predicate sits
    INSIDE the window subquery — sample-then-merge, ClickHouse's own
    physical-read order — and pushes to the scan; the only shuffle is
    the window's key partition. All aggregates (count, distinct count,
    min/max) are order-independent.
    """
    return run_sql(
        spark,
        f"""
        SELECT event_type, count() AS n_rows,
               uniqExact(user_id) AS n_users,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM events FINAL SAMPLE {_FINAL_SAMPLE_FRAC}
        GROUP BY event_type
        """,
        sf_dir,
        dialect="clickhouse",
        sample_keys={"events": "user_id"},
        final_keys={"events": (("user_id", "event_type"), "event_id")},
    )


_WF_WINDOW_S = 21600  # 6 h, matching the window_funnel_levels family
_WF_WINDOW_US = _WF_WINDOW_S * 1_000_000


@query(
    "chsql_window_funnel_default",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsm,
        CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                        ELSE 3 END AS stage
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), nxt AS (
      SELECT user_id, tsm, stage,
        MIN(CASE WHEN stage = 2 THEN tsm END) OVER (
          PARTITION BY user_id ORDER BY tsm
          RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n2,
        MIN(CASE WHEN stage = 3 THEN tsm END) OVER (
          PARTITION BY user_id ORDER BY tsm
          RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n3
      FROM ev
    ), s2map AS (
      SELECT user_id, tsm, MIN(n3) AS n3
      FROM nxt WHERE stage = 2 GROUP BY 1, 2
    ), levels AS (
      SELECT s.user_id,
        CASE
          WHEN s.n2 IS NOT NULL AND m.n3 IS NOT NULL
               AND m.n3 - s.tsm <= {_WF_WINDOW_US} THEN 3
          WHEN s.n2 IS NOT NULL
               AND s.n2 - s.tsm <= {_WF_WINDOW_US} THEN 2
          ELSE 1
        END AS lvl
      FROM (SELECT * FROM nxt WHERE stage = 1) s
      LEFT JOIN s2map m ON m.user_id = s.user_id AND m.tsm = s.n2
    ), per_user AS (
      SELECT au.user_id, COALESCE(MAX(l.lvl), 0) AS level
      FROM (SELECT DISTINCT user_id FROM events) au
      LEFT JOIN levels l ON l.user_id = au.user_id
      GROUP BY au.user_id
    )
    SELECT level, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY level ORDER BY level
    """,
)
def chsql_window_funnel_default(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Users per deepest view -> click -> purchase level within 6 h,
    written as ClickHouse ``windowFunnel(w)(ts, c1, c2, c3)`` (DEFAULT
    mode — equal timestamps allowed, unlike ``window_funnel_levels``'s
    strict_increase shape) and executed through ``translate()``.

    The translation is ClickHouse's own chain-start fold as one
    ``aggregate()`` expression over the group's time-sorted (ts,
    level) pairs (`plans.chsql._window_funnel_expr`); the oracle is
    the order-independent equivalent formulation — a level-k chain
    exists iff the earliest next-stage successor chain off some
    level-1 event completes within the window — so the two sides
    share no code or algorithm shape. Group state is the user's
    matching events, exactly what ClickHouse's aggregate holds.
    """
    return run_sql(
        spark,
        f"""
        SELECT lvl AS level, count() AS n_users
        FROM (SELECT user_id,
                windowFunnel({_WF_WINDOW_S})(ts,
                  event_type = 'view', event_type = 'click',
                  event_type = 'purchase') AS lvl
              FROM events
              GROUP BY user_id)
        GROUP BY lvl
        ORDER BY lvl
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_retention_seq_counts",
    oracle="""
    WITH pu AS (
      SELECT user_id,
        MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f1,
        MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f2,
        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f3
      FROM events GROUP BY user_id
    ), seqs AS (
      SELECT user_id,
        string_agg(CASE WHEN event_type = 'view' THEN 'a' ELSE 'b' END,
                   '' ORDER BY CAST(ts AS TIMESTAMP),
                   CASE WHEN event_type = 'view' THEN 'a' ELSE 'b' END)
          AS s
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY user_id
    )
    SELECT CAST(SUM(pu.f1) AS BIGINT) AS n_anchor,
           CAST(SUM(pu.f2 * pu.f1) AS BIGINT) AS n_clicked,
           CAST(SUM(pu.f3 * pu.f1) AS BIGINT) AS n_purchased,
           CAST(SUM(COALESCE(
             length(regexp_extract_all(seqs.s, 'ab')), 0)) AS BIGINT)
             AS n_view_click_chains
    FROM pu LEFT JOIN seqs ON seqs.user_id = pu.user_id
    """,
)
def chsql_retention_seq_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohort retention totals plus non-overlapping view->click chain
    counts, written as ClickHouse ``retention(c1, c2, c3)`` +
    ``sequenceCount('(?1)(?2)')(ts, c1, c2)`` and executed through
    ``translate()``.

    retention() lowers to per-condition max flags gated by the anchor
    (a pure aggregate expression, one shuffle); sequenceCount lowers
    to leftmost non-overlapping regex matches over the time-ordered
    condition-character string. arrayElement keeps ClickHouse's
    1-based indexing through the element_at rewrite — a raw ``r[1]``
    would silently read the SECOND element on the Spark side. The
    oracle recomputes both from first principles (flag algebra;
    string_agg + regexp_extract_all with the same (ts, letter)
    tiebreak as the translated struct sort).
    """
    return run_sql(
        spark,
        """
        SELECT CAST(sum(arrayElement(r, 1)) AS BIGINT) AS n_anchor,
               CAST(sum(arrayElement(r, 2)) AS BIGINT) AS n_clicked,
               CAST(sum(arrayElement(r, 3)) AS BIGINT) AS n_purchased,
               CAST(sum(sc) AS BIGINT) AS n_view_click_chains
        FROM (SELECT user_id,
                retention(event_type = 'view', event_type = 'click',
                          event_type = 'purchase') AS r,
                sequenceCount('(?1)(?2)')(ts,
                  event_type = 'view', event_type = 'click') AS sc
              FROM events GROUP BY user_id)
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query("chsql_window_funnel_windowed")  # oracle shared below
def chsql_window_funnel_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME ClickHouse windowFunnel query as
    `chsql_window_funnel_default`, executed through the round-8
    ``funnel_windowed=True`` scale hint: the per-user funnel is
    emitted as the RANGE-window cascade (no per-group collect_list
    state) and the level histogram is aggregated on top. Default-mode
    cascade == fold is a proved equivalence (plans.chsql.
    _window_funnel_windowed's docstring + the random-groups test);
    sharing `chsql_window_funnel_default`'s oracle puts that proof
    under the driver's hash gate too — a third formulation (DuckDB's
    order-independent successor chains) agreeing with both.
    """
    from clickhouse_batcher_spark.plans.chsql import translate
    from clickhouse_batcher_spark.tables import register_views

    inner = translate(
        f"""
        SELECT user_id, windowFunnel({_WF_WINDOW_S})(ts,
          event_type = 'view', event_type = 'click',
          event_type = 'purchase') AS lvl
        FROM events GROUP BY user_id
        """,
        funnel_windowed=True,
    )
    register_views(spark, sf_dir)
    return spark.sql(
        f"SELECT lvl AS level, CAST(count(*) AS BIGINT) AS n_users "
        f"FROM ({inner}) GROUP BY lvl ORDER BY lvl"
    )


ORACLES["chsql_window_funnel_windowed"] = ORACLES[
    "chsql_window_funnel_default"
]


@query(
    "chsql_state_merge_rollup",
    oracle="""
    WITH st AS (
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, user_id,
             SUM(CAST(value AS DECIMAL(18,2))) AS s,
             COUNT(*) AS c,
             MAX(value) AS mx
      FROM events GROUP BY day, user_id
    )
    SELECT day,
           CAST(SUM(s) AS DOUBLE) AS total_value,
           CAST(SUM(c) AS BIGINT) AS n_events,
           MAX(mx) AS max_value,
           CAST(SUM(s) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS mean_value
    FROM st GROUP BY day ORDER BY day
    """,
)
def chsql_state_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse's two-level AggregatingMergeTree idiom through the
    round-12 scalar ``-State``/``-Merge`` promotion: the inner query
    keeps per-(day, user) PARTIAL states (``sumState``/``countState``/
    ``maxState``/``avgState``), the outer folds them per day with the
    matching ``-Merge`` combinators — the materialized-view pattern a
    reference user runs for incremental rollups. The translation is
    exact algebra (scalar states are portable: sum->sum, count->sum,
    max->max, avg->(sum, count) struct), so the whole pipeline stays
    one Spark two-level hash aggregate — partial agg map-side, one
    shuffle per level, no UDFs, scale-safe at any SF.

    Determinism: the day key is a timestamp-typed date_trunc (the
    repo's day-column convention); value routes through
    ``toDecimal64(value, 2)``
    (exact decimal sums on both engines, the repo's dec() contract);
    the mean is double/double IEEE division of exact operands
    (dec_avg discipline). Sketch states (uniqState, ...) stay loud —
    their binary formats are engine-internal.
    """
    return run_sql(
        spark,
        """
        SELECT day,
               toFloat64(sumMerge(s)) AS total_value,
               countMerge(c) AS n_events,
               maxMerge(mx) AS max_value,
               avgMerge(av) AS mean_value
        FROM (
          SELECT toStartOfDay(ts) AS day, user_id,
                 sumState(toDecimal64(value, 2)) AS s,
                 countState() AS c,
                 maxState(value) AS mx,
                 avgState(toDecimal64(value, 2)) AS av
          FROM events
          GROUP BY day, user_id
        )
        GROUP BY day
        ORDER BY day
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_bounding_ratio_by_type",
    oracle="""
    SELECT event_type,
           (arg_max(value, event_id) - arg_min(value, event_id)) /
             (CAST(MAX(event_id) AS DOUBLE) - CAST(MIN(event_id) AS DOUBLE))
             AS slope,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def chsql_bounding_ratio_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``boundingRatio(x, y)`` — the slope between a group's leftmost
    and rightmost points — through the round-12 promotion: it lowers
    to the closed form ``(max_by(y, x) - min_by(y, x)) / (max(x) -
    min(x))``, four ordinary aggregates in ONE hash-aggregate pass
    (the same shape operators/chagg.bounding_ratio_by_user proved
    out). x = event_id is unique per group, so max_by/min_by are
    deterministic (ClickHouse's own boundingRatio is order-dependent
    under x ties). Values: y is exact 2dp doubles, x integers cast to
    double — one IEEE division of exact operands, no rounding needed
    for the hash gate.
    """
    return run_sql(
        spark,
        """
        SELECT event_type,
               boundingRatio(toFloat64(event_id), value) AS slope,
               count() AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_limit_by_paged",
    oracle="""
    SELECT event_type, user_id, n_events FROM (
      SELECT event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, user_id)
               AS __rn
      FROM events GROUP BY event_type, user_id
    ) ranked WHERE __rn > 3 AND __rn <= 6
    """,
)
def chsql_limit_by_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND page of users per event type — ClickHouse's
    ``LIMIT offset, n BY`` (r13 promotion of the offset forms; the
    ``LIMIT n OFFSET off BY`` spelling translates identically).

    Lowers to the same single row_number window as ``LIMIT n BY``
    with the rank range ``off+1..off+n`` — one hash shuffle on the
    by-tuple, one counter of state per group, scale-safe at any
    group count. Ties break on user_id so the page boundary is
    deterministic (the translation's own LIMIT BY contract: a
    top-level ORDER BY is required, loud otherwise)."""
    return run_sql(
        spark,
        """
        SELECT event_type, user_id, count() AS n_events
        FROM events
        GROUP BY event_type, user_id
        ORDER BY n_events DESC, user_id
        LIMIT 3, 3 BY event_type
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_week_rollup",
    oracle="""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP)::DATE AS d, value FROM events
    ), parts AS (
      SELECT d, value,
             dayofyear(d) AS doy,
             1 + ((7 - dayofweek(date_trunc('year', d)::DATE)) % 7)
               AS fs,
             (date_trunc('year', d) - INTERVAL 1 YEAR)::DATE
               + CAST((7 - dayofweek((date_trunc('year', d)
                   - INTERVAL 1 YEAR)::DATE)) % 7 AS INTEGER)
               AS fs_prev
      FROM e
    ), keyed AS (
      SELECT value,
             CAST(CASE WHEN doy < fs
                  THEN (year(d) - 1) * 100
                       + (date_diff('day', fs_prev, d) // 7 + 1)
                  ELSE year(d) * 100 + ((doy - fs) // 7 + 1)
                  END AS BIGINT) AS yw,
             CAST(CASE WHEN doy < fs THEN 0
                  ELSE (doy - fs) // 7 + 1 END AS BIGINT) AS wk,
             CAST(isoyear(d) * 100 + weekofyear(d) AS BIGINT)
               AS iso_yw
      FROM parts
    )
    SELECT yw, wk, iso_yw, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM keyed GROUP BY yw, wk, iso_yw ORDER BY yw, iso_yw
    """,
)
def chsql_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event rollup keyed three ways — ``toYearWeek(ts)`` /
    ``toWeek(ts)`` (ClickHouse's default mode 0: Sunday-start,
    first-Sunday week 1, week-0 days attributed to the previous
    year's last week by YEARWEEK) and ``toYearWeek(ts, 3)`` (ISO) —
    through the r13 promotion of the week-numbering family.

    The promotion lowers each to a closed form over dayofyear and
    the year's first-Sunday anchor (no joins, no UDFs — stays inside
    whole-stage codegen), so the rollup is one scan + one hash
    aggregate at any scale. The DuckDB oracle implements the SAME
    MySQL WEEK/YEARWEEK rules from DuckDB's own date parts
    (dayofweek there is 0=Sunday vs Spark's 1=Sunday — independent
    spellings, same table), with the repo's DECIMAL discipline on
    the value average."""
    return run_sql(
        spark,
        """
        SELECT toInt64(toYearWeek(ts)) AS yw,
               toInt64(toWeek(ts)) AS wk,
               toInt64(toYearWeek(ts, 3)) AS iso_yw,
               count() AS n_events,
               round(toFloat64(sum(toDecimal64(value, 2))) / count(), 6)
                 AS avg_value
        FROM events
        GROUP BY yw, wk, iso_yw
        ORDER BY yw, iso_yw
        """,
        sf_dir,
        dialect="clickhouse",
    )


@query(
    "chsql_quantile_bands",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             CAST(l_quantity AS DOUBLE) AS q
      FROM lineitem
    ), agg AS (
      SELECT rf, ls, CAST(COUNT(*) AS BIGINT) AS n_items,
             ROUND(quantile_cont(q, 0.5), 6) AS med_inc,
             list_sort(list(q)) AS a
      FROM base GROUP BY rf, ls
    ), k AS (
      SELECT rf, ls, n_items, med_inc, a,
             CAST(floor(0.25 * (n_items + 1)) AS BIGINT) AS n25,
             0.25 * (n_items + 1) AS h25,
             CAST(floor(0.75 * (n_items + 1)) AS BIGINT) AS n75,
             0.75 * (n_items + 1) AS h75
      FROM agg
    )
    SELECT rf, ls, n_items, med_inc,
           ROUND(CASE WHEN n25 >= n_items THEN a[n_items]
                      WHEN n25 < 1 THEN a[1]
                      ELSE a[n25] + (h25 - n25) * (a[n25 + 1] - a[n25])
                 END, 6) AS q25_exc,
           ROUND(CASE WHEN n75 >= n_items THEN a[n_items]
                      WHEN n75 < 1 THEN a[1]
                      ELSE a[n75] + (h75 - n75) * (a[n75 + 1] - a[n75])
                 END, 6) AS q75_exc
    FROM k ORDER BY rf, ls
    """,
)
def chsql_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(returnflag, linestatus) quantity bands through the r13
    promotion of the INTERPOLATING exact-quantile pair:
    ``quantileExactInclusive`` (== Excel PERCENTILE.INC ==
    percentile_cont — lowered to Spark's exact ``percentile()``) and
    ``quantileExactExclusive`` (== PERCENTILE.EXC, the Hyndman-Fan R6
    ``h = p*(n+1)`` closed form over the sorted group).

    Value discipline: l_quantity is integer-valued, so every
    interpolated quantile lands on an exact quarter (h's fraction is
    a multiple of 0.25 for p in {.25, .5, .75}) — bit-identical
    across engines regardless of interpolation formula order;
    round(6) is belt-and-braces per the house invariant. The DuckDB
    oracle derives INC from DuckDB's OWN quantile_cont (independent
    implementation) and EXC from the documented R6 formula over
    list_sort (independent spelling of the same public rule — the
    week-rollup oracle precedent).

    Scale contract: the exact family materializes each group
    (ClickHouse's own quantileExact* is O(group) memory too) — 6
    bounded groups here; unbounded-cardinality quantiles at 100 TB
    belong to the translated GK/TDigest approx spellings.
    """
    return run_sql(
        spark,
        """
        SELECT l_returnflag AS rf, l_linestatus AS ls,
               count() AS n_items,
               round(quantileExactInclusive(0.5)
                     (toFloat64(l_quantity)), 6) AS med_inc,
               round(quantileExactExclusive(0.25)
                     (toFloat64(l_quantity)), 6) AS q25_exc,
               round(quantileExactExclusive(0.75)
                     (toFloat64(l_quantity)), 6) AS q75_exc
        FROM lineitem
        GROUP BY rf, ls
        ORDER BY rf, ls
        """,
        sf_dir,
        dialect="clickhouse",
    )
