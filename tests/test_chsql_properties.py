"""Property-based tests for the ClickHouse-SQL transpiler: random
queries composed from the supported dialect surface must (1) translate
to a fixpoint (idempotence — the mixed-dialect safety guard), (2) stay
untouched inside string literals, and (3) actually parse and run on
Spark after translation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_batcher_spark.plans.chsql import translate
from clickhouse_batcher_spark.tables import run_sql

_NUM_COLS = ("value", "user_id")
_SCALARS = (
    lambda c: f"toYear(ts)",
    lambda c: f"toStartOfHour(ts)",
    lambda c: f"lengthUTF8(event_type)",
    lambda c: f"intDiv({c}, 7)",
    lambda c: f"modulo({c}, 5)",
    lambda c: f"bitAnd(user_id, 255)",
    lambda c: f"JSONExtractInt(props, 'k')",
    lambda c: f"multiIf({c} > 10, 'hi', {c} > 5, 'mid', 'lo')",
    lambda c: f"ifNull(props, '{{}}')",
    lambda c: f"formatDateTime(ts, '%Y-%m')",
    lambda c: f"dateDiff('hour', ts, now())",
    lambda c: f"addDays(ts, 2)",
    lambda c: f"startsWith(event_type, 'c')",
)
_AGGS = (
    lambda c: "count()",
    lambda c: f"sum({c})",
    lambda c: f"uniq({c})",
    lambda c: f"uniqExact({c})",
    lambda c: f"countIf({c} > 3)",
    lambda c: f"sumIf({c}, event_type = 'click')",
    lambda c: f"anyIf({c}, {c} > 0)",
    lambda c: f"quantile(0.9)({c})",
    lambda c: f"quantilesExact(0.25, 0.75)({c})",
    lambda c: f"argMax(event_type, ts)",
    lambda c: f"stddevPop({c})",
    lambda c: f"medianExact({c})",
)
_CONDS = (
    "value > 12",
    "event_type = 'view'",
    "isNotNull(props)",
    "notEmpty(event_type)",
    "modulo(user_id, 3) = 1",
)


@st.composite
def ch_query(draw):
    col = draw(st.sampled_from(_NUM_COLS))
    agg_mode = draw(st.booleans())
    if agg_mode:
        items = [
            f(col)
            for f in draw(
                st.lists(st.sampled_from(_AGGS), min_size=1, max_size=3)
            )
        ]
        sel = ", ".join(
            f"{e} AS c{i}" for i, e in enumerate(items)
        )
        q = f"SELECT event_type, {sel} FROM events"
        if draw(st.booleans()):
            q += f" WHERE {draw(st.sampled_from(_CONDS))}"
        q += " GROUP BY event_type"
    else:
        items = [
            f(col)
            for f in draw(
                st.lists(st.sampled_from(_SCALARS), min_size=1, max_size=4)
            )
        ]
        sel = ", ".join(f"{e} AS c{i}" for i, e in enumerate(items))
        q = f"SELECT {sel} FROM events"
        if draw(st.booleans()):
            q += f" WHERE {draw(st.sampled_from(_CONDS))}"
    return q


@given(q=ch_query())
# Pure-python suites run at 500 examples (VERDICT r5 task 8): the
# round-5 run at this depth caught a real intDiv-on-float bug, so the
# depth is part of the regression net, not ceremony.
@settings(max_examples=500, deadline=None)
def test_translate_reaches_fixpoint(q):
    once = translate(q)
    assert translate(once) == once


@given(
    parts=st.lists(
        st.sampled_from(
            list("abc ()%,.*'")
            + ["count(", "sumIf(", "FINAL", "SAMPLE ", "LIMIT 2 BY "]
        ),
        min_size=0,
        max_size=6,
    )
)
@settings(max_examples=500, deadline=None)
def test_literals_never_rewritten(parts):
    """Whatever dialect-looking text sits inside a string literal, it
    must come out byte-identical (quote-doubled on the way in)."""
    sql_lit = "'" + "".join(parts).replace("'", "''") + "'"
    q = f"SELECT count() FROM events WHERE event_type = {sql_lit}"
    out = translate(q)
    assert out == f"SELECT count(*) FROM events WHERE event_type = {sql_lit}"


@given(q=ch_query())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_translated_queries_run_on_spark(spark, sf_dir, q):
    rows = run_sql(spark, q, sf_dir, dialect="clickhouse").limit(3).collect()
    assert rows is not None


@st.composite
def ch_array_literal(draw):
    """Random ClickHouse [..] literal (flat, or uniformly nested one
    level — heterogeneous nesting is invalid in BOTH dialects) plus
    its Python value."""
    if draw(st.booleans()):
        items = draw(
            st.lists(st.integers(-99, 99), min_size=0, max_size=4)
        )
        sp = draw(st.sampled_from(["", " ", "  "]))
        return (
            "[" + sp + (", ".join(str(i) for i in items)) + sp + "]",
            list(items),
        )
    subs = draw(
        st.lists(
            st.lists(st.integers(-99, 99), min_size=1, max_size=3),
            min_size=1,
            max_size=3,
        )
    )
    return (
        "["
        + ", ".join(
            "[" + ", ".join(str(i) for i in sub) + "]" for sub in subs
        )
        + "]",
        [list(sub) for sub in subs],
    )


@given(lit=ch_array_literal())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bracket_literals_evaluate(spark, sf_dir, lit):
    """Any ClickHouse [..] literal (nested, spaced, empty) must
    translate to a Spark array(..) that evaluates to the same Python
    value; appending a 1-based subscript must pick the right element."""
    sql_lit, value = lit

    def norm(v):
        if hasattr(v, "__iter__") and not isinstance(v, str):
            return [norm(x) for x in v]
        return v

    got = run_sql(
        spark, f"SELECT {sql_lit} AS a", sf_dir, dialect="clickhouse"
    ).collect()[0]["a"]
    # an empty literal has no element type: comparing lengths suffices
    if value:
        assert norm(got) == value
    else:
        assert got is None or list(got) == []
    if value:
        got1 = run_sql(
            spark,
            f"SELECT element_at({sql_lit}, 1) AS a",
            sf_dir,
            dialect="clickhouse",
        ).collect()[0]["a"]
        assert norm(got1) == value[0]


@given(
    idx=st.integers(-3, 3).filter(lambda i: i != 0),
    vals=st.lists(st.integers(-99, 99), min_size=3, max_size=3),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_integer_subscripts_are_one_based(spark, sf_dir, idx, vals):
    """ident[n] must follow ClickHouse subscript semantics: 1-based
    from the front, negative from the back."""
    got = run_sql(
        spark,
        f"SELECT arr[{idx}] AS v FROM "
        f"(SELECT array({', '.join(map(str, vals))}) AS arr)",
        sf_dir,
        dialect="clickhouse",
    ).collect()[0]["v"]
    want = vals[idx - 1] if idx > 0 else vals[idx]
    assert got == want


# ---------------------------------------------------------------------------
# Logic-function chains vs keyword usage (batch 9's riskiest rewrite:
# the same text "AND (" can be a variadic and() call or the SQL
# keyword — a wrong guess silently changes the predicate)
# ---------------------------------------------------------------------------
@st.composite
def bool_expr(draw, depth=0):
    """Random boolean expression mixing ClickHouse's function-form
    and(...)/or(...)/xor(...)/not(...) with keyword AND/OR/NOT and
    parenthesized literals; returns (ch_sql, python_value)."""
    if depth >= 3 or draw(st.booleans()):
        v = draw(st.booleans())
        return ("true" if v else "false"), v
    kind = draw(st.sampled_from(["and", "or", "xor", "not", "kw_and",
                                 "kw_or", "paren"]))
    if kind == "not":
        s, v = draw(bool_expr(depth + 1))
        return f"not({s})", (not v)
    if kind == "paren":
        s, v = draw(bool_expr(depth + 1))
        return f"({s})", v
    n = draw(st.integers(2, 4))
    parts = [draw(bool_expr(depth + 1)) for _ in range(n)]
    ss = [p[0] for p in parts]
    vs = [p[1] for p in parts]
    if kind == "and":
        return f"and({', '.join(ss)})", all(vs)
    if kind == "or":
        return f"or({', '.join(ss)})", any(vs)
    if kind == "xor":
        acc = vs[0]
        for x in vs[1:]:
            acc = acc != x
        return f"xor({', '.join(ss)})", acc
    kw = " AND " if kind == "kw_and" else " OR "
    joined = kw.join(f"({s})" for s in ss)
    return f"({joined})", all(vs) if kind == "kw_and" else any(vs)


@given(e=bool_expr())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_logic_chain_rewrite_truth_table(spark, e):
    ch, want = e
    q = f"SELECT {ch} AS r"
    t = translate(q)
    assert translate(t) == t  # fixpoint
    got = spark.sql(t).collect()[0]["r"]
    assert got is want or got == want, f"{q!r} -> {t!r}: {got} != {want}"


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    p_pct=st.integers(min_value=0, max_value=100),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_quantile_exact_weighted_reference(spark, data, p_pct):
    """quantileExactWeighted vs a first-principles Python reference of
    ClickHouse's element selection: sort distinct values, return the
    FIRST whose cumulative weight reaches p * total_weight (last
    element as the it==end backstop). Random multisets sweep the
    crossing levels where the round-7 percentile() translation
    silently interpolated."""
    p = p_pct / 100.0
    pairs = sorted(data)
    total = sum(w for _, w in pairs)
    thr = p * total
    acc = 0.0
    want = pairs[-1][0]
    for v, w in pairs:
        acc += w
        if acc >= thr:
            want = v
            break
    rows = " UNION ALL ".join(f"SELECT {v} AS v, {w} AS w" for v, w in data)
    q = f"SELECT quantileExactWeighted({p})(v, w) AS r FROM ({rows})"
    t = translate(q)
    assert translate(t) == t  # fixpoint
    got = spark.sql(t).collect()[0]["r"]
    assert got == want, f"p={p} data={data}: {got} != {want}"
