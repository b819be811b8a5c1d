"""Differential dialect testing against a REAL ClickHouse server
(VERDICT r7 task 4) — docker-gated, skip-if-absent.

Both real silent divergences the transpiler has shipped
(toStartOfWeek's week-start mode, round 4's toDayOfWeek off-by-one)
lived in builder-authored expectations: the test asserted what the
builder believed ClickHouse does. This harness removes the belief:
each corpus entry is ONE query executed natively on ClickHouse (HTTP
interface, JSONCompact) AND on Spark after ``translate()``, values
compared row-by-row. Start a server to activate::

    docker run -d --name ch -p 8123:8123 clickhouse/clickhouse-server:23.3

The corpus leans on the date/time family (where both real bugs
lived), then aggregates with engine-specific conventions (skew/kurt
Samp, quantileExactWeighted element selection), sequences, arrays,
strings, URL/JSON scalars. Entries use engine-portable literal
sources (SELECT ... UNION ALL) so the SAME text runs on both sides —
the only transformation under test is ``translate()`` itself.
"""

from __future__ import annotations

import json
import math
import urllib.error
import urllib.request

import pytest

from clickhouse_batcher_spark.plans.chsql import translate

CH_URL = "http://localhost:8123"


def _ch_available() -> bool:
    try:
        with urllib.request.urlopen(f"{CH_URL}/ping", timeout=2) as r:
            return r.read().strip() == b"Ok."
    except (urllib.error.URLError, OSError):
        return False


pytestmark = pytest.mark.skipif(
    not _ch_available(),
    reason="no ClickHouse server on :8123 "
    "(start one: docker run -d -p 8123:8123 "
    "clickhouse/clickhouse-server:23.3)",
)


def _ch_rows(sql: str) -> list[list]:
    url = (
        f"{CH_URL}/?default_format=JSONCompact"
        f"&output_format_json_quote_64bit_integers=0"
    )
    with urllib.request.urlopen(
        url, data=sql.encode("utf-8"), timeout=30
    ) as r:
        return json.loads(r.read())["data"]


def _norm(v):
    """Engine-neutral value form: bools to ints (CH UInt8), datetimes
    and dates to their canonical strings, floats rounded to absorb
    sub-ulp formatting differences, lists recursively."""
    import datetime
    import decimal

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in sorted(v.items())}
    if isinstance(v, decimal.Decimal):
        return _norm(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, str):
        # CH JSON renders DateTime as 'YYYY-MM-DD hh:mm:ss' already;
        # trim a trailing '.000000' Spark sometimes keeps on strings
        return v[:-7] if v.endswith(".000000") else v
    return v


# ---------------------------------------------------------------------------
# The corpus. Every entry must TRANSLATE (loud families don't belong
# here) and be deterministic. One query = one differential check.
# ---------------------------------------------------------------------------
_T = "toDateTime('2024-03-15 07:08:09')"  # a Friday
_D8 = (
    "(SELECT toDateTime('2024-03-15 07:08:09') AS t, 5 AS n, "
    "1.5 AS f, 'Hello World' AS s)"
)
_NUMS = (
    "(SELECT 3.0 AS v, 1 AS w UNION ALL SELECT 5.0, 1 "
    "UNION ALL SELECT 9.0, 2)"
)
_SEQ = (
    "(SELECT toDateTime('2024-01-01 10:00:00') AS ts, 'A' AS et "
    "UNION ALL SELECT toDateTime('2024-01-01 10:10:00'), 'B' "
    "UNION ALL SELECT toDateTime('2024-01-01 10:20:00'), 'C' "
    "UNION ALL SELECT toDateTime('2024-01-01 12:00:00'), 'A')"
)

DIFFERENTIAL_CORPUS = [
    # --- date/time family (both historical silent divergences) ---
    f"SELECT toStartOfWeek({_T}) AS r",
    f"SELECT toStartOfWeek({_T}, 0) AS r",
    f"SELECT toStartOfWeek({_T}, 1) AS r",
    f"SELECT toStartOfWeek(toDateTime('2024-03-10 01:00:00')) AS r",
    f"SELECT toDayOfWeek({_T}) AS r",
    f"SELECT toMonday({_T}) AS r",
    f"SELECT toStartOfMinute({_T}) AS r, toStartOfHour({_T}) AS h",
    f"SELECT toStartOfDay({_T}) AS r, toStartOfMonth({_T}) AS m",
    f"SELECT toStartOfQuarter({_T}) AS r, toStartOfYear({_T}) AS y",
    f"SELECT toStartOfFiveMinutes({_T}) AS a, "
    f"toStartOfFifteenMinutes({_T}) AS b",
    f"SELECT toYYYYMM({_T}) AS a, toYYYYMMDD({_T}) AS b",
    f"SELECT toQuarter({_T}) AS a, toDayOfYear({_T}) AS b, "
    f"toISOWeek({_T}) AS c",
    f"SELECT toUnixTimestamp({_T}) AS r",
    f"SELECT toUnixTimestamp64Milli(toDateTime64('1970-01-01 "
    f"00:00:01.500', 3)) AS r",
    f"SELECT dateDiff('day', toDate('2024-01-01'), toDate('2024-03-15')) AS r",
    f"SELECT dateDiff('month', toDateTime('2024-01-31 23:00:00'), "
    f"toDateTime('2024-02-01 01:00:00')) AS r",
    f"SELECT age('day', toDateTime('2024-01-01 12:00:00'), "
    f"toDateTime('2024-01-03 11:00:00')) AS r",
    f"SELECT addDays({_T}, 3) AS a, subtractHours({_T}, 8) AS b",
    f"SELECT dateAdd(HOUR, 2, {_T}) AS r",
    f"SELECT timestampAdd({_T}, INTERVAL 90 MINUTE) AS r",
    f"SELECT toTime({_T}) AS r",
    f"SELECT toLastDayOfMonth({_T}) AS r",
    f"SELECT toStartOfInterval({_T}, INTERVAL 30 MINUTE) AS r",
    f"SELECT formatDateTime({_T}, '%Y-%m-%d %H:%M:%S') AS r",
    f"SELECT yesterday() >= toDate('2020-01-01') AS r",
    f"SELECT toDaysSinceYearZero(toDate('2024-03-15')) AS r",
    # r13 promotions: default (mode 0) and ISO (mode 3) week numbering
    # at the year-boundary cases where the modes disagree
    "SELECT toWeek(toDate('2024-01-01')) AS a, "
    "toWeek(toDate('2024-01-07')) AS b, "
    "toWeek(toDate('2023-01-01')) AS c, "
    "toWeek(toDate('2024-12-31')) AS d, "
    "toWeek(toDate('2024-06-15'), 3) AS e",
    "SELECT toYearWeek(toDate('1987-01-01')) AS a, "
    "toYearWeek(toDate('2024-01-07')) AS b, "
    "toYearWeek(toDate('2023-01-01')) AS c, "
    "toYearWeek(toDate('2024-06-15'), 3) AS d, "
    "toYearWeek(toDate('2023-01-01'), 3) AS e",
    # r13 promotion: extractGroups (literal pattern, static expansion)
    r"SELECT extractGroups('order-123-ABC', '(\\d+)-([A-Z]+)') AS a, "
    r"extractGroups('no match here', '(\\d+)') AS b, "
    r"extractGroups('k=v', '(?:k)=(\\w+)') AS c",
    # r13 promotion: LIMIT offset forms (comma + OFFSET keyword)
    "SELECT g, v FROM (SELECT 1 AS g, 10 AS v UNION ALL SELECT 1, 20 "
    "UNION ALL SELECT 1, 30 UNION ALL SELECT 1, 40 UNION ALL "
    "SELECT 2, 5 UNION ALL SELECT 2, 6) t ORDER BY v DESC "
    "LIMIT 1, 2 BY g",
    "SELECT g, v FROM (SELECT 1 AS g, 10 AS v UNION ALL SELECT 1, 20 "
    "UNION ALL SELECT 1, 30 UNION ALL SELECT 2, 5) t ORDER BY v ASC "
    "LIMIT 1 OFFSET 1 BY g",
    # --- aggregates with engine-specific conventions ---
    f"SELECT round(skewPop(v), 9) AS a, round(skewSamp(v), 9) AS b "
    f"FROM {_NUMS}",
    f"SELECT round(kurtPop(v), 9) AS a, round(kurtSamp(v), 9) AS b "
    f"FROM {_NUMS}",
    f"SELECT quantileExactWeighted(0.5)(v, w) AS r FROM "
    f"(SELECT 1 AS v, 1 AS w UNION ALL SELECT 2, 1)",
    f"SELECT quantileExactWeighted(0.5)(v, w) AS r FROM {_NUMS}",
    f"SELECT quantileExactWeighted(0)(v, w) AS lo, "
    f"quantileExactWeighted(1)(v, w) AS hi FROM {_NUMS}",
    f"SELECT quantileExact(0.5)(v) AS r FROM {_NUMS}",
    f"SELECT median(v) AS r FROM {_NUMS}",
    f"SELECT argMax(v, w) AS a, argMin(v, w) AS b FROM {_NUMS}",
    f"SELECT countIf(v > 3) AS a, sumIf(v, w = 1) AS b, "
    f"avgIf(v, v > 0) AS c FROM {_NUMS}",
    f"SELECT uniqExact(v) AS r FROM {_NUMS}",
    f"SELECT sumKahan(v) AS r FROM {_NUMS}",
    f"SELECT avgWeighted(v, w) AS r FROM {_NUMS}",
    f"SELECT groupBitAnd(n) AS a, groupBitOr(n) AS b, groupBitXor(n) "
    f"AS c FROM (SELECT 5 AS n UNION ALL SELECT 7 UNION ALL SELECT 12)",
    f"SELECT simpleLinearRegression(w, v).k AS k FROM {_NUMS}",
    # --- sequences ---
    f"SELECT windowFunnel(3600)(ts, et = 'A', et = 'B', et = 'C') AS r "
    f"FROM {_SEQ}",
    f"SELECT windowFunnel(300)(ts, et = 'A', et = 'B') AS r FROM {_SEQ}",
    f"SELECT retention(et = 'A', et = 'B', et = 'Z') AS r FROM {_SEQ}",
    f"SELECT sequenceMatch('(?1).*(?2)')(ts, et = 'A', et = 'C') AS r "
    f"FROM {_SEQ}",
    f"SELECT sequenceCount('(?1).*(?2)')(ts, et = 'A', et = 'B') AS r "
    f"FROM {_SEQ}",
    # --- arrays / HOFs ---
    "SELECT arrayMap(x -> x * 2, [1, 2, 3]) AS r",
    "SELECT arrayFilter(x -> x % 2 = 0, [1, 2, 3, 4]) AS r",
    "SELECT arraySum([1.5, 2.5]) AS a, arrayAvg([2, 4]) AS b",
    "SELECT arrayMin([3, 1, 2]) AS a, arrayMax([3, 1, 2]) AS b",
    "SELECT arraySort([3, 1, 2]) AS a, arrayReverseSort([1, 3, 2]) AS b",
    "SELECT arrayDistinct([1, 2, 2, 3]) AS r",
    "SELECT arrayCumSum([1, 1, -4, 1]) AS r",
    "SELECT arrayCumSumNonNegative([1, 1, -4, 1]) AS r",
    "SELECT arraySlice([1, 2, 3, 4], 2, 2) AS r",
    "SELECT indexOf([10, 20, 30], 20) AS a, has([1, 2], 2) AS b",
    "SELECT arrayStringConcat(['a', 'b'], '-') AS r",
    "SELECT arrayFirst(x -> x > 1, [1, 2, 3]) AS a, "
    "arrayLast(x -> x < 3, [1, 2, 3]) AS b",
    "SELECT arrayFirstIndex(x -> x > 1, [1, 2, 3]) AS r",
    "SELECT arrayCompact([1, 1, 2, 2, 1]) AS r",
    "SELECT arrayConcat([1], [2, 3]) AS r",
    "SELECT arrayIntersect([1, 2, 3], [2, 3, 4]) AS r",
    "SELECT arrayReduce('sum', [1, 2, 3]) AS r",
    "SELECT arrayEnumerateDense([10, 20, 10]) AS r",
    "SELECT arrayMap((x, y) -> x + y, [1, 2], [10, 20]) AS r",
    "SELECT range(4) AS r, [1, 2, 3][2] AS e",
    "SELECT arrayJaccardIndex([1, 2], [2, 3]) AS r",
    # --- round-12 promotions: scalar -State/-Merge, boundingRatio ---
    f"SELECT sumMerge(s) AS a, countMerge(c) AS b, maxMerge(mx) AS m "
    f"FROM (SELECT w, sumState(v) AS s, countState() AS c, "
    f"maxState(v) AS mx FROM {_NUMS} GROUP BY w)",
    f"SELECT avgMerge(av) AS r FROM "
    f"(SELECT w, avgState(v) AS av FROM {_NUMS} GROUP BY w)",
    f"SELECT boundingRatio(w + v, v) AS r FROM {_NUMS}",
    "SELECT gcd(12, 18) AS a, gcd(0, 7) AS b, gcd(0, 0) AS c, "
    "gcd(-12, 18) AS d, "
    "gcd(7540113804746346429, 4660046610375530309) AS fib",
    "SELECT lcm(4, 6) AS a, lcm(0, 5) AS b, lcm(-4, 6) AS c",
    f"WITH 2 AS k, 10 AS cap SELECT sum(v * k) AS a, "
    f"countIf(v < cap) AS b FROM {_NUMS}",
    # --- strings ---
    "SELECT lengthUTF8('héllo') AS a, lowerUTF8('ABC') AS b",
    "SELECT position('Hello World', 'World') AS r",
    "SELECT positionCaseInsensitive('Hello', 'hELLO') AS r",
    "SELECT substringIndex('a.b.c', '.', 2) AS r",
    "SELECT splitByChar(',', 'a,b,c') AS r",
    "SELECT splitByString(', ', 'a, b, c') AS r",
    "SELECT leftPad('x', 4, '*') AS a, rightPad('x', 3, '*') AS b",
    "SELECT trimBoth('  x  ') AS r",
    "SELECT replaceAll('aaa', 'a', 'b') AS a, "
    "replaceOne('aaa', 'a', 'b') AS b",
    "SELECT replaceRegexpAll('a1b2', '[0-9]', '#') AS r",
    "SELECT countSubstrings('abcabc', 'bc') AS r",
    "SELECT base64Encode('hi') AS a, base64Decode('aGk=') AS b",
    "SELECT startsWith('abc', 'ab') AS a, endsWith('abc', 'bc') AS b",
    "SELECT concatWithSeparator('-', 'a', 'b') AS r",
    "SELECT format('{} and {}', 'a', 'b') AS r",
    "SELECT countMatches('a1b22', '[0-9]') AS r",
    "SELECT hex(MD5('abc')) AS r",
    "SELECT hex(SHA256('abc')) AS r",
    # --- URL family ---
    "SELECT domain('https://spark.apache.org/docs/latest/') AS a, "
    "path('https://spark.apache.org/docs/latest/') AS b",
    "SELECT protocol('https://x.test/a') AS a, "
    "topLevelDomain('https://x.test/a') AS b",
    "SELECT extractURLParameter('http://x.test/?a=1&b=2', 'b') AS r",
    "SELECT cutQueryString('http://x.test/p?a=1') AS r",
    "SELECT netloc('http://u:p@x.test:8080/a') AS r",
    # --- JSON ---
    """SELECT JSONExtractString('{"a": "x"}', 'a') AS r""",
    """SELECT JSONExtractInt('{"a": 7}', 'a') AS r""",
    """SELECT JSONExtractFloat('{"a": 1.5}', 'a') AS r""",
    """SELECT JSONExtractBool('{"a": true}', 'a') AS r""",
    """SELECT JSONHas('{"a": 1}', 'a') AS a,
       isValidJSON('{"a": 1}') AS b""",
    """SELECT visitParamExtractString('{"a": "x"}', 'a') AS r""",
    # --- math / type / misc scalars ---
    "SELECT intDiv(7, 2) AS a, modulo(7, 3) AS b, "
    "intDivOrZero(1, 0) AS c, moduloOrZero(1, 0) AS d",
    "SELECT exp2(10) AS a, intExp2(10) AS b, exp10(3) AS c",
    "SELECT bitAnd(12, 10) AS a, bitOr(12, 10) AS b, "
    "bitXor(12, 10) AS c, bitShiftLeft(1, 4) AS d",
    "SELECT bitCount(255) AS a, bitTest(5, 0) AS b",
    "SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b",
    "SELECT toInt64('42') AS a, toFloat64OrNull('x') AS b, "
    "toInt32OrZero('y') AS c",
    "SELECT toDecimal64('1.23', 2) AS r",
    "SELECT ifNull(NULL, 5) AS a, isNull(NULL) AS b, "
    "isNotNull(1) AS c",
    "SELECT empty('') AS a, notEmpty('x') AS b, ifEmpty('', 'd') AS c",
    "SELECT isFinite(1.0) AS a, isInfinite(1e308 * 10) AS b, "
    "isZeroOrNull(0) AS c",
    "SELECT greatest(1, 2) AS a, least(1, 2) AS b",
    "SELECT and(1 > 0, 2 > 1, 3 > 2) AS a, or(1 > 2, 2 > 1) AS b, "
    "xor(1 > 0, 2 > 1) AS c",
    "SELECT transform(2, [1, 2, 3], ['a', 'b', 'c'], '?') AS r",
    "SELECT IPv4NumToString(3232235777) AS a, "
    "IPv4StringToNum('192.168.1.1') AS b",
    "SELECT isIPv4String('192.168.1.1') AS a, isIPv4String('x') AS b",
    "SELECT mapKeys(map('a', 1, 'b', 2)) AS k, "
    "mapValues(map('a', 1, 'b', 2)) AS v",
    "SELECT tupleElement(tuple(1, 'a'), 2) AS b",
    "SELECT roundToExp2(33) AS a, roundDuration(45) AS b, "
    "roundAge(23) AS c",
    "SELECT number AS n FROM numbers(3) ORDER BY n",
    # --- round-8 expansion: boundary cases in the families above ---
    "SELECT addMonths(toDate('2024-01-31'), 1) AS r",  # month-end clamp
    "SELECT subtractMonths(toDate('2024-03-31'), 1) AS r",
    "SELECT toLastDayOfMonth(toDate('2024-02-01')) AS r",  # leap year
    "SELECT toDayOfYear(toDate('2024-12-31')) AS r",  # 366
    "SELECT toISOWeek(toDate('2023-01-01')) AS r",  # week of prior year
    "SELECT toISOWeek(toDate('2024-01-01')) AS r",
    "SELECT toStartOfWeek(toDate('2024-01-01'), 1) AS r",  # year boundary
    "SELECT toMonday(toDate('2024-01-07')) AS r",  # a Sunday
    "SELECT dateDiff('week', toDate('2024-03-09'), toDate('2024-03-11')) AS r",
    "SELECT dateDiff('year', toDateTime('2023-12-31 23:59:59'), "
    "toDateTime('2024-01-01 00:00:01')) AS r",
    "SELECT age('month', toDate('2024-01-31'), toDate('2024-02-29')) AS r",
    "SELECT toStartOfInterval(toDateTime('2024-03-15 07:08:09'), "
    "INTERVAL 7 MINUTE) AS r",
    "SELECT makeDate(2024, 60) AS a, makeDate(2024, 2, 29) AS b",
    "SELECT makeDateTime(2024, 2, 29, 23, 59, 58) AS r",
    "SELECT toRelativeMonthNum(toDate('2024-03-15')) AS r",
    "SELECT toStartOfTenMinutes(toDateTime('2024-03-15 07:08:09')) AS r",
    "SELECT formatDateTime(toDate('2024-03-15'), '%m/%d/%Y') AS r",
    "SELECT quantilesExact(0.25, 0.5, 0.75)(v) AS r FROM "
    "(SELECT 1.0 AS v UNION ALL SELECT 2.0 UNION ALL SELECT 3.0 "
    "UNION ALL SELECT 4.0)",
    # r13 promotion: the interpolating exact-quantile pair (Excel
    # PERCENTILE.INC/EXC closed forms; the 0.3 case is Microsoft's
    # own documented PERCENTILE.INC example = 1.9)
    "SELECT quantileExactInclusive(0.3)(v) AS a, "
    "quantilesExactInclusive(0.25, 0.75)(v) AS b, "
    "quantileExactExclusive(0.25)(v) AS c, "
    "quantilesExactExclusive(0.25, 0.5)(v) AS d, "
    "quantileExactExclusive(0.01)(v) AS lo, "
    "quantileExactExclusive(0.99)(v) AS hi FROM "
    "(SELECT 1.0 AS v UNION ALL SELECT 2.0 UNION ALL SELECT 3.0 "
    "UNION ALL SELECT 4.0)",
    # Microsoft's PERCENTILE.EXC worked example: 0.25 -> 2.5
    "SELECT quantileExactExclusive(0.25)(v) AS r FROM "
    "(SELECT 1.0 AS v UNION ALL SELECT 2.0 UNION ALL SELECT 3.0 "
    "UNION ALL SELECT 6.0 UNION ALL SELECT 6.0 UNION ALL SELECT 6.0 "
    "UNION ALL SELECT 7.0 UNION ALL SELECT 8.0 UNION ALL SELECT 9.0)",
    # r13 promotion: fold-family higher-order forms map the lambda
    # first (arraySum(f, a) == arraySum(arrayMap(f, a)))
    "SELECT arrayMin(x -> -x, [1, 2]) AS m, "
    "arraySum(x -> x * 2, [1, 2]) AS s, "
    "arrayAvg(x -> x * 2, [1, 2, 3]) AS a",
    # r13 fix: 3-arg position keeps ClickHouse's (haystack, needle,
    # start) roles; 1-arg arrayCount counts truthy elements
    "SELECT position('haystack', 'a', 3) AS p, "
    "arrayCount([1, 0, 2]) AS c",
    # r13 fix: length counts BYTES in ClickHouse (lengthUTF8 chars)
    "SELECT length('héllo') AS b, lengthUTF8('héllo') AS c, "
    "length('abc') AS a",
    # r13 fixes: greatest/least NULL propagation (CH: any NULL arg ->
    # NULL; raw Spark would skip them) and 2-arg extract's whole-match
    # form for group-less literal patterns
    "SELECT greatest(1, NULL) AS g, least(2, NULL) AS l, "
    "greatest(1, 2, 3) AS g3, least(7, 5, 9) AS l3",
    r"SELECT extract('abc123', '\\d+') AS whole, "
    r"extract('abc123', '([a-z]+)(\\d+)') AS grp, "
    r"extract('nope', '\\d+') AS miss",
    # r13 fix: 1-based subscripts on CALL RESULTS and literals (the
    # raw Spark [] would be 0-based — silent off-by-one)
    "SELECT [10, 20, 30][1] AS a, [10, 20, 30][-1] AS b, "
    "arraySort(groupArray(v))[1] AS c, "
    "splitByChar('-', 'a-b-c')[1] AS d FROM "
    "(SELECT 3 AS v UNION ALL SELECT 1 UNION ALL SELECT 2)",
    # r13 promotion: arrayFill carry folds (the ClickHouse docs' own
    # example row, both directions)
    "SELECT arrayFill(x -> isNotNull(x), "
    "[1, NULL, 3, 11, 12, NULL, NULL, 5, 6, 14, NULL, NULL]) AS f, "
    "arrayReverseFill(x -> isNotNull(x), "
    "[1, NULL, 3, 11, 12, NULL, NULL, 5, 6, 14, NULL, NULL]) AS rf, "
    "arrayFill(x -> x > 2, [5, 1, 2, 7]) AS g",
    # r13 promotion: entropy as the run-length fold (2-1-3 value
    # histogram over 6 rows = 1.459147917 bits)
    "SELECT entropy(v) AS r FROM (SELECT 'a' AS v UNION ALL "
    "SELECT 'a' UNION ALL SELECT 'b' UNION ALL SELECT 'c' "
    "UNION ALL SELECT 'c' UNION ALL SELECT 'c')",
    # r13 promotion: matrix aggregates = pairwise corr/covar sugar
    # (the linear pair pins corr = 1 / -1; covar_pop(x,x) = 1.25)
    "SELECT corrMatrix(x, y, z) AS cm, covarPopMatrix(x, z) AS cp, "
    "covarSampMatrix(y, z) AS cs FROM "
    "(SELECT 1.0 AS x, 2.0 AS y, 4.0 AS z UNION ALL "
    "SELECT 2.0, 4.0, 3.0 UNION ALL SELECT 3.0, 6.0, 2.0 "
    "UNION ALL SELECT 4.0, 8.0, 1.0)",
    "SELECT uniqUpTo(2)(v) AS r FROM (SELECT 1 AS v UNION ALL "
    "SELECT 2 UNION ALL SELECT 3)",
    "SELECT sumOrNull(v) AS a, maxOrDefault(v) AS b FROM "
    "(SELECT 1 AS v WHERE 1 = 0)",
    "SELECT minIf(v, v > 1) AS a, maxIf(v, v < 3) AS b FROM "
    "(SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 3)",
    "SELECT quantileDeterministic(0.5)(v, 42) AS r FROM "
    "(SELECT 1.0 AS v UNION ALL SELECT 3.0)",
    f"SELECT retention(et = 'A', et = 'B', et = 'C', et = 'Z') AS r "
    f"FROM {_SEQ}",
    f"SELECT windowFunnel(7200, 'strict_increase')(ts, et = 'A', "
    f"et = 'B', et = 'C') AS r FROM {_SEQ}",
    "SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], "
    "CAST(10 AS Int64)) AS r",
    "SELECT arrayEnumerateUniq([10, 20, 10, 10]) AS r",
    "SELECT arrayPushBack([1, 2], 3) AS a, arrayPopFront([1, 2, 3]) AS b",
    "SELECT countSubstrings('aaaa', 'aa') AS r",  # non-overlap count
    "SELECT multiSearchAnyCaseInsensitive('Hello', ['WORLD', 'HELL']) AS r",
    "SELECT splitByChar(',', ',a,,b,') AS r",  # empty pieces kept
    "SELECT roundBankers(0.5) AS a, roundBankers(-2.5) AS b, "
    "roundBankers(1.5) AS c",
    "SELECT bitTestAll(7, 0, 1, 2) AS a, bitTestAny(4, 0, 1) AS b",
    "SELECT g, v FROM (SELECT 'a' AS g, 1 AS v UNION ALL "
    "SELECT 'a', 2 UNION ALL SELECT 'b', 3) "
    "ORDER BY g, v LIMIT 1 BY g",
    # --- round-10 expansion (VERDICT r9 task 6): the three most
    #     recently found fragile constructs — lookup-form transform,
    #     fn-form CAST(x, 'T'), untuple — NESTED inside aggregate and
    #     window arguments, where the rewrite order (transform/CAST
    #     first, aggregate rewrites after) is what's under test. ---
    "SELECT sum(transform(v, [1, 2], [10, 20], 0)) AS r FROM "
    "(SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 5)",
    "SELECT transform(v, [1, 2], [10, 20]) AS r FROM "
    "(SELECT 1 AS v UNION ALL SELECT 5) ORDER BY r",  # 3-arg: keep x
    "SELECT v, sum(transform(v, [1, 3], [100, 300], 0)) "
    "OVER (ORDER BY v) AS r FROM (SELECT 1 AS v UNION ALL "
    "SELECT 2 UNION ALL SELECT 3) ORDER BY v",
    "SELECT countIf(transform(s, ['a', 'b'], ['x', 'y'], '?') = 'x') "
    "AS r FROM (SELECT 'a' AS s UNION ALL SELECT 'b' "
    "UNION ALL SELECT 'c')",
    "SELECT argMax(s, transform(s, ['a', 'b', 'c'], [1, 2, 3], 0)) "
    "AS r FROM (SELECT 'a' AS s UNION ALL SELECT 'c' "
    "UNION ALL SELECT 'b')",
    "SELECT sum(CAST(v, 'Int64')) AS r FROM "
    "(SELECT '7' AS v UNION ALL SELECT '35')",
    "SELECT g, avg(CAST(n, 'Float64')) OVER (PARTITION BY g) AS r "
    "FROM (SELECT 'a' AS g, 1 AS n UNION ALL SELECT 'a', 2 "
    "UNION ALL SELECT 'b', 6) ORDER BY g, r",
    "SELECT max(CAST(transform(v, [1], ['9'], '0'), 'Int64')) AS r "
    "FROM (SELECT 1 AS v UNION ALL SELECT 2)",  # both nested at once
    "SELECT quantileExact(0.5)(CAST(v, 'Float64')) AS r FROM "
    "(SELECT '1' AS v UNION ALL SELECT '3' UNION ALL SELECT '5')",
    "SELECT untuple(t) FROM (SELECT tuple(1, 'a') AS t)",
    "SELECT untuple(t), sum(n) OVER (ORDER BY n) AS s FROM "
    "(SELECT tuple(2, 'b') AS t, 1 AS n UNION ALL "
    "SELECT tuple(3, 'c'), 2) ORDER BY s",
]


@pytest.mark.parametrize(
    "sql", DIFFERENTIAL_CORPUS, ids=lambda s: s[:64]
)
def test_differential_vs_clickhouse(spark, sql):
    ch = [[_norm(v) for v in row] for row in _ch_rows(sql)]
    translated = translate(sql)
    got = [
        [_norm(v) for v in row]
        for row in spark.sql(translated).collect()
    ]
    assert got == ch, (
        f"divergence\n  CH:    {ch}\n  Spark: {got}\n  "
        f"translated: {translated}"
    )


def test_corpus_size_contract():
    """The verdict's bar: >= 50 translated constructs differentially
    verified when a server is present. (The Spark side of every entry
    runs docker-free in test_chsql.py::test_differential_corpus_
    spark_side, so a corpus entry that stops translating breaks CI
    even without a server.)"""
    assert len(DIFFERENTIAL_CORPUS) >= 50

