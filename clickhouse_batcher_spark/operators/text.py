"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline text surface: per-document statistics and
quality signals, language-ID, token histograms, and content
fingerprints. Everything is built-in ``pyspark.sql.functions`` (no
Python in the hot path); every ratio is a single IEEE division of
exact integer counts, so results are bit-identical to the DuckDB
oracle regardless of partitioning.

Scale: all operators are embarrassingly parallel per-document maps or
a single token-level shuffle (the histogram); no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import sha256_hex, tokens
from clickhouse_batcher_spark.tables import load_table

# Shared tokenization fragment for the DuckDB oracles — must mirror
# functions.tokens exactly.
SQL_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

# Tiny per-language marker lists. The synthetic corpus draws from one
# shared vocabulary, so these act as a deterministic heuristic surface
# (the oracle checks engine agreement); a production deployment swaps
# in full stopword tables / n-gram profiles without changing the plan
# shape (a broadcast map-side lookup).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "y", "es", "una"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("de", "le", "shi", "he", "zai"),
}
# Explicit tie-break: first language in this order wins on equal score.
LANG_ORDER = ("en", "de", "es", "fr", "zh")


# ---------------------------------------------------------------------------
# Per-document statistics + quality signals
# ---------------------------------------------------------------------------
@query(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
      length(text) AS n_chars,
      len(toks) AS n_tokens,
      len(list_distinct(toks)) AS n_uniq_tokens,
      CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE) AS avg_token_len,
      CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
        AS type_token_ratio,
      CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE) AS short_token_ratio
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "text", tokens("text").alias("toks"))
    n_tokens = F.size("toks")
    n_uniq = F.size(F.array_distinct("toks"))
    tok_chars = F.aggregate(
        F.transform(F.col("toks"), lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    short = F.size(F.filter(F.col("toks"), lambda x: F.length(x) <= 2))
    return t.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_uniq.cast("bigint").alias("n_uniq_tokens"),
        (tok_chars.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (n_uniq.cast("double") / n_tokens.cast("double")).alias("type_token_ratio"),
        (short.cast("double") / n_tokens.cast("double")).alias("short_token_ratio"),
    )


# ---------------------------------------------------------------------------
# Language ID (marker-token voting, deterministic tie-break)
# ---------------------------------------------------------------------------
def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({markers}))) AS s_{lang}"


def _langid_case_sql() -> str:
    # CASE chain in LANG_ORDER: the first lang whose score >= all
    # later-checked langs wins — an explicit argmax-with-tiebreak that
    # both engines evaluate identically.
    clauses = []
    for i, lang in enumerate(LANG_ORDER[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANG_ORDER[i + 1 :]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{LANG_ORDER[-1]}' END"


@query(
    "langid_predict",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
          {", ".join(_lang_score_sql(lg) for lg in LANG_ORDER)} FROM t)
    SELECT doc_id, lang AS labeled_lang, {_langid_case_sql()} AS pred_lang,
           greatest(s_en, s_de, s_es, s_fr, s_zh) AS top_score
    FROM s
    """,
)
def langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", tokens("text").alias("toks"))
    scores = [
        F.size(
            F.filter(F.col("toks"), lambda x: x.isin(*LANG_MARKERS[lang]))
        )
        .cast("bigint")
        .alias(f"s_{lang}")
        for lang in LANG_ORDER
    ]
    s = t.select("doc_id", "lang", *scores)
    pred = None
    for lang in reversed(LANG_ORDER[:-1]):
        later = LANG_ORDER[LANG_ORDER.index(lang) + 1 :]
        cond = None
        for other in later:
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(
            pred if pred is not None else F.lit(LANG_ORDER[-1])
        )
    return s.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER]).alias("top_score"),
    )


# ---------------------------------------------------------------------------
# Corpus token histogram (the one shuffling text op: token-level groupBy
# with map-side partial aggregation)
# ---------------------------------------------------------------------------
@query(
    "token_histogram",
    oracle=f"""
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest({SQL_TOKENS}) AS tok FROM documents) t
    GROUP BY tok
    """,
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting: word pieces + standalone punctuation, the
# usual pre-tokenization regex — a deterministic proxy for LLM token
# budgeting at corpus scale (per-row regexp, no shuffle).
# ---------------------------------------------------------------------------
_BPE_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"


@query(
    "token_count_bpeish",
    oracle=f"""
    SELECT doc_id,
      len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS n_bpeish_tokens,
      CAST(ceil(len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) * 1.3)
           AS BIGINT) AS est_llm_tokens
    FROM documents
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_bpeish_tokens"),
        F.ceil(n * 1.3).cast("bigint").alias("est_llm_tokens"),
    )


# ---------------------------------------------------------------------------
# PII-style redaction: pattern scrubbing before training. The synthetic
# corpus has no real PII, so the patterns target numbers/emails/handles
# generically; output is the redacted-content hash (small, exact).
# ---------------------------------------------------------------------------
_REDACTIONS = (
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"@[a-z0-9_]+", "<HANDLE>"),
    (r"[0-9]+", "<NUM>"),
)


def _redact_sql(expr: str = "lower(text)") -> str:
    for pattern, repl in _REDACTIONS:
        escaped = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{repl}', 'g')"
    return expr


@query(
    "redact_docs",
    oracle=f"""
    SELECT doc_id,
      sha256({_redact_sql()}) AS redacted_sha,
      length({_redact_sql()}) AS redacted_len
    FROM documents
    """,
)
def redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.lower(F.col("text"))
    for pattern, repl in _REDACTIONS:
        redacted = F.regexp_replace(redacted, pattern, repl)
    return docs.select(
        "doc_id",
        sha256_hex(redacted).alias("redacted_sha"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Document fingerprint: whitespace-normalized SHA-256 prefix
# ---------------------------------------------------------------------------
@query(
    "doc_fingerprint",
    oracle=r"""
    SELECT doc_id,
      substring(sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16)
        AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id", F.substring(sha256_hex(normalized), 1, 16).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken): k-gram hashes,
# minimum per sliding window of w — the rolling-hash fingerprint used
# for plagiarism/near-dup detection at passage granularity.
#
# Portable min-selection trick: minimize the STRING key
# ``hash || zero-padded-position`` — lexicographic min on a
# fixed-width key equals (hash, position) tuple-min in both engines,
# which also gives winnowing's deterministic tie-break.
# Scale: one explode to (doc, pos) rows + one window over (doc, pos)
# — no joins; state per window is O(w).
# ---------------------------------------------------------------------------
WINNOW_K = 8   # k-gram length (chars)
WINNOW_W = 16  # window: guarantees a shared fingerprint for any match
               # of length >= w + k - 1 chars


@query(
    "winnow_fingerprints",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, i,
        substring(sha256(substring(t, i, {WINNOW_K})), 1, 16)
          || lpad(CAST(i AS VARCHAR), 8, '0') AS key,
        length(t) - {WINNOW_K} + 1 AS n_grams
      FROM norm, unnest(generate_series(1, length(t) - {WINNOW_K} + 1)) AS g(i)
      WHERE length(t) >= {WINNOW_K}
    ), win AS (
      SELECT doc_id,
        MIN(key) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
          AS min_key,
        i, n_grams
      FROM grams
    )
    SELECT DISTINCT doc_id, substring(min_key, 1, 16) AS fp
    FROM win WHERE i <= n_grams - {WINNOW_W} + 1
    """,
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-row winnowing: ZERO shuffles (round-3 plan improvement).

    All k-grams of a doc derive from one source row, so the whole
    pipeline stays in per-row array expressions: build the (hash ||
    padded-position) key array once (one sha2 per gram, hoisted out of
    the window step), take the sliding-window min with
    ``array_min(slice(keys, i, w))``, and dedup per doc with
    ``array_distinct`` — within-doc dedup makes output rows unique, so
    no global ``distinct`` either. The previous formulation exploded
    to (doc, pos) rows and paid a full shuffle+sort for the window
    plus a second shuffle for DISTINCT; this one moves no rows at all.
    Per-row memory is O(n_chars * 24 B) for the key array — fine for
    document-sized text; for multi-MB blobs switch back to the
    exploded window-min form, which bounds memory at O(w).
    """
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    norm = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("t"),
    ).filter(
        # need n_grams = len-K+1 >= W for any window to exist
        F.length("t") >= WINNOW_K + WINNOW_W - 1
    )
    keyed = norm.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, length(t) - {WINNOW_K} + 1), "
            f"i -> concat(substring(sha2(substring(t, i, {WINNOW_K}), 256), 1, 16), "
            f"lpad(cast(i as string), 8, '0')))"
        ).alias("keys"),
    )
    return keyed.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(keys) - {WINNOW_W} + 1), "
                    f"i -> substring(array_min(slice(keys, i, {WINNOW_W})), 1, 16))"
                )
            )
        ).alias("fp"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation (round-5 third session): the confusion matrix
# of the n-gram-marker classifier against the corpus labels, with
# per-cell recall and precision shares — the eval harness every
# classifier in the pipeline should ship with. Reuses langid_predict
# verbatim (Spark frame AND oracle SQL composed as a CTE), so the
# two stay in lockstep by construction.
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from clickhouse_batcher_spark.catalog import ORACLES

    return f"""
    WITH preds AS ({ORACLES["langid_predict"]}),
    cells AS (
      SELECT labeled_lang, pred_lang, COUNT(*) AS n
      FROM preds GROUP BY 1, 2
    ), lab AS (
      SELECT labeled_lang, SUM(n) AS n_label FROM cells GROUP BY 1
    ), prd AS (
      SELECT pred_lang, SUM(n) AS n_pred FROM cells GROUP BY 1
    )
    SELECT c.labeled_lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
      round(CAST(c.n AS DOUBLE) / n_label, 6) AS recall_share,
      round(CAST(c.n AS DOUBLE) / n_pred, 6) AS precision_share
    FROM cells c
    JOIN lab ON lab.labeled_lang = c.labeled_lang
    JOIN prd ON prd.pred_lang = c.pred_lang
    """


@query("langid_confusion", oracle=None)  # composed below
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the language-ID heuristic vs corpus labels:
    per (labeled, predicted) cell the document count, its share of
    the labeled row (recall contribution) and of the predicted column
    (precision contribution). Diagonal cells ARE per-language
    recall/precision."""
    preds = langid_predict(spark, sf_dir)
    cells = preds.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    lab = cells.groupBy(F.col("labeled_lang").alias("l_lab")).agg(
        F.sum("n").alias("n_label")
    )
    prd = cells.groupBy(F.col("pred_lang").alias("p_prd")).agg(
        F.sum("n").alias("n_pred")
    )
    return (
        cells.join(F.broadcast(lab), F.col("labeled_lang") == F.col("l_lab"))
        .join(F.broadcast(prd), F.col("pred_lang") == F.col("p_prd"))
        .select(
            "labeled_lang",
            "pred_lang",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("n_label"), 6
            ).alias("recall_share"),
            F.round(
                F.col("n").cast("double") / F.col("n_pred"), 6
            ).alias("precision_share"),
        )
    )


from clickhouse_batcher_spark.catalog import ORACLES as _TXT_ORACLES  # noqa: E402

_TXT_ORACLES["langid_confusion"] = " ".join(_langid_confusion_oracle().split())


# ---------------------------------------------------------------------------
# Per-source PII-pattern rates (rollup of the redaction pass)
# ---------------------------------------------------------------------------
def _pii_count_sql(pattern: str) -> str:
    escaped = pattern.replace("'", "''")
    return (
        f"CAST(len(regexp_extract_all(lower(text), '{escaped}'))"
        " AS BIGINT)"
    )


@query(
    "pii_rate_by_source",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
        {_pii_count_sql(_REDACTIONS[0][0])} AS n_email,
        {_pii_count_sql(_REDACTIONS[1][0])} AS n_handle,
        {_pii_count_sql(_REDACTIONS[2][0])} AS n_num
      FROM documents
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_email) AS BIGINT) AS n_email_hits,
      CAST(SUM(n_handle) AS BIGINT) AS n_handle_hits,
      CAST(SUM(n_num) AS BIGINT) AS n_num_hits,
      CAST(SUM(CASE WHEN n_email + n_handle + n_num > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_hits,
      CAST((SUM(CASE WHEN n_email + n_handle + n_num > 0
                THEN 1 ELSE 0 END) * 1000000)
           // COUNT(*) AS BIGINT) AS hit_ppm
    FROM per_doc GROUP BY source
    """,
)
def pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII-pattern hit rates over the SAME pattern set the
    redaction pass scrubs (emails / handles / number runs) — the
    compliance dashboard a corpus owner reads to decide which source
    needs scrubbing (or exclusion) BEFORE export, while redact_docs is
    the per-document action. Exact occurrence counts via
    regexp_count/regexp_extract_all of identical regexes on both
    engines; zero-shuffle per-row counting + one per-source rollup."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "source",
        *[
            F.expr(
                "CAST(regexp_count(lower(text),"
                f" '{p.replace(chr(39), chr(39)*2)}') AS BIGINT)"
            ).alias(name)
            for (p, _), name in zip(
                _REDACTIONS, ("n_email", "n_handle", "n_num")
            )
        ],
    )
    any_hit = (
        F.col("n_email") + F.col("n_handle") + F.col("n_num") > 0
    )
    agg = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_email_hits"),
        F.sum("n_handle").cast("bigint").alias("n_handle_hits"),
        F.sum("n_num").cast("bigint").alias("n_num_hits"),
        F.sum(F.when(any_hit, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_hits"),
    )
    return agg.withColumn(
        "hit_ppm",
        F.expr("CAST((docs_with_hits * 1000000) DIV n_docs AS BIGINT)"),
    )


# ---------------------------------------------------------------------------
# Readability report (Flesch reading ease, exact integer rendering)
# ---------------------------------------------------------------------------
_RE_WORD = "[A-Za-z]+"
_RE_VGRP = "[aeiouyAEIOUY]+"
_RE_SENT = "[.!?]+"


@query(
    "docs_readability_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
        CAST(len(regexp_extract_all(text, '{_RE_WORD}')) AS BIGINT) AS w,
        CAST(len(regexp_extract_all(text, '{_RE_VGRP}')) AS BIGINT) AS y,
        GREATEST(CAST(len(regexp_extract_all(text, '{_RE_SENT}'))
                      AS BIGINT), 1) AS s,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             AS BIGINT) AS l
      FROM documents
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(w) AS BIGINT) AS n_words,
      CAST(SUM(y) AS BIGINT) AS n_syllables,
      CAST(SUM(s) AS BIGINT) AS n_sentences,
      CAST(SUM(l) AS BIGINT) AS n_letters,
      CAST(206835 - (1015 * SUM(w)) // SUM(s)
                  - (84600 * SUM(y)) // SUM(w) AS BIGINT) AS flesch_milli,
      CAST((1000 * SUM(l)) // SUM(w) AS BIGINT) AS word_len_milli
    FROM per_doc GROUP BY source
    """,
)
def docs_readability_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading ease from the classic vowel-group
    syllable heuristic — the readability gate a curation pipeline runs
    next to the C4/Gopher filters (too-hard and too-trivial sources
    both get down-weighted in mix planning).

    Flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    words), rendered in exact integer milli-units with truncating
    division on the SOURCE-level count sums, so no float enters.
    Sentences floor at 1 per doc (this corpus has no terminal
    punctuation; on real text the [.!?]+ runs count). All three
    counters are per-row regexp counts — zero shuffle — followed by
    one map-side-combinable per-source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.expr(f"CAST(regexp_count(text, '{_RE_WORD}') AS BIGINT)").alias(
            "w"
        ),
        F.expr(f"CAST(regexp_count(text, '{_RE_VGRP}') AS BIGINT)").alias(
            "y"
        ),
        F.greatest(
            F.expr(f"CAST(regexp_count(text, '{_RE_SENT}') AS BIGINT)"),
            F.lit(1),
        ).alias("s"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast(
            "bigint"
        ).alias("l"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("n_words"),
        F.sum("y").cast("bigint").alias("n_syllables"),
        F.sum("s").cast("bigint").alias("n_sentences"),
        F.sum("l").cast("bigint").alias("n_letters"),
        F.expr(
            "CAST(206835 - (1015 * SUM(w)) DIV SUM(s)"
            " - (84600 * SUM(y)) DIV SUM(w) AS BIGINT)"
        ).alias("flesch_milli"),
        F.expr("CAST((1000 * SUM(l)) DIV SUM(w) AS BIGINT)").alias(
            "word_len_milli"
        ),
    )


# ---------------------------------------------------------------------------
# Simpson diversity of the token distribution per source
# ---------------------------------------------------------------------------
@query(
    "docs_simpson_diversity",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS t
      FROM documents
    ), tf AS (
      SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok WHERE t <> '' GROUP BY 1, 2
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS vocab,
      CAST(SUM(n) AS BIGINT) AS n_tokens,
      CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) * 1000000
           // (CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1)) AS BIGINT)
        AS simpson_ppm,
      CAST(1000000 - SUM(CAST(n AS HUGEINT) * (n - 1)) * 1000000
           // (CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1)) AS BIGINT)
        AS gini_simpson_ppm
    FROM tf GROUP BY source
    """,
)
def docs_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration / Gini-Simpson diversity of each source's
    token distribution — the repeat-probability diversity index next
    to the entropy and Zipf diagnostics (`docs_token_entropy`,
    `token_zipf_fit`): the probability two tokens drawn without
    replacement coincide. A source whose simpson_ppm spikes is
    template/boilerplate-heavy before any dedup runs.

    Exact end-to-end: D = sum n_i(n_i-1) / (N(N-1)) on integer term
    frequencies, carried in HUGEINT/DECIMAL(38) and rendered as
    truncating-ppm — no float. One tokenize-explode + two
    map-side-combinable groupBys; the per-source reduce touches
    |vocab| rows, never raw tokens twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    big = "decimal(38,0)"
    rep = F.sum(F.col("n").cast(big) * (F.col("n") - 1))
    tot = F.sum("n").cast(big)
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(SUM(CAST(n AS DECIMAL(38,0)) * (n - 1)) * 1000000"
            " DIV (CAST(SUM(n) AS DECIMAL(38,0)) * (SUM(n) - 1))"
            " AS BIGINT)"
        ).alias("simpson_ppm"),
        F.expr(
            "CAST(1000000 - SUM(CAST(n AS DECIMAL(38,0)) * (n - 1))"
            " * 1000000 DIV (CAST(SUM(n) AS DECIMAL(38,0)) * (SUM(n) - 1))"
            " AS BIGINT)"
        ).alias("gini_simpson_ppm"),
    )
