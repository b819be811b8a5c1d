"""Fuzzy string matching via deletion-neighborhood blocking (FastSS).

Edit-distance joins are the classic quadratic trap: a naive
similarity join compares every token pair. The FastSS observation
(Bocek et al., 2007): two strings within Levenshtein distance k share
at least one member of their depth-k *deletion neighborhoods* (the
string itself plus everything reachable by deleting up to k
characters) — delete the misaligned positions from each side of any
k-edit alignment and the remainders coincide. Generating the
neighborhood is O(L^k) per DISTINCT token, turning the fuzzy join
into an EQUI-join on the variant key plus an exact ``levenshtein``
verify on the candidates — the same build/probe/verify shape as the
bloom semi join, and fully oracle-able because Spark and DuckDB ship
the same ``levenshtein``.

The catalog query (k = 2) maps each corpus token to its most frequent
close neighbor — the typo-normalization step of a text cleaning
pipeline (OCR noise and spelling variants collapse onto the canonical
form).

Scale: the vocabulary (zipf-small) is what explodes — ~L²/2 variants
per distinct token at k=2, never per occurrence. The variant
equi-join shuffles O(vocab·L²) short strings; bucket sizes are
bounded by neighborhood collisions, not corpus size (short tokens
collide most — at k=2 every token of length ≤ 2 shares the ""
variant, so a huge vocabulary of very short tokens wants k=1). No
cross join anywhere (the catalog-wide plan guard holds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_batcher_spark.catalog import query
from clickhouse_batcher_spark.functions import tokens
from clickhouse_batcher_spark.operators.text import SQL_TOKENS
from clickhouse_batcher_spark.tables import load_table

FUZZY_MAX_DIST = 2  # catalog query matches within Levenshtein <= 2


def single_deletions(col: Column) -> Column:
    """Every single-character deletion of a string (empty-safe).

    Spark's ``sequence(1, 0)`` DESCENDS instead of returning empty, so
    the zero-length case needs an explicit guard.
    """
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, 1, i - 1),
            col.substr(i + 1, F.length(col) - i),
        ),
    )
    return F.when(F.length(col) > 0, dels).otherwise(
        F.array().cast("array<string>")
    )


def deletion_neighborhood(col: Column, k: int = FUZZY_MAX_DIST) -> Column:
    """The string plus everything reachable by deleting <= k chars."""
    layers = [F.array(col)]
    frontier = single_deletions(col)
    for _ in range(k):
        layers.append(frontier)
        frontier = F.flatten(
            F.transform(frontier, lambda v: single_deletions(v))
        )
    return F.array_distinct(F.concat(*layers))


def fuzzy_pairs(
    vocab: DataFrame, token_col: str, k: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Distinct unordered token pairs with levenshtein distance <= k.

    vocab must have one row per distinct token.
    """
    # build the variant array first, explode in a second select —
    # explode over an expression referencing a same-select alias trips
    # Spark's lateral-column-alias check
    variants = (
        vocab.select(F.col(token_col).alias("tok"))
        .withColumn("vars", deletion_neighborhood(F.col("tok"), k))
        .select("tok", F.explode("vars").alias("variant"))
        .distinct()
    )
    a = variants.select(F.col("tok").alias("tok_a"), "variant")
    b = variants.select(F.col("tok").alias("tok_b"), "variant")
    cands = (
        a.join(b, "variant")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
    )
    return cands.filter(F.levenshtein("tok_a", "tok_b") <= k).select(
        "tok_a",
        "tok_b",
        F.levenshtein("tok_a", "tok_b").cast("bigint").alias("distance"),
    )


_SQL_DEL1 = (
    "CASE WHEN length({v}) > 0 THEN "
    "list_transform(generate_series(1, length({v})), "
    "i -> substring({v}, 1, i - 1) "
    "|| substring({v}, i + 1, length({v}) - i)) "
    "ELSE [] END"
)


@query(
    "fuzzy_token_matches",
    oracle=f"""
    WITH occ AS (
      SELECT unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
              FROM occ GROUP BY tok),
    d1 AS (
      SELECT tok, {_SQL_DEL1.format(v="tok")} AS dels FROM vocab
    ),
    nb AS (
      SELECT tok,
        list_distinct([tok] || dels || flatten(list_transform(dels,
          v -> {_SQL_DEL1.format(v="v")}))) AS vars
      FROM d1
    ),
    variants AS (SELECT DISTINCT tok, unnest(vars) AS variant FROM nb),
    cands AS (
      SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
      FROM variants a JOIN variants b ON a.variant = b.variant
      WHERE a.tok < b.tok
    ),
    pairs AS (
      SELECT tok_a, tok_b,
             CAST(levenshtein(tok_a, tok_b) AS BIGINT) AS distance
      FROM cands WHERE levenshtein(tok_a, tok_b) <= {FUZZY_MAX_DIST}
    )
    SELECT p.tok_a, p.tok_b, p.distance, va.cnt AS cnt_a, vb.cnt AS cnt_b,
      CASE WHEN va.cnt > vb.cnt THEN p.tok_a
           WHEN vb.cnt > va.cnt THEN p.tok_b
           WHEN p.tok_a < p.tok_b THEN p.tok_a ELSE p.tok_b
      END AS canonical
    FROM pairs p
    JOIN vocab va ON va.tok = p.tok_a
    JOIN vocab vb ON vb.tok = p.tok_b
    """,
)
def fuzzy_token_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close token pairs (lev <= 2) + the corpus-frequency canonical."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(F.explode(tokens("text")).alias("tok"))
    vocab = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = fuzzy_pairs(vocab.select("tok"), "tok")
    va = vocab.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("cnt_a"))
    vb = vocab.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("cnt_b"))
    canonical = (
        F.when(F.col("cnt_a") > F.col("cnt_b"), F.col("tok_a"))
        .when(F.col("cnt_b") > F.col("cnt_a"), F.col("tok_b"))
        .otherwise(F.least("tok_a", "tok_b"))
    )
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "distance",
            "cnt_a",
            "cnt_b",
            canonical.alias("canonical"),
        )
    )
