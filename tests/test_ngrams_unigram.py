"""Unigram-LM tokenizer: exact sequential recompute + invariants.

The learner is iterative (hard-EM) and therefore rows-only under the
driver gate; this file supplies the stronger check: an INDEPENDENT
first-principles reimplementation — word counting with Counter,
candidate generation by string slicing, and segmentation by
EXHAUSTIVE enumeration of every split (not the production DP) — must
reproduce the learned piece table symbol-for-symbol. Words in the
fixture corpus are <= 8 chars, so exhaustive search is bounded by
2^7 segmentations per word.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb
import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from clickhouse_batcher_spark.operators.ngrams import (  # noqa: E402
    UNIGRAM_EM_ROUNDS,
    UNIGRAM_FINAL_VOCAB,
    UNIGRAM_MAX_PIECE_LEN,
    UNIGRAM_SEED_MULTI,
    unigram_lm_encode_docs,
    unigram_lm_learn,
)
from clickhouse_batcher_spark.tables import table_path  # noqa: E402

_WS = re.compile(r"\s+")


def _corpus_words(sf_dir: str) -> Counter:
    con = duckdb.connect()
    texts = [
        t[0]
        for t in con.execute(
            f"SELECT text FROM '{table_path(sf_dir, 'documents')}'"
        ).fetchall()
    ]
    con.close()
    c: Counter = Counter()
    for text in texts:
        for w in _WS.split(text.lower()):
            if w:
                c[w] += 1
    return c


def _exhaustive_best(word: str, scores: dict[str, int]) -> list[str]:
    """All-segmentations argmax with the production tie-break order:
    (score, fewer pieces, longest last piece, then recursively the
    same toward the front) — expressed as the reversed piece-length
    tuple, compared lexicographically."""
    floor = min(scores.values(), default=0) - 10_000_000

    def segs(w: str) -> list[list[str]]:
        if not w:
            return [[]]
        out = []
        for l in range(1, min(UNIGRAM_MAX_PIECE_LEN, len(w)) + 1):
            piece = w[:l]
            if piece not in scores and l > 1:
                continue
            for rest in segs(w[l:]):
                out.append([piece] + rest)
        return out

    def key(pieces: list[str]):
        sc = sum(scores.get(p, floor) for p in pieces)
        return (sc, -len(pieces), tuple(len(p) for p in reversed(pieces)))

    return max(segs(word), key=key)


def _micro(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {
        p: int(round(math.log(c / total) * 1_000_000))
        for p, c in counts.items()
    }


def _reference_learn(sf_dir: str) -> list[tuple[str, int, int]]:
    wf = _corpus_words(sf_dir)
    cand: Counter = Counter()
    for w, cnt in wf.items():
        for l in range(1, UNIGRAM_MAX_PIECE_LEN + 1):
            for i in range(len(w) - l + 1):
                cand[w[i : i + l]] += cnt
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:UNIGRAM_SEED_MULTI]
    counts = dict(chars)
    counts.update(dict(multi))
    char_set = set(chars)
    scores = _micro(counts)

    def em_pass(sc: dict[str, int]) -> dict[str, int]:
        used: Counter = Counter()
        for w, cnt in wf.items():
            for piece in _exhaustive_best(w, sc):
                used[piece] += cnt
        out = dict(used)
        for ch in char_set:
            out.setdefault(ch, 1)
        return out

    for _ in range(UNIGRAM_EM_ROUNDS):
        counts = em_pass(scores)
        scores = _micro(counts)
    multi_sorted = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = char_set | {
        p
        for p, _ in multi_sorted[: max(0, UNIGRAM_FINAL_VOCAB - len(char_set))]
    }
    scores = {p: s for p, s in scores.items() if p in keep}
    counts = em_pass(scores)
    scores = _micro(counts)
    return sorted(
        ((p, counts[p], scores[p]) for p in counts),
        key=lambda t: (-t[1], t[0]),
    )


def test_unigram_learn_matches_sequential_recompute(spark, sf_dir):
    got = [
        (r["piece"], r["cnt"], int(round(r["logprob"] * 1_000_000)), r["rank"])
        for r in unigram_lm_learn(spark, sf_dir).orderBy("rank").collect()
    ]
    want = [
        (p, c, lp, i + 1)
        for i, (p, c, lp) in enumerate(_reference_learn(sf_dir))
    ]
    assert got == want


def test_unigram_encode_invariants(spark, sf_dir):
    vocab = {
        r["piece"]: int(round(r["logprob"] * 1_000_000))
        for r in unigram_lm_learn(spark, sf_dir).collect()
    }
    rows = unigram_lm_encode_docs(spark, sf_dir).orderBy("doc_id").collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{table_path(sf_dir, 'documents')}' "
            "ORDER BY doc_id"
        ).fetchall()
    )
    con.close()
    assert len(rows) == len(texts)
    for r in rows[:50]:
        words = [w for w in _WS.split(texts[r["doc_id"]].lower()) if w]
        assert r["n_words"] == len(words)
        # lossless: every word's exhaustive-best pieces concatenate
        # back to the word, and the distributed counts agree
        pieces: list[str] = []
        for w in words:
            best = _exhaustive_best(w, vocab)
            assert "".join(best) == w
            pieces.extend(best)
        assert r["n_pieces"] == len(pieces)
        assert r["head_pieces"] == "|".join(pieces[:8])
        assert all(p in vocab for p in pieces)
        if words:
            assert r["fertility"] == pytest.approx(
                round(len(pieces) / len(words), 6)
            )
