"""Differential-corpus fixture replay (round-9) — NO server needed.

The docker-gated suite (test_chsql_differential.py) executes each
corpus entry on real ClickHouse and on Spark; without a server its
153 tests skip and the corpus is only parse-checked. This file closes
that evidence gap in plain CI: a checked-in fixture pins, per corpus
entry, the translated SQL TEXT and the normalized Spark VALUES, so a
transpiler change that silently alters either fails here.

This is a REGRESSION pin, not ClickHouse ground truth — the docker-
gated differential remains the authority whenever a server exists.
Regenerate deliberately (then review the git diff):

    python tools/gen_chsql_fixture.py
"""

from __future__ import annotations

import json
import os

from clickhouse_batcher_spark.plans.chsql import translate
from tests.test_chsql_differential import DIFFERENTIAL_CORPUS, _norm

_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "chsql_differential_spark.json",
)


def _load_fixture() -> dict:
    with open(_FIXTURE_PATH) as fh:
        return json.load(fh)


def test_corpus_replay_fixture_covers_corpus():
    fx = _load_fixture()
    missing = [s for s in DIFFERENTIAL_CORPUS if s not in fx]
    extra = [s for s in fx if s not in DIFFERENTIAL_CORPUS]
    assert not missing and not extra, (
        f"fixture stale — rerun tools/gen_chsql_fixture.py "
        f"(missing {len(missing)}, extra {len(extra)})"
    )


def test_corpus_replay_pinned_values(spark):
    """Every corpus entry's translation text and Spark values must
    match the committed fixture. Batched in one test (not
    parametrized) so the full replay stays one session pass; the
    failure message names each diverging entry."""
    fx = _load_fixture()
    bad = []
    for sql in DIFFERENTIAL_CORPUS:
        pin = fx.get(sql)
        if pin is None:
            bad.append(f"NOT PINNED: {sql[:70]}")
            continue
        translated = translate(sql)
        if translated != pin["translated"]:
            bad.append(
                f"TRANSLATION CHANGED: {sql[:70]!r}\n"
                f"    pinned: {pin['translated'][:120]}\n"
                f"    now:    {translated[:120]}"
            )
            continue
        rows = [
            [_norm(v) for v in row]
            for row in spark.sql(translated).collect()
        ]
        # JSON round-trip normalizes tuples exactly like the pin
        if json.loads(json.dumps(rows)) != pin["rows"]:
            bad.append(
                f"VALUES CHANGED: {sql[:70]!r}\n"
                f"    pinned: {pin['rows']}\n    now:    {rows}"
            )
    assert not bad, "\n".join(bad)
