"""Generate the differential-corpus SPARK-SIDE value fixture.

``tests/fixtures/chsql_differential_spark.json`` pins, for every
corpus entry in tests/test_chsql_differential.py: the translated SQL
text and the normalized result rows Spark produces for it. The replay
test (test_chsql_differential.py::test_corpus_replay_pinned_values)
runs WITHOUT a ClickHouse server and fails on any change to either —
so a transpiler edit that silently alters a translation or its values
is caught in plain CI, not only when docker is available.

This is a REGRESSION pin, not ClickHouse ground truth: the true
differential still needs a live server (the docker-gated test). The
fixture is regenerated deliberately, never implicitly:

    python tools/gen_chsql_fixture.py   # then review the git diff
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    from clickhouse_batcher_spark import get_session
    from clickhouse_batcher_spark.plans.chsql import translate
    from tests.test_chsql_differential import DIFFERENTIAL_CORPUS, _norm

    spark = get_session(app_name="chb_gen_chsql_fixture", shuffle_partitions=8)
    out = {}
    for sql in DIFFERENTIAL_CORPUS:
        translated = translate(sql)
        rows = [
            [_norm(v) for v in row] for row in spark.sql(translated).collect()
        ]
        out[sql] = {"translated": translated, "rows": rows}
    path = os.path.join(
        REPO, "tests", "fixtures", "chsql_differential_spark.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(out)} entries")


if __name__ == "__main__":
    main()
