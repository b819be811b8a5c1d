#!/usr/bin/env python
"""Per-query timing + plan capture harness for optimization rounds.

Times individual catalog queries exactly the way bench.py does (noop
sink, warm pass at sf0.001, best-of-N with clearCache + full memo
eviction between runs — honest cold accounting, VERDICT r13 task 1)
so a single query can be iterated on without paying for the full
bench. Optionally dumps .explain("formatted") to a file; plans are
captured AFTER the timed passes so the plans phase cannot pre-build a
memo the timed passes would then read for free (ADVICE r13).

Usage:
  python tools/qtime.py q1 q2 ...            # time queries
  python tools/qtime.py --plans DIR q1 ...   # also write DIR/<q>.txt plans
  python tools/qtime.py --passes 3 q1        # best-of-3
  python tools/qtime.py --no-warm q1         # skip the sf0.001 warm pass
  python tools/qtime.py --amortized q1 ...   # keep memos warm (amortized)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from clickhouse_batcher_spark import catalog, get_session  # noqa: E402
from clickhouse_batcher_spark.operators.memo import evict_all  # noqa: E402

catalog.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument(
        "--amortized", action="store_true",
        help="leave memos warm between queries (cross-query amortization)",
    )
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    args = ap.parse_args()

    names = args.queries
    unknown = [n for n in names if n not in catalog.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_session(app_name="chb_qtime")
    warm_dir = SF_DIR.replace(
        SF_DIR.rstrip("/").rsplit("/", 1)[-1], "sf0.001"
    )
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR

    if not args.no_warm:
        for name in names:
            try:
                _force(catalog.QUERIES[name](spark, warm_dir))
            except Exception as exc:
                print(f"warm {name}: {exc}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()
        evict_all()

    timings: dict[str, float] = {}
    for pass_no in range(args.passes):
        order = names if pass_no % 2 == 0 else list(reversed(names))
        for name in order:
            fn = catalog.QUERIES[name]
            t0 = time.perf_counter()
            try:
                spark.sparkContext.setJobDescription(f"qtime:{name}")
                _force(fn(spark, SF_DIR))
                elapsed = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, elapsed), elapsed)
            except Exception as exc:
                print(f"FAIL {name}: {exc}", file=sys.stderr)
            finally:
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
                if not args.amortized:
                    evict_all()

    # Plans AFTER timing (ADVICE r13): building a query for explain()
    # materializes its memos eagerly, which would hand the timed passes
    # a pre-built frame for free if this ran first.
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = catalog.QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                self_plan_path(args.plans, name, args.suffix), "w"
            ) as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
            evict_all()

    print(json.dumps({"sf_dir": SF_DIR, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


def self_plan_path(plans_dir: str, name: str, suffix: str) -> str:
    return os.path.join(plans_dir, f"{name}{suffix}.txt")


if __name__ == "__main__":
    main()
