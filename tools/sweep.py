"""Full-catalog correctness sweep, replicating the grading driver.

Loads ``__spark_entry__`` fresh (file-location import, like the
driver), builds a vanilla SparkSession, then for every oracled entry
in ``queries()`` runs Spark vs DuckDB at the given sf dir and reports
rows/schema/value-parity. Non-oracled queries get a rows-only check.

Usage::

    python tools/sweep.py                  # full catalog at sf0.01
    python tools/sweep.py --first 50       # driver window only
    python tools/sweep.py --only q1,q2     # named subset
    python tools/sweep.py --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import traceback

REPO = "/root/repo"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--threads", default="8")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    sys.path.insert(0, REPO)
    from tests.parity import canonicalize

    spark = (
        SparkSession.builder.master(f"local[{args.threads}]")
        .config("spark.sql.shuffle.partitions", args.threads)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = list(queries)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    ok = fail = 0
    results = {}
    for name in names:
        t0 = time.time()
        try:
            spark_pd = queries[name](spark, args.sf).toPandas()
            if name in oracles:
                oracle_pd = con.execute(oracles[name]).df()
                rows = len(spark_pd) == len(oracle_pd)
                cols = sorted(spark_pd.columns) == sorted(oracle_pd.columns)
                if rows and cols:
                    pd.testing.assert_frame_equal(
                        canonicalize(spark_pd),
                        canonicalize(oracle_pd),
                        check_dtype=False,
                        check_exact=True,
                    )
                    status = "PASS"
                else:
                    status = f"FAIL rows={rows} cols={cols}"
            else:
                status = f"rows-only n={len(spark_pd)}"
        except Exception as e:  # noqa: BLE001 - report and continue
            status = f"ERR {type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
        dt = time.time() - t0
        results[name] = status
        if status.startswith(("PASS", "rows-only")):
            ok += 1
        else:
            fail += 1
        print(f"{name:40s} {status[:80]:80s} {dt:5.1f}s", flush=True)

    print(json.dumps({"ok": ok, "fail": fail, "total": len(names)}))
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
