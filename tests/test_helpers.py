"""Coverage for helper functions not exercised via the catalog."""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

from clickhouse_batcher_spark.functions import portable_hash64
from clickhouse_batcher_spark.operators.dedup import exact_dedup
from clickhouse_batcher_spark.sinks.delete import (
    delete_where_at,
    delete_where_in_place,
)
from clickhouse_batcher_spark.tables import load_table


def test_delete_where_in_place_rewrites_path(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    events.write.parquet(path)
    before = spark.read.parquet(path)
    n_errors = before.filter("event_type = 'error'").count()
    assert n_errors > 0

    delete_where_in_place(
        spark.read.parquet(path), F.col("event_type") == "error", path
    )
    after = spark.read.parquet(path)
    assert after.filter("event_type = 'error'").count() == 0
    assert after.count() == events.count() - n_errors


def test_delete_where_in_place_recovers_from_mid_swap_crash(spark, sf_dir, tmp_path):
    """Round-3 advice: a crash between move(base, old) and
    move(staging, base) leaves the only live copy at ``.old`` — the
    next call must restore it, not rmtree it as stale garbage."""
    import shutil

    path = str(tmp_path / "tbl")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    events.write.parquet(path)
    total = events.count()
    n_errors = spark.read.parquet(path).filter("event_type = 'error'").count()

    # Simulate the crash window: base moved aside, staging promoted copy
    # lost (worst case — staging write also didn't survive).
    shutil.move(path, path + ".old")
    assert not __import__("os").path.exists(path)

    delete_where_at(spark, F.col("event_type") == "error", path)
    after = spark.read.parquet(path)
    assert after.filter("event_type = 'error'").count() == 0
    assert after.count() == total - n_errors


def test_portable_hash64_stable_and_nonnegative(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "s STRING")
    rows = df.select("s", portable_hash64("s").alias("h")).collect()
    by_val = {}
    for r in rows:
        assert r["h"] >= 0
        by_val.setdefault(r["s"], set()).add(r["h"])
    assert all(len(v) == 1 for v in by_val.values())  # stable per value
    assert by_val["a"] != by_val["b"]
    # salted variant diverges
    salted = df.select(portable_hash64("s", salt="x").alias("h")).collect()
    assert {r["h"] for r in salted} != {r["h"] for r in rows}


def test_exact_dedup_generic(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id INT, k STRING"
    )
    out = {(r["k"], r["id"]) for r in exact_dedup(df, ["k"], "id").collect()}
    assert out == {("x", 1), ("y", 3)}


def test_cli_list_runs_without_spark():
    proc = subprocess.run(
        [sys.executable, "-m", "clickhouse_batcher_spark", "list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0
    assert "tpch_q1  [oracle]" in proc.stdout
    assert "similarity_ann_lsh  [rows-only]" in proc.stdout


def test_register_views_sql_surface(spark, sf_dir):
    """The spark.sql surface over registered table views."""
    from clickhouse_batcher_spark.tables import TABLE_NAMES, register_views

    register_views(spark, sf_dir)
    for t in TABLE_NAMES:
        assert spark.sql(f"SELECT COUNT(*) FROM {t}").collect()[0][0] > 0
    joined = spark.sql(
        """
        SELECT r_name, COUNT(*) AS n FROM region
        JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name
        """
    )
    assert joined.count() == 5


def test_catalog_registry_invariants(spark):
    from clickhouse_batcher_spark import catalog

    catalog.load_all()
    # every oracle belongs to a registered query
    assert set(catalog.ORACLES) <= set(catalog.QUERIES)
    # all callables share the (spark, sf_dir) signature
    import inspect

    for name, fn in catalog.QUERIES.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, name
    # oracle SQL strings are single-statement (no stray semicolons)
    for name, sql in catalog.ORACLES.items():
        assert ";" not in sql, name


def test_driver_window_is_exactly_the_priority_list():
    """The driver checks the FIRST 50 entries of queries(); pin the
    window to _PRIORITY so a catalog edit can't silently rotate a
    query out before it has its green row (round-3 lesson: window
    membership is a correctness-gate decision, not an accident of
    registration order)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = list(mod.queries().keys())
    assert len(mod._PRIORITY) == 50
    assert names[: len(mod._PRIORITY)] == mod._PRIORITY
    # every priority entry must have an oracle (the window is the
    # hash-checked gate; rows-only entries do not belong there)
    oracled = set(mod.oracle_sql())
    missing = [n for n in mod._PRIORITY if n not in oracled]
    assert not missing, missing


def test_transfer_checksum_detects_corruption_and_ignores_order(spark, sf_dir):
    """The shipping-integrity property: permuting rows leaves the
    checksum unchanged (commutative fold); corrupting one value
    changes it."""
    from pyspark.sql import functions as F

    from clickhouse_batcher_spark import catalog
    from clickhouse_batcher_spark.tables import load_table

    catalog.load_all()
    base = {
        r["o_orderstatus"]: r["checksum"]
        for r in catalog.QUERIES["orders_transfer_checksum"](spark, sf_dir).collect()
    }
    # permute: recompute over a repartitioned (differently ordered) copy
    import clickhouse_batcher_spark.queries_ext5 as q5

    orders = load_table(spark, sf_dir, "orders").repartition(13)
    canonical = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_totalprice").cast("decimal(15,2)").cast("string"),
    )
    row_hash = F.conv(F.substring(F.sha2(canonical, 256), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    permuted = {
        r["o_orderstatus"]: r["checksum"]
        for r in orders.groupBy("o_orderstatus")
        .agg(
            (F.sum(row_hash) % F.lit(9223372036854775807).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("checksum")
        )
        .collect()
    }
    assert permuted == base

    # corrupt one row's totalprice -> that group's checksum must move
    corrupted_orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    )
    status_of_key1 = corrupted_orders.filter("o_orderkey = 1").collect()[0][
        "o_orderstatus"
    ]
    canonical2 = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_totalprice").cast("decimal(15,2)").cast("string"),
    )
    row_hash2 = F.conv(F.substring(F.sha2(canonical2, 256), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    corrupted = {
        r["o_orderstatus"]: r["checksum"]
        for r in corrupted_orders.groupBy("o_orderstatus")
        .agg(
            (F.sum(row_hash2) % F.lit(9223372036854775807).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("checksum")
        )
        .collect()
    }
    assert corrupted[status_of_key1] != base[status_of_key1]
    for k in base:
        if k != status_of_key1:
            assert corrupted[k] == base[k]


def test_with_global_cumsum_matches_single_window(spark, sf_dir):
    """The two-level distributed running sum must equal the naive
    single-partition Window.orderBy cumsum bit-for-bit, under any
    input partitioning (integer sums commute)."""
    from pyspark.sql.window import Window

    from clickhouse_batcher_spark.functions import with_global_cumsum
    from clickhouse_batcher_spark.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.col("value").cast("bigint").alias("v"))
        .limit(5000)
    )
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["event_id"]: r["cs"]
        for r in ev.select(
            "event_id", F.sum("v").over(w).alias("cs")
        ).collect()
    }
    for parts in (1, 7):
        got = {
            r["event_id"]: r["cs"]
            for r in with_global_cumsum(
                ev.repartition(parts), "v", ["event_id"], cumsum_name="cs"
            ).collect()
        }
        assert got == naive


def test_with_global_cumsum_multi_and_null_contract(spark):
    """One range shuffle serves several running sums, and NULL values
    contribute 0 (never a NULL output) regardless of where the NULL
    lands in the range partitioning."""
    from clickhouse_batcher_spark.functions import with_global_cumsum

    rows = [(1, None, 10), (2, 5, None), (3, 7, 30)]
    df = spark.createDataFrame(rows, "k INT, a INT, b INT")
    got = {
        r["k"]: (r["ca"], r["cb"])
        for r in with_global_cumsum(
            df.repartition(3), {"a": "ca", "b": "cb"}, ["k"]
        ).collect()
    }
    assert got == {1: (0, 10), 2: (5, 10), 3: (12, 40)}


def test_with_global_index_matches_single_window(spark):
    """Exact equivalence with the naive single-partition row_number
    under several partition counts, including 1 and more partitions
    than rows, plus duplicate sort keys broken by the tiebreaker."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_batcher_spark.functions import with_global_index

    pdf = pd.DataFrame(
        {
            "k": [5, 1, 3, 3, 2, 2, 2, 9, 0, 7, 7, 4],
            "uid": list(range(12)),
        }
    )
    df = spark.createDataFrame(pdf)
    w = Window.orderBy("k", "uid")
    want = {
        (r["k"], r["uid"]): r["i"]
        for r in df.select(
            "k", "uid", (F.row_number().over(w) - 1).alias("i")
        ).collect()
    }
    for nparts in (1, 3, 64):
        got = {
            (r["k"], r["uid"]): r["gidx"]
            for r in with_global_index(
                df, ["k", "uid"], index_name="gidx", num_partitions=nparts
            ).collect()
        }
        assert got == want, f"num_partitions={nparts}"


def test_with_global_cummax_matches_single_partition_window(spark):
    """Inclusive and exclusive two-level running max equal the naive
    single-partition window at every partition count."""
    import pandas as pd
    from pyspark.sql import Window

    from clickhouse_batcher_spark.functions import with_global_cummax

    pdf = pd.DataFrame(
        {
            "k": [5, 1, 3, 3, 2, 2, 2, 9, 0, 7, 7, 4],
            "v": [2, 9, 4, 4, 8, 1, 5, 0, 3, 6, 6, 7],
            "uid": list(range(12)),
        }
    )
    df = spark.createDataFrame(pdf)
    w_in = Window.orderBy("k", "uid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_ex = Window.orderBy("k", "uid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        r["uid"]: (r["mi"], r["me"])
        for r in df.select(
            "uid",
            F.max("v").over(w_in).alias("mi"),
            F.max("v").over(w_ex).alias("me"),
        ).collect()
    }
    for nparts in (1, 3, 64):
        inc = {
            r["uid"]: r["m"]
            for r in with_global_cummax(
                df, {"v": "m"}, ["k", "uid"], num_partitions=nparts
            ).collect()
        }
        exc = {
            r["uid"]: r["m"]
            for r in with_global_cummax(
                df,
                {"v": "m"},
                ["k", "uid"],
                num_partitions=nparts,
                exclusive=True,
            ).collect()
        }
        for uid, (mi, me) in want.items():
            assert inc[uid] == mi, (nparts, uid)
            assert exc[uid] == me, (nparts, uid)


def test_pareto_skyline_matches_quadratic_definition(spark, sf_dir):
    """The linear sweep equals the O(n^2) NOT EXISTS dominance
    definition computed independently in DuckDB."""
    import duckdb

    from clickhouse_batcher_spark import catalog

    catalog.load_all()
    got = sorted(
        r["o_orderkey"]
        for r in catalog.QUERIES["orders_pareto_skyline"](
            spark, sf_dir
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = [
        r[0]
        for r in con.execute(
            """
            SELECT o_orderkey FROM orders p
            WHERE NOT EXISTS (
              SELECT 1 FROM orders q
              WHERE q.o_totalprice >= p.o_totalprice
                AND q.o_orderdate >= p.o_orderdate
                AND (q.o_totalprice > p.o_totalprice
                     OR q.o_orderdate > p.o_orderdate)
            )
            ORDER BY o_orderkey
            """
        ).fetchall()
    ]
    assert got == want and len(got) >= 1
