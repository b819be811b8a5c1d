"""Physical-layout scale proofs: partition pruning and bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_batcher_spark.sources.layout import (
    read_partitioned,
    write_bucketed_table,
    write_partitioned_by_month,
)
from clickhouse_batcher_spark.tables import load_table


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partition_pruning_on_month_layout(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_month")
    write_partitioned_by_month(events, "ts", path)

    back = read_partitioned(spark, path)
    jan = back.filter((F.col("_year") == 2024) & (F.col("_month") == 1))
    plan = _plan(jan.select("event_id"))
    # the predicate must become a PartitionFilter (directory pruning),
    # not a row-level PushedFilter
    assert "PartitionFilters" in plan
    assert "_month" in plan.split("PartitionFilters", 1)[1][:300]
    assert jan.count() == events.filter(F.month("ts") == 1).count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed on the join key -> sort-merge join with no
    shuffle Exchange: the 100 TB co-location story, verified on the
    actual plan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        write_bucketed_table(
            orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8
        )
        write_bucketed_table(
            lineitem.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8
        )
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle paid at write
        # correctness unchanged
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_no_udf_kernel_captures_module_functions():
    """Executor Python workers are NOT guaranteed to have the package on
    sys.path (the driver imports ``__spark_entry__.py`` by file path).
    A nested mapInPandas/applyInPandas kernel that references a
    module-level function makes cloudpickle serialize that function BY
    REFERENCE — the worker then dies with ModuleNotFoundError (round-3
    verify caught this in media_decode_features). Every kernel must be
    self-contained: this AST guard scans the whole package."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "clickhouse_batcher_spark"
    offenders = []
    for path in pkg.rglob("*.py"):
        tree = ast.parse(path.read_text())
        toplevel_funcs = {
            n.name for n in tree.body if isinstance(n, ast.FunctionDef)
        }
        pkg_imports = {
            a.asname or a.name
            for n in tree.body
            if isinstance(n, ast.ImportFrom)
            and n.module
            and "clickhouse_batcher_spark" in n.module
            for a in n.names
        }
        risky = toplevel_funcs | pkg_imports
        for outer in ast.walk(tree):
            if not isinstance(outer, ast.FunctionDef):
                continue
            for inner in ast.walk(outer):
                if not isinstance(inner, ast.FunctionDef) or inner is outer:
                    continue
                loads = {
                    x.id
                    for x in ast.walk(inner)
                    if isinstance(x, ast.Name) and isinstance(x.ctx, ast.Load)
                }
                # local (nested) defs inside ``outer`` are pickled by
                # value — only module-scope references are risky
                local_defs = {
                    n.name
                    for n in ast.walk(outer)
                    if isinstance(n, ast.FunctionDef) and n is not outer
                }
                hits = (loads & risky) - local_defs
                if hits:
                    offenders.append(
                        f"{path.name}:{outer.name}/{inner.name} -> {sorted(hits)}"
                    )
    assert not offenders, f"kernels capturing module functions: {offenders}"


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    """Compacting a many-small-files table must keep every row/value
    and shrink the file count to the bin-packing plan's bin count."""
    from clickhouse_batcher_spark.sources.layout import (
        compact_parquet,
        list_data_files,
        plan_compaction,
    )
    from clickhouse_batcher_spark.tables import load_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events = load_table(spark, sf_dir, "events")
    events.repartition(40).write.parquet(src)

    files = list_data_files(spark, src)
    assert len(files) == 40
    total = sum(sz for _, sz in files)
    target = max(1, total // 4)
    plan = plan_compaction(files, target)
    # every file appears in exactly one bin
    assert sorted(f for b in plan for f in b) == sorted(f for f, _ in files)
    # no bin of 2+ small files exceeds the target
    by_name = dict(files)
    for b in plan:
        if len(b) > 1:
            assert sum(by_name[f] for f in b) <= target

    n_bins = compact_parquet(spark, src, dst, target)
    assert n_bins == len(plan)
    out_files = list_data_files(spark, dst)
    assert len(out_files) == n_bins < len(files)

    before = events.orderBy("event_id").toPandas()
    after = spark.read.parquet(dst).orderBy("event_id").toPandas()
    assert before.equals(after)


def test_compaction_size_fidelity_mode_tracks_plan_bins(spark, sf_dir, tmp_path):
    """size_fidelity=True writes each planned bin as one output file,
    so output sizes — not just the count — follow the plan: every
    output built from a multi-file bin stays within the target plus
    the single-file re-encode overhead (ADVICE r4: plain coalesce
    merges by adjacency and can blow past target_bytes arbitrarily)."""
    from clickhouse_batcher_spark.sources.layout import (
        compact_parquet,
        list_data_files,
        plan_compaction,
    )
    from clickhouse_batcher_spark.tables import load_table

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    events = load_table(spark, sf_dir, "events")
    events.repartition(24).write.parquet(src)

    files = list_data_files(spark, src)
    total = sum(sz for _, sz in files)
    target = max(1, total // 3)
    plan = plan_compaction(files, target)

    n_bins = compact_parquet(spark, src, dst, target, size_fidelity=True)
    assert n_bins == len(plan)
    out_files = list_data_files(spark, dst)
    assert len(out_files) == n_bins
    # Re-encoding merged row groups shifts sizes a little; 1.25x covers
    # dictionary/statistics overhead while still failing on the
    # adjacency-merge pathology this mode exists to prevent.
    for _, sz in out_files:
        assert sz <= target * 1.25, (sz, target)

    before = events.orderBy("event_id").toPandas()
    after = spark.read.parquet(dst).orderBy("event_id").toPandas()
    assert before.equals(after)


def test_bloom_file_skipping_index(spark, sf_dir, tmp_path):
    """ClickHouse bloom_filter skip-index analogue: build the sidecar
    over range-partitioned files, then (1) NO false negatives for any
    user, (2) real pruning for most users, (3) pruned reads equal
    full-scan reads."""
    from clickhouse_batcher_spark.sources.bloomindex import (
        build_bloom_index,
        prune_files,
        read_with_bloom_prune,
    )
    from clickhouse_batcher_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev_ranged")
    # Range layout: each file holds a narrow user range, so bloom
    # pruning has signal (a hash layout would put every user in every
    # file and the index would rightly keep everything).
    events.repartitionByRange(12, "user_id").write.parquet(path)
    index = build_bloom_index(spark, path, "user_id").cache()
    index_rows = index.collect()
    n_files = len({r["file"] for r in index_rows})
    assert n_files >= 8

    truth = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # Which file(s) really hold each user:
    actual_files = {
        r["user_id"]: set()
        for r in spark.read.parquet(path).select("user_id").distinct().collect()
    }
    for r in (
        spark.read.parquet(path)
        .select("user_id", F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ):
        actual_files[r["user_id"]].add(r["f"])

    pruned_counts = []
    for uid, files in actual_files.items():
        kept = set(prune_files(index_rows, uid))
        assert files <= kept, f"false negative for user {uid}"
        pruned_counts.append(len(kept))
    # bloom with 1024 bits / ~dozens of keys per file: most probes
    # should keep far fewer than all files
    assert sum(pruned_counts) / len(pruned_counts) < n_files * 0.6

    some_uid = sorted(truth)[len(truth) // 2]
    got = read_with_bloom_prune(spark, path, index, "user_id", some_uid)
    assert got.count() == truth[some_uid]
    # a value no file contains: prune everything, read nothing
    ghost = read_with_bloom_prune(spark, path, index, "user_id", -99999)
    assert ghost.count() == 0
    index.unpersist()


def test_queries_md_matches_live_catalog():
    """QUERIES.md is generated from the catalog; a new operator that
    skips `tools/gen_query_index.py` leaves the committed index stale
    (round-8 verdict item #5: the index said 231/219 while the catalog
    registered 235/223). This pins the counts and the name set."""
    import pathlib
    import re

    from clickhouse_batcher_spark import catalog

    catalog.load_all()
    md = (
        pathlib.Path(__file__).parent.parent / "QUERIES.md"
    ).read_text()
    m = re.search(r"\*\*(\d+) queries, (\d+) oracled\.\*\*", md)
    assert m, "QUERIES.md missing the generated count line"
    assert int(m.group(1)) == len(catalog.QUERIES), (
        f"QUERIES.md says {m.group(1)} queries, catalog registers "
        f"{len(catalog.QUERIES)} — rerun tools/gen_query_index.py"
    )
    assert int(m.group(2)) == len(catalog.ORACLES), (
        f"QUERIES.md says {m.group(2)} oracled, catalog has "
        f"{len(catalog.ORACLES)} — rerun tools/gen_query_index.py"
    )
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", md, re.M))
    assert listed == set(catalog.QUERIES), (
        "QUERIES.md rows diverge from the catalog: "
        f"missing={sorted(set(catalog.QUERIES) - listed)[:5]} "
        f"extra={sorted(listed - set(catalog.QUERIES))[:5]}"
    )
