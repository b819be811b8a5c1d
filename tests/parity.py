"""Local replica of the driver's correctness gate: Spark vs DuckDB.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, canonicalizes both results (columns sorted by
name, rows fully sorted), and asserts exact equality. Exactness is
deliberate — catching order-dependent float aggregation here is the
whole point (see ``functions.dec_sum``).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from clickhouse_batcher_spark.catalog import ORACLES, QUERIES
from clickhouse_batcher_spark.tables import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for col in out.columns:
        if out[col].dtype.kind == "M":
            # normalize datetime unit: ns-vs-us frames with NaT trip
            # pandas' cross-unit comparison
            out[col] = out[col].astype("datetime64[us]")
        if out[col].dtype == object:
            sample = out[col].dropna()
            if len(sample) and isinstance(sample.iloc[0], (bytes, bytearray)):
                out[col] = out[col].map(lambda b: None if b is None else bytes(b).hex())
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def assert_parity(spark, name: str, sf_dir: str) -> None:
    assert name in QUERIES, f"unknown query {name}"
    assert name in ORACLES, f"query {name} has no oracle"
    spark_pd = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    oracle_pd = con.execute(ORACLES[name]).df()
    con.close()

    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row count {len(spark_pd)} != oracle {len(oracle_pd)}"
    )
    assert sorted(spark_pd.columns) == sorted(oracle_pd.columns), (
        f"{name}: columns {sorted(spark_pd.columns)} != {sorted(oracle_pd.columns)}"
    )
    left = canonicalize(spark_pd)
    right = canonicalize(oracle_pd)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True)
