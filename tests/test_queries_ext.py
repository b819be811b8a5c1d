"""Parity + bounds for the extended core SQL surface."""

import pytest

from clickhouse_batcher_spark import catalog

catalog.load_all()

from tests.parity import assert_parity

EXT_ORACLED = [
    "events_cube",
    "events_pivot_by_type",
    "events_analytics_window",
    "top10_orders",
    "events_json_extract",
    "quantity_percentiles",
]


@pytest.mark.parametrize("name", EXT_ORACLED)
def test_ext_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_approx_distinct_within_rated_error(spark, sf_dir):
    rows = catalog.QUERIES["approx_distinct_parts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact, approx = r["exact_parts"], r["approx_parts"]
        assert exact > 0
        # rsd=0.02 → generous 10% bound (multiple sigma)
        assert abs(approx - exact) / exact <= 0.10, (exact, approx)
