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


