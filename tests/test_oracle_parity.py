"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from flink_wsr_project_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.parity import assert_parity

_ORACLES = all_oracles()
_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_parity(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert_parity(df, _ORACLES[name], SF_DIR, name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
