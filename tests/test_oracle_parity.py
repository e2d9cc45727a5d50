"""Differential test: every registered query vs its DuckDB oracle —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from data_lake_with_spark_spark.plans import REGISTRY
from tests.oracle_harness import duckdb_connection, run_one

ALL_QUERY_NAMES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ALL_QUERY_NAMES)
def test_query_matches_oracle(spark, con, sf_dir, name):
    result = run_one(spark, con, name, sf_dir)
    assert result.ok, f"{name}: {result.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"region_name", "order_year", "revenue", "n_lineitems"} == set(df.columns)


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
