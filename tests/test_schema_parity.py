"""Cross-engine OUTPUT TYPE audit: for every oracled query, the Spark
result schema and the DuckDB oracle result schema must map to the same
normalized type per column (catches drift like DuckDB's
date_trunc→DATE or SUM(BIGINT)→HUGEINT before the driver's schema
check does)."""

from __future__ import annotations

import pytest

from data_lake_with_spark_spark.plans import REGISTRY
from tests.oracle_harness import duckdb_connection

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


def spark_norm(dt: str) -> str:
    dt = dt.lower()
    if dt in ("bigint", "long"):
        return "i64"
    if dt in ("int", "integer"):
        return "i32"
    if dt == "double":
        return "f64"
    if dt == "float":
        return "f32"
    if dt == "string":
        return "str"
    if dt.startswith("timestamp"):
        return "ts"
    if dt == "date":
        return "date"
    if dt == "boolean":
        return "bool"
    if dt.startswith("decimal"):
        return "dec"
    if dt.startswith("array"):
        return "list"
    return dt


def duck_norm(t) -> str:
    t = str(t).upper()
    if t == "BIGINT":
        return "i64"
    if t == "INTEGER":
        return "i32"
    if t == "DOUBLE":
        return "f64"
    if t == "FLOAT":
        return "f32"
    if t == "VARCHAR":
        return "str"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("DECIMAL"):
        return "dec"
    if t == "HUGEINT":
        return "i128"
    if t.endswith("[]") or t.startswith("LIST"):
        return "list"
    return t


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_output_types_align(spark, con, sf_dir, name):
    q = REGISTRY[name]
    sdt = {c: spark_norm(t) for c, t in q.spark(spark, sf_dir).dtypes}
    rel = con.sql(q.oracle)
    ddt = {c: duck_norm(t) for c, t in zip(rel.columns, rel.types)}
    assert sdt == ddt
