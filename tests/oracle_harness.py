"""Local replica of the driver's DuckDB-oracle differential check.

Mirrors the contract in ``/root/repo/__spark_entry__.py``: run the
Spark query and the oracle SQL on the same parquet tables, then compare
row count, column names (sorted), and cell values with columns sorted
by name and rows sorted — i.e. at least as strict as the driver's
order-insensitive value hash (we compare values exactly, not hashes,
so failures are diagnosable).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from data_lake_with_spark_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(index=df.index)
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("boolean")
        out[col] = s
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(name, False, f"row count {len(spark_pdf)} vs {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return CompareResult(name, False, f"columns {s_cols} vs {o_cols}")
    a, b = _canonicalize(spark_pdf), _canonicalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype("float64").to_numpy()
            bf = bv.astype("float64").to_numpy()
            for i, (x, y) in enumerate(zip(af, bf)):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                if not both_nan and x != y:
                    return CompareResult(
                        name, False, f"col {col} row {i}: {x!r} != {y!r}"
                    )
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                return CompareResult(
                    name, False, f"col {col} row {i}: {av[i]!r} != {bv[i]!r}"
                )
    return CompareResult(name, True, f"{len(spark_pdf)} rows")


def run_one(spark, con, name: str, sf_dir: str) -> CompareResult:
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )
    from data_lake_with_spark_spark.plans import REGISTRY

    q = REGISTRY[name]
    sdf = q.spark(spark, sf_dir)
    try:
        spark_pdf = sdf.toPandas()
    finally:
        # Shared-subtree caches (operators/plan_cache) are per-query
        # artifacts: release them once the result is materialized so a
        # full-registry sweep doesn't accumulate executor storage
        # across hundreds of queries (always correctness-safe — a
        # released frame recomputes).
        release_shared_caches()
    if q.oracle is None:
        return CompareResult(name, True, f"rows-only: {len(spark_pdf)} rows")
    oracle_pdf = con.sql(q.oracle).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
