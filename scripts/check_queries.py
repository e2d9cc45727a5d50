#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles at one sf.

Usage:
    python scripts/check_queries.py name1 name2 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_queries.py ...

Same canonical compare as scripts/oracle_sweep.py (stringify datetimes,
sort columns by name, sort rows) — the fast inner loop for verifying a
just-edited query/oracle pair without paying the full-registry sweep.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lake_with_spark_spark.operators.plan_cache import (  # noqa: E402
    release_shared_caches,
)
from data_lake_with_spark_spark.plans import REGISTRY  # noqa: E402
from data_lake_with_spark_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    df = df.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py <query-name> ...")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="check_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            got = canon(q.spark(spark, sf_dir).toPandas())
        finally:
            release_shared_caches()
        if q.oracle is None:
            print(f"rows-only {name}: {len(got)} rows"
                  f" ({time.time() - t0:.1f}s)")
            continue
        want = canon(con.execute(q.oracle).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name} schema {list(got.columns)}"
                  f" vs {list(want.columns)}")
            rc = 1
        elif len(got) != len(want):
            print(f"FAIL {name} rows {len(got)} vs {len(want)}")
            rc = 1
        elif not got.equals(want):
            j = (got != want).any(axis=1).idxmax()
            print(f"FAIL {name} values row {j}: {got.loc[j].to_dict()}"
                  f" vs {want.loc[j].to_dict()}")
            rc = 1
        else:
            print(f"ok {name} rows={len(got)} ({time.time() - t0:.1f}s)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
