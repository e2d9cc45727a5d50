#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale factor.

The pytest gates cover sf0.001 (all oracled queries, every run) and
sf0.01 (rotating third + changed + never-driver-verified). This script
runs EVERY oracled query against DuckDB at whatever scale
``$SPARK_GRAFT_SF_DIR`` points to (default sf0.1) — the overflow-class
hunter: two int64 overflows (ssq·1e6 term scaling, s1² variance
numerators) manifested ONLY at sf0.1 during round 8, invisible to both
pytest gates. Run it after adding arithmetic-heavy queries or before a
round close:

    python scripts/oracle_sweep.py            # sf0.1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/oracle_sweep.py

Round-8 baseline: 351/351 oracled queries matched exactly at sf0.1
(rows + schema + values after the canonical stringify/sort compare).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
    print(f"sweeping {len(names)} oracled queries at {sf_dir}", flush=True)
    failures = 0
    for i, name in enumerate(names):
        try:
            got = canon(REGISTRY[name].spark(spark, sf_dir).toPandas())
            want = canon(con.execute(REGISTRY[name].oracle).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name} schema {list(got.columns)} vs"
                      f" {list(want.columns)}", flush=True)
                failures += 1
            elif len(got) != len(want):
                print(f"FAIL {name} rows {len(got)} vs {len(want)}", flush=True)
                failures += 1
            elif not got.equals(want):
                j = (got != want).any(axis=1).idxmax()
                print(f"FAIL {name} values row {j}: {got.loc[j].to_dict()}"
                      f" vs {want.loc[j].to_dict()}", flush=True)
                failures += 1
            else:
                print(f"ok {i + 1}/{len(names)} {name}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"ERR {name} {type(ex).__name__}: {str(ex)[:200]}", flush=True)
            failures += 1
    print(f"SWEEP DONE failures={failures}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
