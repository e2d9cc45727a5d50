#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles at one sf.

Usage:
    python scripts/check_queries.py name1 name2 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_queries.py ...

A thin CLI over ``tests/oracle_harness`` (the SAME compare the pytest
gates run — exact values, sorted columns/rows, datetimes stringified),
so this fast inner loop can never diverge from the gates. One bad name
or a throwing query reports FAIL/ERR and the sweep continues.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_lake_with_spark_spark.plans import REGISTRY  # noqa: E402
from data_lake_with_spark_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import duckdb_connection, run_one  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py <query-name> ...")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="check_queries")
    con = duckdb_connection(sf_dir)
    rc = 0
    for name in names:
        t0 = time.time()
        try:
            result = run_one(spark, con, name, sf_dir)
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"ERR {name} {type(ex).__name__}: {str(ex)[:200]}")
            rc = 1
            continue
        status = "ok" if result.ok else "FAIL"
        if not result.ok:
            rc = 1
        print(f"{status} {name} {result.detail} ({time.time() - t0:.1f}s)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
