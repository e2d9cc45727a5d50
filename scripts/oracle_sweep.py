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

Writes a machine-readable artifact to ``SWEEP_<sfname>.json`` in the
repo root (override with ``$SWEEP_OUT``) so the round seal note quotes
the tool's output instead of hand-transcribed counts (the round-8
351-vs-352 churn came from exactly that).
"""

from __future__ import annotations

import json
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
    print(f"sweeping {len(names)} oracled queries at {sf_dir}", flush=True)
    t0 = time.time()
    failed: dict[str, str] = {}
    for i, name in enumerate(names):
        try:
            try:
                got = canon(REGISTRY[name].spark(spark, sf_dir).toPandas())
            finally:
                # per-query shared caches must not accumulate executor
                # storage across the 350+-query sweep
                release_shared_caches()
            want = canon(con.execute(REGISTRY[name].oracle).df())
            if list(got.columns) != list(want.columns):
                failed[name] = (
                    f"schema {list(got.columns)} vs {list(want.columns)}"
                )
            elif len(got) != len(want):
                failed[name] = f"rows {len(got)} vs {len(want)}"
            elif not got.equals(want):
                j = (got != want).any(axis=1).idxmax()
                failed[name] = (
                    f"values row {j}: {got.loc[j].to_dict()}"
                    f" vs {want.loc[j].to_dict()}"
                )
            else:
                print(f"ok {i + 1}/{len(names)} {name}", flush=True)
                continue
            print(f"FAIL {name} {failed[name]}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            failed[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            print(f"ERR {name} {failed[name]}", flush=True)
    artifact = {
        "sf_dir": sf_dir,
        "oracled_total": len(names),
        "passed": len(names) - len(failed),
        "failed": failed,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    out = os.environ.get(
        "SWEEP_OUT",
        str(
            Path(__file__).resolve().parents[1]
            / f"SWEEP_{Path(sf_dir).name}.json"
        ),
    )
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"SWEEP DONE {artifact['passed']}/{artifact['oracled_total']}"
        f" failures={len(failed)} -> {out}",
        flush=True,
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
