#!/usr/bin/env python
"""Driver-window simulation: run the FIRST 50 ``queries()`` entries
(exactly what the round driver records into CORRECTNESS_r{N}.json)
against DuckDB at sf0.01, the way the driver does — vanilla
SparkSession (deliberately non-UTC so ``_configure`` must fix it),
sorted-column exact-value compare, datetimes stringified.

    python scripts/driver_sim.py            # the 50-query window
    python scripts/driver_sim.py name1 ...  # specific queries

Exit code 0 = every oracled query exact. Run this TWICE before a
round seal (the seal ritual since round 9)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from pyspark.sql import SparkSession  # noqa: E402
import duckdb  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/Chicago")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, osql = E.queries(), E.oracle_sql()
names = sys.argv[1:] or list(qs)[:50]
t0 = time.time()
fails, rows_only = [], []
for name in names:
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
        fails.append((name, f"spark-err {type(ex).__name__}: {str(ex)[:100]}"))
        continue
    if name not in osql:
        rows_only.append((name, len(sdf)))
        continue
    try:
        odf = con.execute(osql[name]).df()
    except Exception as ex:  # noqa: BLE001
        fails.append((name, f"oracle-err {type(ex).__name__}: {str(ex)[:100]}"))
        continue
    for df in (sdf, odf):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    cols = sorted(sdf.columns)
    if cols != sorted(odf.columns):
        fails.append((name, f"schema {cols} vs {sorted(odf.columns)}"))
        continue
    a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    if len(a) != len(b):
        fails.append((name, f"rows {len(a)} vs {len(b)}"))
    elif not a.equals(b):
        bad = (a != b).any(axis=1)
        fails.append((name, f"values ({int(bad.sum())} rows differ)"))
print(
    f"driver sim: {len(names)} run, "
    f"{len(names) - len(fails) - len(rows_only)} exact, "
    f"{len(rows_only)} rows-only, {len(fails)} FAIL in {time.time() - t0:.0f}s"
)
for f in fails:
    print("FAIL", f)
for r in rows_only:
    print("rows-only", r)
sys.exit(1 if fails else 0)
