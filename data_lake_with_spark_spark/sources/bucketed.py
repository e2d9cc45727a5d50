"""Bucketed (pre-partitioned, co-located) tables: the write-time
answer to join shuffles.

A big⋈big equi-join shuffles BOTH sides on the key every run. Writing
each side ``bucketBy(n, key)`` fixes the hash partitioning in the
table layout, so any later equi-join (or groupBy) on that key reads
co-located buckets and runs with ZERO exchanges — at 100 TB this turns
the nightly fact⋈fact join from the dominant shuffle into a local
merge. The price is paid once at write time and the bucket count is a
layout contract (both sides must agree; Spark handles a mismatch by
shuffling the smaller-bucketed side only).

Spark requires bucketed data to live in a CATALOG table (the bucket
spec is metastore metadata, not parquet-file metadata), hence
``saveAsTable`` rather than ``parquet(path)`` — the files themselves
are plain parquet in the warehouse dir.

Reference analog: the reference rewrites whole dims every run
(``etl.py:120-128``, full overwrite, no layout thought); this is the
layout its fact/dim joins would need at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS plus removal of any orphaned managed-table
    location. A warehouse dir left by a PREVIOUS session (whose
    catalog entry died with its derby metastore) makes ``saveAsTable``
    fail with LOCATION_ALREADY_EXISTS even in overwrite mode — the
    location exists but no table claims it. Re-runnable jobs that
    materialize bucketed tables call this first."""
    import os
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = urlparse(wh).path or wh
    loc = os.path.join(root, table.split(".")[-1].lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table. ``sort_cols``
    additionally sorts within each bucket file, which lets a
    SortMergeJoin skip its sort too (bucket+sort = fully pre-arranged
    join input). Overwrites clear stale same-name locations from dead
    sessions first (see drop_table_and_location)."""
    if mode == "overwrite":
        drop_table_and_location(df.sparkSession, table)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. When
    both sides were written with the same bucket spec this plans with
    no Exchange on either side (plan-asserted in
    tests/test_bucketed.py).

    The MERGE hint pins a SortMergeJoin: that is the join the bucketed
    layout exists for (big⋈big, both sides pre-hashed and pre-sorted),
    and without it a small test-scale side gets broadcast instead —
    which disables the bucketed scan and with it the demonstration.
    At production scale the planner picks SMJ for big⋈big anyway, so
    the hint only removes scale-dependence from the plan shape."""
    return (
        spark.table(left_table).hint("merge").join(spark.table(right_table), on, how)
    )
