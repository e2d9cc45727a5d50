"""Testdata catalog: loads the driver's parquet tables with normalized types.

Tables (``/root/repo/TESTDATA.md``): region nation customer supplier part
orders lineitem events documents embeddings.

The only normalization is ``events.ts``: the driver has shipped it as
both TIMESTAMP(NANOS) (epoch-nanos ``bigint`` under ``nanosAsLong``)
and ``timestamp[us]`` (TIMESTAMP_NTZ in Spark 4); both are normalized
to TIMESTAMP by ``functions.time.normalize_ts`` — see that module for
the exactness argument per encoding.

This is the rebuild of the reference's source layer (reference
``etl.py:96,170``: JSON feeds; here the driver feeds are parquet), with
the reference's intent of *explicit schemas everywhere* (its declared
``SongSchema`` at ``etl.py:75-86`` was accidentally unused, SURVEY §2.9
B7 — parquet is self-describing so the footer is the explicit schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_lake_with_spark_spark.functions.time import normalize_ts

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


# Inferred parquet schemas, keyed by (path, nanosAsLong setting): every
# bare ``spark.read.parquet`` fires a small schema-inference job at
# PLAN-CONSTRUCTION time, so building all 289 registered frames used to
# run 289+ no-op jobs before any action. A table file's schema is a
# property of the path (plus the nanos conf, which changes how
# TIMESTAMP(NANOS) columns infer), so infer once per process and
# construct every later scan with the explicit schema — zero jobs. The
# cache never goes stale in practice (testdata paths are immutable
# within a process); a changed conf or path simply misses to a fresh
# inference.
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = table_path(sf_dir, name)
    try:
        nanos = str(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"))
    except Exception:
        nanos = "false"
    key = (path, nanos)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = normalize_ts(df, "ts")
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


# Partition-count probe cache for the narrowness checks below
# (round-15 construction-chatter cut, guide §1.2 applied to DRIVER
# latency): ``df.rdd.getNumPartitions()`` on a FRESH plan builds the
# whole python-RDD conversion — measured ~80 ms per call, paid once
# per widen site per bench pass. The count is a pure function of the
# SEMANTIC plan (source layout + narrow chain), so it is memoized on
# ``analyzed().semanticHash()`` (~14 ms). A hash collision or a
# mid-session file change could return a stale count, which only
# flips a repartition DECISION — values are unaffected by layout.
_NPART_CACHE: dict[tuple[int, int], int] = {}


def scan_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical scan, memoized on the
    analyzed plan's semantic hash (see _NPART_CACHE note)."""
    try:
        key = (
            id(df.sparkSession),
            df._jdf.queryExecution().analyzed().semanticHash(),  # noqa: SLF001
        )
    except Exception:  # non-classic session — probe directly
        return df.rdd.getNumPartitions()
    n = _NPART_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _NPART_CACHE[key] = n
    return n


def widen_if_narrow(
    df: DataFrame,
    spark: SparkSession,
    min_ratio: float = 0.5,
    target_bytes: int | None = None,
) -> DataFrame:
    """Repartition a scan that is narrower than the cluster.

    Single-file/single-row-group parquet (the testdata shape) scans as
    ONE task, which serializes any compute-heavy map stage above it.
    When the scan has fewer than ``min_ratio × defaultParallelism``
    partitions, shuffle it wide first — at sf0.1 this trades a ~30 MB
    shuffle for parallel partial aggregation (q1: 1.3s → 0.8s). On a
    real multi-file table the partition count is already ≥ cores and
    this is a no-op, so the helper is safe to leave in at 100 TB.
    Use ONLY above compute-heavy aggregation; joins shuffle anyway and
    an extra hop would just add cost.

    ``target_bytes`` (round-15, the round-14 verdict's row-aware-width
    directive): when set, the widened width is derived from the plan's
    SIZE estimate — ``min(cores, ceil(est / target_bytes))`` — instead
    of unconditionally ``cores``. For byte-proportional work (q5's
    join+partial-agg: A/B at sf0.1 measured width 8/16 ≈ 0.95-0.99s vs
    width 32 ≈ 1.09s — task-launch overhead past the data's
    parallelism) the estimate-derived width removes the overhead while
    still clamping to full cluster width the moment the input grows
    (est scales with the scan, so any real table reaches ``cores``).
    Leave ``None`` for compute-heavy-per-byte stages (the LSH probe
    explosion) where byte accounting UNDERestimates the work — the
    r14 lesson, guide §2.6.
    """
    cores = spark.sparkContext.defaultParallelism
    if scan_partitions(df) < max(2, int(cores * min_ratio)):
        width = cores
        if target_bytes:
            est = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001
            )
            width = max(2, min(cores, -(-est // target_bytes)))
        return df.repartition(width)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so ``spark.sql`` can be used
    interchangeably with the DataFrame API (same Catalyst plans)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
