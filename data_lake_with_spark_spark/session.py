"""SparkSession factory.

Rebuilds the reference's ``create_spark_session`` (reference
``etl.py:30-38``) minus the S3A jar bootstrap, plus the settings that
matter for (a) DuckDB-oracle parity and (b) scale posture:

- ``spark.sql.session.timeZone=UTC`` — Spark TIMESTAMP is session-TZ
  adjusted; DuckDB's is UTC-naive. Pinning UTC makes calendar functions
  (hour/day/month/...) agree between the two engines.
- AQE on (coalesce + skew join) — at 100 TB the static shuffle
  partition count is always wrong somewhere; AQE re-plans at runtime.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — Spark 4 refuses
  parquet TIMESTAMP(NANOS); the testdata ``events.ts`` is ns. We read
  it as a long and convert (exactly) in the catalog.
- Arrow enabled — all Python-side operators use vectorized pandas UDFs,
  never row-at-a-time UDFs (the reference's single biggest perf bug,
  reference ``etl.py:173``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def get_spark(
    app_name: str = "data_lake_with_spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Local mode is a single JVM; on a real cluster the same conf applies
    unchanged — partitioning discipline lives in the operators, not here.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter pruning of shuffle-join probe sides:
        # invisible at bench scale (size thresholds gate it) but cuts
        # fact-side shuffle volume on selective dim filters at 100 TB
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
