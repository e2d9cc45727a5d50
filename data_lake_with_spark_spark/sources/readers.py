"""Schema-armed readers.

The reference listed S3 keys driver-side with a boto3 paginator
(reference ``etl.py:41-59``) and then read an explicit path list; Spark's
own file index does that listing natively from a glob, so the rebuild
takes paths/globs straight (SURVEY §2.1 S7). JSON/CSV reads REQUIRE a
schema — inference is a full extra pass over 100 TB and a type-drift
hazard (the reference's own declared schema went unused, §2.9 B7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession, paths: str | list[str], schema: T.StructType
) -> DataFrame:
    """JSON scan with mandatory explicit schema (reference etl.py:95-96,
    S1/S2 — the intended schema-armed form)."""
    return spark.read.schema(schema).json(paths)


def read_csv(
    spark: SparkSession, paths: str | list[str], schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).csv(paths, header=header)


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet scan (reference etl.py:109 et al., S3) — parquet footers
    are the explicit schema."""
    if isinstance(paths, str):
        return spark.read.parquet(paths)
    return spark.read.parquet(*paths)


def read_orc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """ORC scan — like parquet, self-describing (embedded schema,
    column stats, predicate pushdown), so no schema argument."""
    if isinstance(paths, str):
        return spark.read.orc(paths)
    return spark.read.orc(*paths)


def read_jsonl(
    spark: SparkSession, paths: str | list[str], schema: T.StructType
) -> DataFrame:
    """Line-delimited JSON (the interchange format LLM corpora ship
    in) with mandatory schema — same no-inference policy as
    read_json; Spark's json source is newline-delimited by default."""
    return spark.read.schema(schema).json(paths)
