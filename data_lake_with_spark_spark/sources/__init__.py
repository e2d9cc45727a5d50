"""Sources & sinks: schema-armed readers and partition-disciplined
writers, including the incremental upsert sink (the reference's
signature compound operator, SURVEY §2.5)."""

from data_lake_with_spark_spark.sources.readers import (
    read_csv,
    read_json,
    read_jsonl,
    read_orc,
    read_parquet,
)
from data_lake_with_spark_spark.sources.writers import upsert_parquet, write_partitioned

__all__ = [
    "read_csv",
    "read_json",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "upsert_parquet",
    "write_partitioned",
]
