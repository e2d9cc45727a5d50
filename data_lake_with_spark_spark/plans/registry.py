"""Query registry plumbing.

A ``Query`` couples a Spark implementation ``(spark, sf_dir) ->
DataFrame`` with its DuckDB oracle SQL (or ``None`` for genuinely
non-SQL-expressible operators → the driver degrades to a rows-only
check). The driver contract lives in ``/root/repo/__spark_entry__.py``.

Parity rules enforced by convention here (SURVEY §7.3):
- alias every computed column identically in Spark and SQL;
- round float aggregates on BOTH sides (sum-order nondeterminism means
  the last ulp of a double aggregate is not reproducible);
- never oracle nondeterministic outputs (monotonically_increasing_id).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco
