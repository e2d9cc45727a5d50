"""Named query registry — the engine's public query surface.

Every query in SURVEY.md §2's inventory registers here with BOTH a
DataFrame implementation and (where SQL-expressible) a DuckDB oracle
SQL string. Importing this package populates the registry.
"""

from data_lake_with_spark_spark.plans.registry import REGISTRY, Query, register

# Import for side effects: each module registers its queries.
from data_lake_with_spark_spark.plans import (  # noqa: E402,F401
    analytics_ops,
    corpus_ops,
    lakehouse_ops,
    reference_surface,
    relational,
    relational2,
    semantic_ops,
    tpch_deep,
    tpch_deep2,
    llm_ops,
    quality_ops,
    training_ops,
    windows_batch,
)

__all__ = ["REGISTRY", "Query", "register"]
