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
    extended_ops,
    extended_ops2,
    extended_ops3,
    extended_ops4,
    extended_ops5,
    extended_ops6,
    extended_ops7,
    extended_ops8,
    extended_ops9,
    extended_ops10,
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

# Queries whose CONSTRUCTION runs Spark jobs before any action on the
# returned frame (the machine-readable deviation from the lazy
# contract, round-6 verdict directive #5). Two causes, both inherent
# to the algorithms: (a) iterative kernels that localCheckpoint each
# round to truncate lineage (graph family, k-means/PCA/IVF codebook
# training, bucketed-index builds), and (b) two-phase operators whose
# phase 1 collects a bounded driver artifact (≤ a few hundred rows:
# histogram boundaries, quantile cuts, greedy-MMR pool) that phase 2
# embeds as literals. Every query NOT listed here builds its plan with
# ZERO jobs — enforced by tests/test_lazy_construction.py. A harness
# that wants to pre-construct all frames cheaply should skip these.
EAGER_QUERIES: frozenset[str] = frozenset(
    {
        "corpus_clean_pipeline",
        "decontaminate_bloom",
        "dedup_cluster_keep_best",
        "dedup_cluster_keep_min",
        "feature_quantile_bins",
        "graph_bfs_reachability",
        "graph_cc_incremental_equivalence",
        "graph_cc_retraction_equivalence",
        "graph_sssp_weighted",
        "graph_community_modularity",
        "graph_connected_components",
        "graph_kcore_membership",
        "graph_label_propagation",
        "graph_pagerank_neardup",
        "graph_triangle_count",
        "ingest_dedup_clusters_maintained",
        "join_bucketed_colocated",
        "rag_chunk_retrieval_ivf",
        "search_mmr_rerank",
        "segment_rfm_distributed",
        "sort_keyset_pagination",
        "spatial_dbscan_grid",
        "stats_exact_percentiles",
        "text_bpe_tokenize",
        "vector_kmeans_lloyd",
        "vector_kmeans_silhouette",
        "vector_pca_project",
        "vector_topk_ivf",
        "vector_topk_pca",
        "vector_topk_pq",
    }
)

__all__ = ["REGISTRY", "Query", "register", "EAGER_QUERIES"]
