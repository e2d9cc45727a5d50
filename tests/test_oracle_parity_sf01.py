"""Second-scale oracle gate: the driver verifies at sf0.01 while the
default local gate (conftest SF_DIR) runs sf0.001 — data-dependent
failures can hide at the small scale (observed: a DuckDB `1 << 63`
overflow only reachable once user_id ≥ 63). This file re-runs a
ROTATING THIRD of every oracled query (sorted-name index mod 3 ==
ROUND mod 3 — bump ROUND each round so three rounds cover the whole
registry) plus every query touched this round at the DRIVER'S scale,
keeping the gap closed without tripling the whole suite's runtime.
"""

from __future__ import annotations

import pytest

from data_lake_with_spark_spark.plans import REGISTRY
from tests.oracle_harness import duckdb_connection, run_one

SF01 = "/root/testdata/sf0.01"

# Bump per round to rotate the third. r7 -> 1.
ROUND = 7

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROTATION = [n for i, n in enumerate(ORACLED) if i % 3 == ROUND % 3]

# Queries whose engine or oracle changed THIS round (always re-gated
# at driver scale regardless of where the rotation sits).
CHANGED_THIS_ROUND = [
    # operators/graph.py refactored to iterate-to-fixpoint defaults
    # (pinned n_iter paths re-verified under the new loop):
    "graph_label_propagation",
    "graph_pagerank_neardup",
    "graph_connected_components",
    "graph_kcore_membership",
    "graph_bfs_reachability",
    "graph_community_modularity",
    # plans/extended_ops.py — NEW this round (queued for the round-8
    # driver window; sf0.01-gated from birth here):
    "vector_topk_hamming",
    "cdc_changelog_compact",
    "ml_calibration_ece",
    "stats_mann_whitney_u",
    "training_tokenizer_fertility",
    "layout_zone_map_pruning",
    "graph_harmonic_centrality",
    "dedup_image_phash",
    "vector_topk_asymmetric",
    "dq_referential_integrity",
    "timeseries_holt_forecast",
    "join_asof_nearest",
    "layout_pruning_zorder_vs_linear",
    "training_dedup_rate_by_source",
    "stats_jensen_shannon",
    "vector_topk_ivfpq_portable",
    "join_interval_overlap",
    "dq_bloom_fpp",
    # plans/extended_ops2.py — NEW this round (continuation session):
    "cohort_retention_matrix",
    "interval_coalesce_spans",
    "ml_average_precision",
    "ml_gain_lift_deciles",
    "stats_poisson_bootstrap_ci",
    "recsys_item_item_topk",
    "finance_sma_crossover",
    "layout_encoding_advisor",
    "spatial_knn_grid",
    "events_pattern_regex",
    "stats_mutual_information",
    "text_rake_keywords",
    "stats_anova_oneway",
    "ml_best_split_gini",
    "layout_partition_advisor",
    "ml_psi_score_drift",
    "timeseries_stl_dow",
    "text_heaps_law",
    "ml_gain_lift_distributed",
    "stats_kaplan_meier",
    "multimodal_audio_vad",
    "finance_bollinger_breakouts",
    "graph_sssp_weighted",
    "ml_learning_curve_auc",
    "attribution_position_based",
    "ml_embedding_drift",
    "timeseries_cross_correlation",
    # plans/extended_ops3.py — NEW this round (third continuation
    # session; sf0.01-gated from birth here):
    "attribution_shapley",
    "stats_wilson_ci",
    "dq_fd_discovery",
    "text_winnowing_fingerprints",
    "recsys_markov_next_item",
    "spatial_dbscan_grid",
    "ml_isotonic_calibration",
    "feature_target_encoding_oof",
    "ml_forecast_backtest_mase",
    "stats_fdr_bh",
    "feature_quantile_normalize",
    "training_loso_source_value",
    "sequence_hmm_viterbi",
    "ml_conformal_interval",
    "pii_risk_kanonymity",
    "ab_sprt_monitor",
    "feature_hashing_audit",
    "ab_cuped_adjustment",
    "sessionize_timeout_sensitivity",
    "finance_lorenz_revenue",
]

NAMES = sorted(set(ROTATION) | set(CHANGED_THIS_ROUND))


@pytest.fixture(scope="module")
def con01():
    c = duckdb_connection(SF01)
    yield c
    c.close()


def test_gate_width():
    """The judge's round-5 directive: ≥70 oracled queries re-verified
    at the driver's scale each round."""
    assert len(NAMES) >= 70, len(NAMES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle_at_driver_scale(spark, con01, name):
    result = run_one(spark, con01, name, SF01)
    assert result.ok, f"{name}@sf0.01: {result.detail}"
