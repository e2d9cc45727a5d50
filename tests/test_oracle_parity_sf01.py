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

# Bump per round to rotate the third. r6 -> 0.
ROUND = 6

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROTATION = [n for i, n in enumerate(ORACLED) if i % 3 == ROUND % 3]

# Queries whose engine or oracle changed THIS round (always re-gated
# at driver scale regardless of where the rotation sits).
CHANGED_THIS_ROUND = [
    "dedup_repeated_spans",       # hashed span index default
    "score_activity_decay",       # weight floors at 0 past 8 weeks
    "agg_bitmap_distinct_users",  # pmod/div exact integer chunking
    "window_wau_bitmap",          # pmod/div exact integer chunking
    "graph_triangle_count",       # empty-edge guard
    "graph_pagerank_neardup",     # scaled-integer + unrolled oracle
    # new queries this round:
    "graph_label_propagation",
    "stats_exact_percentiles",
    "sketch_theta_overlap",
    "search_hybrid_rrf",
    "text_vocab_coverage",
    "attribution_last_touch",
    "stats_weighted_median",
    "multimodal_bytestats_arrow",
    "dq_join_skew_profile",
    "stats_winsorized_mean",
    "timeseries_seasonality_dow",
    "pipeline_trainset_stats",
    "agg_mode_deterministic",
    "spatial_grid_near_pairs",
    "ab_test_conversion",
    "spatial_pyramid_rollup",
    "join_hint_merge",
    "graph_bfs_reachability",
    "inventory_capped_balance",
    "finance_ohlc_hourly",
    "timeseries_twap_daily",
    "window_users_to_date",
    "dim_calendar_spine",
    "training_quality_mixture",
    "layout_zorder_locality",
    "layout_compaction_bins",
    "training_cv_folds",
    "feature_target_encoding",
    "timeseries_ewma_halflife",
    "stats_ks_two_sample",
    "search_mmr_rerank",
    "graph_connected_components",
    "cdc_scd2_apply",
    "feature_quantile_bins",
    "text_bigram_logprob",
    "multimodal_video_decimate",
    "ml_auc_rank_sum",
    "ml_threshold_metrics",
    "scan_file_metadata",
    "stats_welch_ttest",
    "feature_impute_group_mean",
    "stats_kl_weekday",
    "graph_community_modularity",
    "dq_freshness_by_type",
    "sketch_hll_cube",
    "sort_keyset_pagination",
    "join_pointintime_scd2",
    "graph_kcore_membership",
    "stats_skew_kurtosis",
    "stats_cramers_v",
    "ml_recall_mrr_at_k",
    "vector_topk_lsh_portable",
    "ml_ndcg_at_k",
    "text_char_entropy",
    "ml_minhash_jaccard_error",
    "dedup_minhash_portable",
    "pipeline_neardup_trainset",
    "dedup_image_ahash",
    "dq_coverage_gaps",
    "stats_runs_test",
    "finance_var_historical",
    "skyline_pareto_orders",
    "text_ngram_novelty",
    "audience_overlap_exact",
    "join_relational_division",
    "dq_table_diff_checksums",
    "timeseries_rolling_corr",
    "stats_spearman_corr",
    "events_transition_entropy",
    "orders_ship_delay_stats",
    "timeseries_interpolate_linear",
    "timeseries_autocorrelation",
    "graph_assortativity",
    "training_length_buckets",
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
