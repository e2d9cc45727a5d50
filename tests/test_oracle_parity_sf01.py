"""Second-scale oracle gate: the driver verifies at sf0.01 while the
default local gate (conftest SF_DIR) runs sf0.001 — data-dependent
failures can hide at the small scale (observed: a DuckDB `1 << 63`
overflow only reachable once user_id ≥ 63). This file re-runs the
queries added in late round 5 at the DRIVER'S scale so the gap stays
closed without doubling the whole suite's runtime."""

from __future__ import annotations

import pytest

from tests.oracle_harness import duckdb_connection, run_one

SF01 = "/root/testdata/sf0.01"

LATE_R5 = [
    "dedup_repeated_spans",
    "streaks_active_days",
    "interval_max_concurrency",
    "vector_topk_matryoshka",
    "vector_kmeans_lloyd",
    "vector_kmeans_silhouette",
    "text_readability",
    "sample_weighted_priority",
    "stats_chi_square_cells",
    "quantile_fixed_histogram",
    "multimodal_spectral_power",
    "multimodal_image_quadrants",
    "search_phrase_positional",
    "anomaly_cusum_changepoint",
    "text_cooccurrence_lift",
    "scd2_priority_intervals",
    "graph_covisitation_pairs",
    "graph_triangle_count",
    "graph_link_prediction",
    "sketch_hll_portable",
    "window_weekly_active_users",
    "funnel_unordered_set",
    "segment_rfm_customers",
    "segment_abc_pareto",
    "agg_bitmap_distinct_users",
    "score_activity_decay",
    "join_asof_cogroup",
    "window_wau_bitmap",
    "graph_local_clustering",
    "basket_part_affinity",
    "segment_abc_distributed",
    "segment_rfm_distributed",
    "join_hint_shuffle_hash",
    "regression_theil_sen",
    "features_lag_purchases",
    "activity_dow_hour_matrix",
    "score_user_gini_diversity",
    "scalar_try_functions",
    "finance_max_drawdown",
    "anomaly_rate_bursts",
    "orders_interarrival_gaps",
    "cohort_ltv_yearly",
    "growth_top_parts_yoy",
    "sequence_bigram_support",
    "training_mlm_mask",
    "stats_benford_digits",
    "supplier_nation_share",
]


@pytest.fixture(scope="module")
def con01():
    c = duckdb_connection(SF01)
    yield c
    c.close()


@pytest.mark.parametrize("name", LATE_R5)
def test_query_matches_oracle_at_driver_scale(spark, con01, name):
    result = run_one(spark, con01, name, SF01)
    assert result.ok, f"{name}@sf0.01: {result.detail}"
