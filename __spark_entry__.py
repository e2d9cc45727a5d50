"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_lake_with_spark_spark``; this module is
a thin adapter over the query registry
(``data_lake_with_spark_spark.plans.REGISTRY``).

Lazy-construction contract: every ``queries()[name]`` call builds its
plan with ZERO Spark jobs (enforced by
``tests/test_lazy_construction.py``) EXCEPT the queries declared in
``data_lake_with_spark_spark.plans.EAGER_QUERIES`` (re-exported here
as ``EAGER_QUERIES``): iterative kernels that checkpoint per round and
two-phase operators that collect a bounded driver artifact run real
jobs at construction time.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO_ROOT))

from data_lake_with_spark_spark.plans import (  # noqa: E402
    EAGER_QUERIES,  # noqa: F401  — contract surface, see module docstring
    REGISTRY,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's CORRECTNESS_r{N}.json records exactly the FIRST 50
# entries of queries() in dict-insertion order. With 271 registered
# queries, insertion order decides which operators get driver-verified
# rows — so the dict leads with a hand-picked 50 covering one flagship
# per operator family (reference surface, TPC-H/relational, join
# matrix, event analytics, LLM-pipeline); the remaining queries follow
# in sorted order and are covered by tests/test_oracle_parity.py
# against the same DuckDB oracle.
DRIVER_WINDOW = [
    # Round-7 rotation: the entire round-6 window went 50/50
    # rows+schema+hash (CORRECTNESS_r06.json, durable in git), so all
    # unchanged r6 rows rotate out and the window carries 48
    # FIRST-TIME queries — never driver-hash-verified in any round's
    # CORRECTNESS file (computed from the union of r01–r06: 109 oracled
    # queries had no row; this window takes 48, leaving ~61 queued for
    # round 8) — plus the two previously-verified graph queries whose
    # engine changed this round (operators/graph.py now defaults to
    # iterate-to-fixpoint; the registered queries pin n_iter and must
    # be re-verified under the refactored loop).
    #
    # ROUND-8 ROTATION QUEUE (never driver-verified after this round,
    # rotate in once this window's rows are durable): ab_test_conversion,
    # activity_dow_hour_matrix, agg_mode_deterministic,
    # agg_regression_trend, anomaly_mad_daily, anomaly_rate_bursts,
    # dim_calendar_spine, events_transition_entropy, features_lag_purchases,
    # finance_ohlc_hourly, funnel_conversion_latency, funnel_unordered_set,
    # growth_top_parts_yoy, inventory_capped_balance, join_hint_merge,
    # join_hint_shuffle_hash, join_range_outer_5min, ml_threshold_metrics,
    # multimodal_audio_clip, multimodal_bytestats_arrow,
    # multimodal_frame_sample, orders_interarrival_gaps,
    # orders_ship_delay_stats, q2_min_cost_supplier,
    # q20_heavy_promo_suppliers, regression_theil_sen,
    # sample_stratified_topk, scalar_* (4), score_user_gini_diversity,
    # segment_abc_* (2), segment_rfm_distributed, sequence_bigram_support,
    # spatial_* (2), stats_spearman_corr, stats_table_profile,
    # subquery_(not_)in_nations, supplier_nation_share,
    # text_decontaminate, text_lang_profile, text_ngram_novelty,
    # text_top_tokens, text_vocab_coverage, text_vocab_oov,
    # timeseries_autocorrelation, timeseries_interpolate_linear,
    # timeseries_seasonality_dow, timeseries_twap_daily,
    # training_length_buckets, training_quality_mixture,
    # training_split_counts, vector_near_pairs, window_cume_nth,
    # window_lag_gaps, window_ntile_first_last, window_users_to_date.
    # Plus the eighteen round-7 additions in plans/extended_ops.py
    # (sf0.01-gated at birth via CHANGED_THIS_ROUND):
    # vector_topk_hamming, vector_topk_asymmetric,
    # cdc_changelog_compact, ml_calibration_ece, stats_mann_whitney_u,
    # training_tokenizer_fertility, layout_zone_map_pruning,
    # graph_harmonic_centrality, dedup_image_phash,
    # dq_referential_integrity, timeseries_holt_forecast,
    # join_asof_nearest, layout_pruning_zorder_vs_linear,
    # training_dedup_rate_by_source, stats_jensen_shannon,
    # vector_topk_ivfpq_portable, join_interval_overlap, dq_bloom_fpp.
    # Plus the eighteen continuation-session additions in
    # plans/extended_ops2.py (also sf0.01-gated at birth):
    # cohort_retention_matrix, interval_coalesce_spans,
    # ml_average_precision, ml_gain_lift_deciles,
    # stats_poisson_bootstrap_ci, recsys_item_item_topk,
    # finance_sma_crossover, layout_encoding_advisor,
    # layout_partition_advisor, spatial_knn_grid, events_pattern_regex,
    # stats_mutual_information, text_rake_keywords, stats_anova_oneway,
    # ml_best_split_gini, ml_psi_score_drift, timeseries_stl_dow,
    # text_heaps_law. Plus the third-continuation-session additions in
    # plans/extended_ops3.py (sf0.01-gated at birth):
    # attribution_shapley, stats_wilson_ci, dq_fd_discovery, and the
    # rest listed in tests/test_oracle_parity_sf01.py
    # CHANGED_THIS_ROUND.
    #
    # changed this round (re-verify under the fixpoint-default graph
    # operator refactor; both held green rows before):
    "graph_label_propagation",    # pinned n_iter path through new loop
    "graph_pagerank_neardup",     # empty-graph guard + refactor
    # graph family, first-time (also touched by the refactor):
    "graph_connected_components",
    "graph_kcore_membership",
    "graph_bfs_reachability",
    "graph_community_modularity",
    "graph_assortativity",
    "graph_link_prediction",
    # CDC / lakehouse, first-time:
    "cdc_scd2_apply",
    "join_pointintime_scd2",
    "layout_zorder_locality",
    "layout_compaction_bins",
    "scan_file_metadata",
    "sort_keyset_pagination",
    # feature engineering, first-time:
    "feature_target_encoding",
    "feature_quantile_bins",
    "feature_impute_group_mean",
    "training_cv_folds",
    # statistics, first-time:
    "stats_ks_two_sample",
    "stats_welch_ttest",
    "stats_skew_kurtosis",
    "stats_cramers_v",
    "stats_kl_weekday",
    "stats_runs_test",
    "stats_weighted_median",
    "stats_winsorized_mean",
    # sketches / retrieval, first-time:
    "sketch_hll_cube",
    "audience_overlap_exact",
    "search_mmr_rerank",
    "search_hybrid_rrf",
    # data quality, first-time:
    "dq_coverage_gaps",
    "dq_freshness_by_type",
    "dq_join_skew_profile",
    "dq_quarantine_rows",
    "dq_table_diff_checksums",
    # ANN eval / ML metrics, first-time:
    "ml_auc_rank_sum",
    "ml_ndcg_at_k",
    "ml_recall_mrr_at_k",
    "ml_minhash_jaccard_error",
    # pipeline / dedup / relational, first-time:
    "skyline_pareto_orders",
    "pipeline_neardup_trainset",
    "dedup_image_ahash",
    "join_relational_division",
    "attribution_last_touch",
    # time series / finance, first-time:
    "timeseries_ewma_halflife",
    "timeseries_rolling_corr",
    "finance_var_historical",
    # text / multimodal, first-time:
    "text_bigram_logprob",
    "text_char_entropy",
    "multimodal_video_decimate",
]


def _ordered_names() -> list[str]:
    rest = sorted(n for n in REGISTRY if n not in set(DRIVER_WINDOW))
    return [n for n in DRIVER_WINDOW if n in REGISTRY] + rest


def _ship_package(spark: SparkSession) -> None:
    """Make ``data_lake_with_spark_spark`` importable inside executor
    Python workers regardless of the driver's cwd/PYTHONPATH — the
    ``--py-files`` deployment path, done programmatically. Arrow UDF
    stages (mapInPandas/applyInPandas) deserialize functions by module
    reference, so workers must be able to import the package; on a real
    cluster this addPyFile is also how the package reaches executors."""
    sc = spark.sparkContext
    if getattr(sc, "_dlws_pyfiles_shipped", False):
        return
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="dlws_pyfiles_"), "data_lake_with_spark_spark.zip"
    )
    pkg = _REPO_ROOT / "data_lake_with_spark_spark"
    with zipfile.ZipFile(zpath, "w") as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(_REPO_ROOT).as_posix())
    sc.addPyFile(zpath)
    sc._dlws_pyfiles_shipped = True


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the oracle-parity/session settings that matter even when
    the driver owns SparkSession construction."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; catalog handles long ts either way
    try:
        _ship_package(spark)
    except Exception:
        pass  # best-effort: local runs with repo-root cwd don't need it
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q5_region_year_revenue: 5-way star join + calendar derivation +
    aggregation (the reference's fact-enrichment pipeline generalized,
    reference etl.py:244-247).
    """
    _configure(spark)
    return REGISTRY["q5_region_year_revenue"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return REGISTRY[name].spark(_configure(spark), sf_dir)

        run.__name__ = f"query_{name}"
        run.__doc__ = REGISTRY[name].doc
        return run

    return {name: wrap(name) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-expressible query; omitted
    keys (approximate/nondeterministic ops) get rows-only checks."""
    return {
        name: REGISTRY[name].oracle.strip()
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
