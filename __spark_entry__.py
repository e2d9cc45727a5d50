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
    # Round-8 rotation: the entire round-7 window went 50/50
    # rows+schema+hash (CORRECTNESS_r07.json, durable in git), so all
    # 50 rows rotate out and this window takes 50 of the 126 oracled
    # queries never driver-verified in any round (union of r01-r07),
    # leading with the families a user hits most (round-7 verdict
    # directive #1): A/B + funnel analytics, the q2/q20 TPC-H tail,
    # join hints/range/as-of, subqueries, text, timeseries, spatial,
    # multimodal, scalar functions, windows.
    #
    # DRAIN PLAN (round-7 verdict directive #2): the queue stood at
    # 126 entering round 8. This round drains 50 and caps new
    # registrations well below the drain rate (<= 20/round), so the
    # queue shrinks monotonically: ~76+new after r8, under ~50 after
    # r9, empty by ~r10. Until it empties, every queued query is ALSO
    # re-verified at driver scale each round by the widened sf0.01
    # local gate (tests/test_oracle_parity_sf01.py computes the
    # never-driver-verified set from the CORRECTNESS_r*.json files and
    # includes all of it), so the only remaining gap is which harness
    # ran it, never which scale.
    #
    # ROUND-9 ROTATION QUEUE (never driver-verified after this round;
    # rotate in once this window's rows are durable):
    # ab/attribution: attribution_position_based, attribution_shapley;
    # anomaly/agg: anomaly_mad_daily, anomaly_rate_bursts,
    #   agg_mode_deterministic, agg_regression_trend,
    #   activity_dow_hour_matrix, dim_calendar_spine;
    # events/sequence: events_pattern_regex, events_transition_entropy,
    #   sequence_bigram_support, sequence_hmm_viterbi,
    #   sessionize_timeout_sensitivity, recsys_markov_next_item,
    #   recsys_item_item_topk;
    # features/training: features_lag_purchases, feature_hashing_audit,
    #   feature_quantile_normalize, feature_target_encoding_oof,
    #   training_dedup_rate_by_source, training_length_buckets,
    #   training_loso_source_value, training_quality_mixture,
    #   training_split_counts, training_tokenizer_fertility,
    #   sample_stratified_topk, score_user_gini_diversity;
    # finance/inventory/orders: finance_bollinger_breakouts,
    #   finance_lorenz_revenue, finance_ohlc_hourly,
    #   finance_sma_crossover, inventory_capped_balance,
    #   orders_interarrival_gaps, orders_ship_delay_stats,
    #   growth-adjacent segment_abc_distributed, segment_abc_pareto,
    #   segment_rfm_distributed;
    # graph/vector: graph_harmonic_centrality, graph_sssp_weighted,
    #   vector_topk_asymmetric, vector_topk_hamming,
    #   vector_topk_ivfpq_portable;
    # interval/cohort: interval_coalesce_spans, cohort_retention_matrix;
    # layout/dq: layout_encoding_advisor, layout_partition_advisor,
    #   layout_pruning_zorder_vs_linear, layout_zone_map_pruning,
    #   dq_bloom_fpp, dq_fd_discovery, dq_referential_integrity,
    #   pii_risk_kanonymity;
    # ml/stats: ml_average_precision, ml_best_split_gini,
    #   ml_calibration_ece, ml_conformal_interval, ml_embedding_drift,
    #   ml_forecast_backtest_mase, ml_gain_lift_deciles,
    #   ml_gain_lift_distributed, ml_isotonic_calibration,
    #   ml_learning_curve_auc, ml_threshold_metrics,
    #   regression_theil_sen, stats_anova_oneway, stats_fdr_bh,
    #   stats_jensen_shannon, stats_kaplan_meier, stats_mann_whitney_u,
    #   stats_mutual_information, stats_poisson_bootstrap_ci,
    #   stats_spearman_corr, stats_table_profile, stats_wilson_ci;
    # text/timeseries tail: text_winnowing_fingerprints,
    #   timeseries_cross_correlation;
    # plus anything newly registered in round 8 (sf0.01-gated at birth
    # via CHANGED_THIS_ROUND).
    #
    # ROUND-9 ENGINE RE-ENTRY QUEUE (window discipline): the round-8
    # scan audit (scripts/plan_scan_audit.py) found reused-subtree
    # re-derivation in four verified graph queries — the near-dup
    # generator re-runs per plan reference (graph_local_clustering 94
    # effective scans, graph_harmonic_centrality 48,
    # graph_assortativity 24, graph_link_prediction 18). The fix is a
    # lazy .cache() of the pairs frame (results identical — proven on
    # ktruss/textrank this round), but it IS an engine change, so
    # apply it in round 9 and put all four back in the window.
    #
    # changed this round (window discipline: engine or oracle edits
    # re-enter the window even when previously verified):
    "ml_psi_score_drift",          # zero-count epsilon smoothing (ADVICE)
    # CDC / lakehouse, first-time:
    "cdc_changelog_compact",
    "dedup_image_phash",
    # A/B testing + funnels, first-time:
    "ab_test_conversion",
    "ab_cuped_adjustment",
    "ab_sprt_monitor",
    "funnel_conversion_latency",
    "funnel_unordered_set",
    # TPC-H tail + relational, first-time:
    "q2_min_cost_supplier",
    "q20_heavy_promo_suppliers",
    "supplier_nation_share",
    "growth_top_parts_yoy",
    # join strategies / temporal joins, first-time:
    "join_hint_merge",
    "join_hint_shuffle_hash",
    "join_range_outer_5min",
    "join_asof_nearest",
    "join_interval_overlap",
    # subqueries, first-time:
    "subquery_in_nations",
    "subquery_not_in_nations",
    # text analysis, first-time:
    "text_decontaminate",
    "text_lang_profile",
    "text_ngram_novelty",
    "text_top_tokens",
    "text_vocab_coverage",
    "text_vocab_oov",
    "text_rake_keywords",
    "text_heaps_law",
    # time series, first-time:
    "timeseries_autocorrelation",
    "timeseries_interpolate_linear",
    "timeseries_seasonality_dow",
    "timeseries_twap_daily",
    "timeseries_holt_forecast",
    "timeseries_stl_dow",
    # spatial, first-time:
    "spatial_dbscan_grid",
    "spatial_grid_near_pairs",
    "spatial_knn_grid",
    "spatial_pyramid_rollup",
    # multimodal, first-time:
    "multimodal_audio_clip",
    "multimodal_audio_vad",
    "multimodal_bytestats_arrow",
    "multimodal_frame_sample",
    # scalar function surface, first-time:
    "scalar_date_arithmetic",
    "scalar_null_handling",
    "scalar_regexp_extract",
    "scalar_string_funcs",
    # window function surface, first-time:
    "window_cume_nth",
    "window_lag_gaps",
    "window_ntile_first_last",
    "window_users_to_date",
    # vectors, first-time:
    "vector_near_pairs",
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
