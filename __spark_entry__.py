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

from data_lake_with_spark_spark.operators.plan_cache import (  # noqa: E402
    release_shared_caches,
)
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
    # Round-9 rotation: the entire round-8 window went 50/50
    # rows+schema+hash (CORRECTNESS_r08.json, durable in git), so all
    # 50 rows rotate out. This window = 10 engine-changed re-entries
    # (window discipline: engine or oracle edits re-enter even when
    # previously verified — 8 from the first scan-audit/ADVICE pass,
    # 2 from the second scan-audit pass) + 40 drains from the
    # never-driver-verified queue, which stood at 87 entering round 9.
    #
    # DRAIN PLAN: 45 of the 50 rows below are first-time
    # verifications (the 40 drains + harmonic/kappa/brown_forsythe/
    # textrank/ktruss, which were both engine-changed AND queued), so
    # the queue ends round 9 at 48 (the 42 pre-round leftovers incl.
    # the two swapped drains + the 6 births — the exact computed list
    # below). Round 10's window drains it to zero with 2 slots of
    # re-entry slack. Until then every queued query is ALSO
    # re-verified at driver scale each round by the widened sf0.01
    # local gate (tests/test_oracle_parity_sf01.py includes the
    # entire never-driver-verified set).
    #
    # ROUND-10 ROTATION QUEUE — the EXACT never-driver-verified set
    # after this round's window lands, COMPUTED from the committed
    # CORRECTNESS_r*.json files (not hand-transcribed — the round-8
    # 351-vs-352 lesson). 48 names; one 50-slot window drains it to
    # zero with 2 slots of re-entry slack:
    # ab_bayes_beta_posterior, ab_power_sample_size,
    # agg_mode_deterministic, dim_calendar_spine, dq_fd_discovery,
    # layout_pruning_zorder_vs_linear, layout_zone_map_pruning,
    # ml_average_precision, ml_best_split_gini, ml_calibration_ece,
    # ml_conformal_interval, ml_embedding_drift,
    # ml_forecast_backtest_mase, ml_gain_lift_deciles,
    # ml_gain_lift_distributed, ml_isotonic_calibration,
    # ml_learning_curve_auc, ml_threshold_metrics,
    # regression_theil_sen, sample_neyman_allocation,
    # sample_stratified_topk, score_user_gini_diversity,
    # segment_abc_distributed, segment_abc_pareto,
    # segment_rfm_distributed, stats_anova_oneway, stats_fdr_bh,
    # stats_jensen_shannon, stats_kaplan_meier, stats_mann_whitney_u,
    # stats_mutual_information, stats_permutation_pvalue,
    # stats_poisson_bootstrap_ci, stats_spearman_corr,
    # stats_table_profile, stats_wilson_ci, text_kneser_ney_bigram,
    # text_winnowing_fingerprints, text_zipf_slope,
    # timeseries_cross_correlation, training_dedup_rate_by_source,
    # training_dsir_weights, training_length_buckets,
    # training_loso_source_value, training_quality_mixture,
    # training_split_counts, training_token_budget,
    # training_tokenizer_fertility.
    # (That set = the 42 pre-round-9 leftovers incl. the two swapped
    # drains, plus the 6 round-9 births; stats_fdr_bh /
    # stats_jensen_shannon / training_dedup_rate_by_source stay
    # queued — their round-9 engine fixes were sf0.01-gated via
    # CHANGED_THIS_ROUND and they earn driver rows on drain.)
    #
    # Engine-changed this round (scan-amplification fixes: the shared
    # lazy cache collapses the candidate-generator subtree to one
    # materialization; kappa/brown_forsythe numeric-robustness fixes
    # changed engine AND oracle):
    "graph_local_clustering",      # was 94 effective FileScans
    "graph_harmonic_centrality",   # was 48 (also first-time)
    "graph_assortativity",         # was 24
    "graph_link_prediction",       # was 18
    "graph_ktruss_edges",          # caches now tracked (first-time)
    "text_textrank_keywords",      # caches now tracked (first-time)
    "ml_cohens_kappa",             # sign-extracted DIV (first-time)
    "stats_brown_forsythe",        # decimal(38,0) z^2 (first-time)
    # Second scan-audit pass (round 9, post-fix audit of the 10-14
    # scan band): the KMV sketch and the ANN-eval rankings re-derived
    # their generator subtrees per consumer — fixed with the same
    # shared lazy cache (14 -> 0 and 13 -> 1 effective scans). Both
    # were already driver-verified, so they re-enter the window:
    "sketch_theta_overlap",
    "ml_recall_mrr_at_k",
    # Queue drains, first-time: attribution + anomaly + aggregates:
    "attribution_position_based",
    "attribution_shapley",
    "anomaly_mad_daily",
    "anomaly_rate_bursts",
    "agg_regression_trend",
    "activity_dow_hour_matrix",
    # events / sequences / recsys:
    "events_pattern_regex",
    "events_transition_entropy",
    "sequence_bigram_support",
    "sequence_hmm_viterbi",
    "sessionize_timeout_sensitivity",
    "recsys_markov_next_item",
    "recsys_item_item_topk",
    # features:
    "features_lag_purchases",
    "feature_hashing_audit",
    "feature_quantile_normalize",
    "feature_target_encoding_oof",
    # finance / inventory / orders:
    "finance_bollinger_breakouts",
    "finance_lorenz_revenue",
    "finance_ohlc_hourly",
    "finance_sma_crossover",
    "inventory_capped_balance",
    "inventory_fifo_allocation",
    "orders_interarrival_gaps",
    "orders_ship_delay_stats",
    # funnels:
    "funnel_steps_strict",
    # graph / vector tail:
    "graph_sssp_weighted",
    "vector_topk_asymmetric",
    "vector_topk_hamming",
    "vector_topk_ivfpq_portable",
    "vector_maxsim_late_interaction",
    # intervals / cohorts:
    "interval_coalesce_spans",
    "cohort_retention_matrix",
    # layout / data quality / privacy:
    "layout_encoding_advisor",
    "layout_partition_advisor",
    "dq_bloom_fpp",
    "dq_referential_integrity",
    "pii_risk_kanonymity",
    # ml / timeseries tail:
    "ml_brier_decomposition",
    "timeseries_rolling_median",
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
            # The driver collects query N's result before constructing
            # query N+1, so releasing here is safe and bounds executor
            # storage to one query's shared() caches across the whole
            # 371-query driver session (bench/sweep/pytest already
            # release between timings).
            release_shared_caches()
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
