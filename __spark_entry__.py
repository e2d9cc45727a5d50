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
# entries of queries() in dict-insertion order. With 374 registered
# queries, insertion order decides which operators get driver-verified
# rows — so the dict leads with a hand-picked 50 covering one flagship
# per operator family (reference surface, TPC-H/relational, join
# matrix, event analytics, LLM-pipeline); the remaining queries follow
# in sorted order and are covered by tests/test_oracle_parity.py
# against the same DuckDB oracle.
DRIVER_WINDOW = [
    # Round-10 rotation: the entire round-9 window went 50/50
    # rows+schema+hash (CORRECTNESS_r09.json, durable in git), so all
    # 50 rows rotate out. This window DRAINS THE EVIDENCE QUEUE TO
    # ZERO (round-9 verdict directive #1): all 48 names below are the
    # EXACT never-driver-verified set recomputed from the committed
    # CORRECTNESS_r*.json files at rotation time (scripts in git
    # history; matches the precomputed list the round-9 window comment
    # carried), plus 2 re-entry slack slots for queries whose engine
    # changed this round (the round-10 bare-cache→shared() protocol
    # conversion in operators/dedup.py): dedup_cluster_keep_min
    # exercises BOTH converted helpers (_prefix_filtered_shingles +
    # dedup_clusters), dedup_ngram_jaccard the pure PPJoin path.
    # Every other engine/oracle-touched query this round (ADVICE
    # tokenization/guard fixes, winnowing shared()) is already IN the
    # 48 — after this window lands, the PRE-ROUND evidence queue is
    # empty; the never-driver-verified set recomputed from committed
    # files then holds exactly the 4 round-10 births
    # (ann_recall_nprobe_frontier, ann_recall_bands_frontier,
    # ann_pq_distortion_frontier, training_perplexity_by_source),
    # which drain in round 11's window alongside its slack.
    # Queue drains (48, alphabetical):
    "ab_bayes_beta_posterior",
    "ab_power_sample_size",
    "agg_mode_deterministic",
    "dim_calendar_spine",
    "dq_fd_discovery",
    "layout_pruning_zorder_vs_linear",
    "layout_zone_map_pruning",
    "ml_average_precision",
    "ml_best_split_gini",
    "ml_calibration_ece",
    "ml_conformal_interval",
    "ml_embedding_drift",
    "ml_forecast_backtest_mase",
    "ml_gain_lift_deciles",
    "ml_gain_lift_distributed",
    "ml_isotonic_calibration",
    "ml_learning_curve_auc",
    "ml_threshold_metrics",
    "regression_theil_sen",
    "sample_neyman_allocation",
    "sample_stratified_topk",
    "score_user_gini_diversity",
    "segment_abc_distributed",
    "segment_abc_pareto",
    "segment_rfm_distributed",
    "stats_anova_oneway",
    "stats_fdr_bh",
    "stats_jensen_shannon",
    "stats_kaplan_meier",
    "stats_mann_whitney_u",
    "stats_mutual_information",
    "stats_permutation_pvalue",
    "stats_poisson_bootstrap_ci",
    "stats_spearman_corr",
    "stats_table_profile",
    "stats_wilson_ci",
    "text_kneser_ney_bigram",
    "text_winnowing_fingerprints",
    "text_zipf_slope",
    "timeseries_cross_correlation",
    "training_dedup_rate_by_source",
    "training_dsir_weights",
    "training_length_buckets",
    "training_loso_source_value",
    "training_quality_mixture",
    "training_split_counts",
    "training_token_budget",
    "training_tokenizer_fertility",
    # Re-entry slack (engine-touched this round, previously verified):
    "dedup_cluster_keep_min",
    "dedup_ngram_jaccard",
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
