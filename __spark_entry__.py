"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_lake_with_spark_spark``; this module is
a thin adapter over the query registry
(``data_lake_with_spark_spark.plans.REGISTRY``).
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

from data_lake_with_spark_spark.plans import REGISTRY  # noqa: E402

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
    # Round-6 rotation: the entire round-5 window went 50/50
    # rows+schema+hash (CORRECTNESS_r05.json, durable in git), so all
    # unchanged r5 rows rotate out and the window carries 46
    # FIRST-TIME queries — never driver-hash-verified in any round's
    # CORRECTNESS file (computed from the union of r01–r05) — plus the
    # four queries whose engine changed this round and therefore need
    # re-verification under the new implementation.
    #
    # ROUND-7 ROTATION QUEUE: the round-6 continued session added 53
    # more oracled queries (layout_*, cdc_scd2_apply,
    # join_pointintime_scd2, feature_*, training_cv_folds, stats_*,
    # ml_*, timeseries_ewma_halflife / _rolling_corr,
    # graph_connected_components / _kcore_membership /
    # _community_modularity, search_mmr_rerank, sketch_hll_cube,
    # skyline_pareto_orders, pipeline_neardup_trainset,
    # dedup_image_ahash, dq_*, text_bigram_logprob / _char_entropy /
    # _ngram_novelty, audience_overlap_exact,
    # join_relational_division, sort_keyset_pagination,
    # multimodal_video_decimate, scan_file_metadata,
    # finance_var_historical) — all green in the local sf0.001 AND
    # sf0.01 gates but never driver-verified; rotate them in next
    # round once this window's rows are durable.
    #
    # changed this round (re-verify under new code; agg_bitmap /
    # window_wau_bitmap / graph_triangle_count also changed but
    # value-neutrally — their r5 rows stand and the local sf0.01 gate
    # re-verified them, so their slots go to first-time queries):
    "dedup_repeated_spans",       # hashed xxhash64 span index default
    # changed AND never driver-verified:
    "score_activity_decay",       # decay floors at 0 past 8 weeks
    "graph_pagerank_neardup",     # scaled-integer + unrolled SQL oracle
    # NEW this round (round-6 additions):
    "graph_label_propagation",    # unrolled deterministic LPA communities
    "stats_exact_percentiles",    # two-phase count-offset selection
    "sketch_theta_overlap",       # KMV theta-sketch set intersection
    "pipeline_trainset_stats",    # end-to-end composed trainset build
    # round-5 VERDICT item 2's named never-verified families:
    "q2_min_cost_part",
    "q20_excess_suppliers",
    "variant_extract_props",
    "text_language_id",
    "pii_redact",
    "graph_local_clustering",
    "finance_max_drawdown",
    "cohort_ltv_yearly",
    "training_mlm_mask",
    "stats_benford_digits",
    "vector_mean_pool",
    "sample_domain_mixture",
    # TPC-H tail, never driver-verified:
    "q4_priority_exists",
    "q7_nation_volume",
    "q8_market_share",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q21_waiting_supplier",
    "q22_idle_rich_customers",
    # relational surface (rollup/setops/subqueries), never verified:
    "rollup_orders",
    "setop_union",
    "setop_except",
    "setop_intersect",
    "subquery_above_avg",
    "subquery_exists",
    # window-function family, never verified:
    "window_rank_family",
    "window_rolling_30day",
    "window_running_total",
    "window_sliding_hourly",
    "window_daily_active_users",
    # scalar/lateral/unpivot surface, never verified:
    "scalar_case_when",
    "scalar_try_functions",
    "unpivot_part_metrics",
    "lateral_posexplode_tokens",
    # text / LLM pipeline, never verified:
    "text_fingerprint",
    "text_token_count_bpe",
    "text_unigram_logprob",
    # multimodal, never verified:
    "multimodal_audio_energy",
    "multimodal_resize_features",
    # vector / graph / training, never verified:
    "vector_quantize_int8",
    "vector_centroid_assign",
    "graph_covisitation_pairs",
    "mine_hard_negatives",
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
