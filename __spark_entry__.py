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
# entries of queries() in dict-insertion order. With 399 registered
# queries (385 oracled), insertion order decides which operators get
# driver-verified rows — so the dict leads with a hand-picked 50; the
# remaining queries follow in sorted order and are covered by
# tests/test_oracle_parity.py against the same DuckDB oracle.
DRIVER_WINDOW = [
    # Round-14 rotation: the round-13 window went 50/50
    # rows+schema+hash (CORRECTNESS_r13.json, durable in git) and the
    # evidence queue is EMPTY for the third consecutive round
    # (round-13 verdict: 379/379 oracled queries hold a green driver
    # row), so this window is pure rotation per round-13 directive #1:
    # round-14 BIRTHS first (so they never enter the queue), then
    # every query whose ENGINE OR ORACLE changed this round (re-gated
    # on verified rows), then the stalest previously-green tranche —
    # the r06-verified set in evidence_queue.py rank order (its
    # 11-name tail — stats_exact_percentiles, unpivot_part_metrics,
    # variant_extract_props, vector_centroid_assign..
    # window_sliding_hourly — plus the r07 head, queues for round 15).
    # Round-14 births (epoch-partitioned expiring distinct states,
    # the signed-multiplicity exact retractable distinct, and the
    # incrementally maintained connected components — alone and
    # composed with the maintained MinHash index):
    "ivm_bitmap_windowed_equivalence",
    "ivm_kmv_windowed_portable",
    "ivm_distinct_retractable_equivalence",
    "graph_cc_incremental_equivalence",
    "graph_cc_retraction_equivalence",
    "ingest_dedup_clusters_maintained",
    # Engine changed this round (see test_oracle_parity_sf01
    # CHANGED_THIS_ROUND for the per-change rationale): the
    # Observation-fused stop probes + checkpoint stats reset across
    # the iterative graph kernels, the retractable top-k NULL
    # change-type fix + epoch-0 base feed fix, and the band-join
    # collision guard:
    "graph_bfs_reachability",
    "graph_community_modularity",
    "graph_connected_components",
    "graph_kcore_membership",
    "graph_ktruss_edges",
    "graph_label_propagation",
    "graph_sssp_weighted",
    "spatial_dbscan_grid",
    "ivm_topk_retraction_equivalence",
    "join_click_purchase_outer",
    "join_range_outer_5min",
    # Stale re-verification (33: the r06-verified set, rank order):
    "finance_max_drawdown",
    "graph_covisitation_pairs",
    "lateral_posexplode_tokens",
    "mine_hard_negatives",
    "multimodal_audio_energy",
    "multimodal_resize_features",
    "pii_redact",
    "pipeline_trainset_stats",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    "q22_idle_rich_customers",
    "q2_min_cost_part",
    "q4_priority_exists",
    "q7_nation_volume",
    "q8_market_share",
    "rollup_orders",
    "sample_domain_mixture",
    "scalar_case_when",
    "scalar_try_functions",
    "score_activity_decay",
    "setop_except",
    "setop_intersect",
    "setop_union",
    "stats_benford_digits",
    "subquery_above_avg",
    "subquery_exists",
    "text_fingerprint",
    "text_language_id",
    "text_token_count_bpe",
    "text_unigram_logprob",
    "training_mlm_mask",
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
            # 399-query driver session (bench/sweep/pytest already
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
