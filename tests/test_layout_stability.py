"""Layout independence: queries whose docstrings claim partition-/
order-independent determinism must return IDENTICAL rows when the
input tables are rewritten as multi-file, differently-ordered parquet
— the failure mode VERDICT r04 flagged for PQ codebook training
(single-file testdata can mask run-dependence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import TABLES, table_path
from data_lake_with_spark_spark.plans import REGISTRY

CLAIMANTS = [
    "sample_weighted_priority",   # content-addressed priorities
    "vector_kmeans_lloyd",        # scaled-integer centroid sums
    "vector_topk_matryoshka",     # rounded two-stage ranking
    "dedup_repeated_spans",       # span-index counts
    "quantile_fixed_histogram",   # exact-integer interpolation
    "sketch_hll_portable",        # register MAX algebra
    "training_global_shuffle",    # content-addressed epoch shuffle
    "graph_triangle_count",       # integer census
    "text_cooccurrence_lift",     # integer ratios
    "window_wau_bitmap",          # OR-merge algebra
    "score_activity_decay",       # power-of-two weights
    "segment_rfm_distributed",    # two-level NTILE
    # round-6 continued-session claimants:
    "graph_connected_components", # min-label flooding (total order)
    "graph_kcore_membership",     # peel predicate on integer degrees
    "ml_auc_rank_sum",            # doubled integer average ranks
    "sketch_hll_cube",            # register MAX over relabeled cells
    "stats_skew_kurtosis",        # decimal power sums
    "stats_cramers_v",            # quantized-integer chi-square cells
    "text_bigram_logprob",        # quantized-integer log-probs
    "timeseries_ewma_halflife",   # decimal daily revs + dyadic weights
    "search_mmr_rerank",          # rounded sims, id tie-breaks
    "stats_spearman_corr",        # doubled integer average ranks
    "timeseries_autocorrelation", # exact BIGINT lag sums
    "dq_table_diff_checksums",    # SUM-mergeable md5-int checksums
    "events_transition_entropy",  # quantized-integer log-probs
    "dedup_image_ahash",          # integer aHash, popcount verify
]


@pytest.fixture(scope="module")
def shuffled_sf_dir(spark, sf_dir, tmp_path_factory):
    """A copy of the testdata where every table is 5 files in a
    scrambled row order (repartition by random-ish hash)."""
    out = tmp_path_factory.mktemp("shuffled_sf")
    for t in TABLES:
        df = spark.read.parquet(table_path(sf_dir, t))
        key = df.columns[0]
        (
            df.repartition(5, F.xxhash64(F.col(key).cast("string")))
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


@pytest.mark.parametrize("name", CLAIMANTS)
def test_layout_independent(spark, sf_dir, shuffled_sf_dir, name):
    a = sorted(map(tuple, REGISTRY[name].spark(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, REGISTRY[name].spark(spark, shuffled_sf_dir).collect())
    )
    assert a == b
