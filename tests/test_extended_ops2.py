"""Invariant tests for the round-7 continuation batch
(plans/extended_ops2.py) — semantic properties the DuckDB parity hash
can't express: exact recomposition, brute-force agreement, structural
monotonicity. All run the registered Spark queries at the conftest
SF_DIR (sf0.001); DuckDB value-parity at both scales is covered by
test_oracle_parity.py / test_oracle_parity_sf01.py."""

from __future__ import annotations

import duckdb
import pandas as pd

from data_lake_with_spark_spark.plans import REGISTRY


def run(spark, sf_dir, name) -> pd.DataFrame:
    return REGISTRY[name].spark(spark, sf_dir).toPandas()


def test_interval_coalesce_invariants(spark, sf_dir):
    """Every merged span is at least one interval long (1800 s), the
    longest span can't exceed total coverage, and coverage is bounded
    below by n_spans·1800 (spans are disjoint by construction)."""
    df = run(spark, sf_dir, "interval_coalesce_spans")
    assert len(df) > 0
    assert (df.n_spans >= 1).all()
    assert (df.longest_sec >= 1800).all()
    assert (df.coverage_sec >= df.n_spans * 1800).all()
    assert (df.coverage_sec >= df.longest_sec).all()


def test_best_split_matches_bruteforce(spark, sf_dir):
    """The distributed decision stump must pick the same split (and
    goodness) as a single-node brute force over every candidate."""
    got = run(spark, sf_dir, "ml_best_split_gini").iloc[0]
    pdf = duckdb.sql(
        f"""SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
                   CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
            FROM read_parquet('{sf_dir}/embeddings.parquet')"""
    ).df()
    spine = (
        pdf.groupby("score")
        .agg(cnt=("pos", "size"), p=("pos", "sum"))
        .sort_index()
        .reset_index()
    )
    nl = spine.cnt.cumsum()
    pl = spine.p.cumsum()
    n, ptot = int(spine.cnt.sum()), int(spine.p.sum())
    best = (-1, None)
    for i in range(len(spine) - 1):  # nl < n
        l_n, l_p = int(nl[i]), int(pl[i])
        r_n, r_p = n - l_n, ptot - l_p
        good = (l_p * l_p + (l_n - l_p) * (l_n - l_p)) * 1_000_000 // l_n + (
            r_p * r_p + (r_n - r_p) * (r_n - r_p)
        ) * 1_000_000 // r_n
        key = (good, -int(spine.score[i]))
        if key > (best[0], -best[1] if best[1] is not None else 0):
            best = (good, int(spine.score[i]))
    assert int(got.goodness_micro) == best[0]
    assert int(got.split_at) == best[1]


def test_bootstrap_ci_well_formed(spark, sf_dir):
    """The 40-replica CI must be ordered, and the full-data point
    estimate must land inside it (deterministic construction — if
    this ever flips, the hash seed or thresholds changed)."""
    row = run(spark, sf_dir, "stats_poisson_bootstrap_ci").iloc[0]
    assert int(row.n_replicas) == 40
    assert row.ci_lo_micro <= row.ci_hi_micro
    assert row.ci_lo_micro <= row.point_micro <= row.ci_hi_micro


def test_rake_phrases_stopword_free(spark, sf_dir):
    """RAKE candidate phrases are stopword-free by construction, and
    the top-20 listing is score-descending."""
    df = run(spark, sf_dir, "text_rake_keywords")
    assert len(df) == 20
    for phrase in df.phrase:
        assert not ({"a", "the"} & set(phrase.split()))
    assert (df.score_micro.diff().dropna() <= 0).all()
    assert (df.n_words >= 1).all()


def test_stl_recomposes_exactly(spark, sf_dir):
    """Additive decomposition is bit-exact in micro-cents:
    cents·10⁶ = trend + seasonal + residual on every row."""
    df = run(spark, sf_dir, "timeseries_stl_dow")
    assert len(df) > 100
    lhs = df.cents.astype("int64") * 1_000_000
    rhs = (
        df.trend_micro.astype("int64")
        + df.seasonal_micro.astype("int64")
        + df.residual_micro.astype("int64")
    )
    assert (lhs == rhs).all()


def test_psi_contributions_nonnegative(spark, sf_dir):
    """(p−q)·ln(p/q) ≥ 0 term-wise — floor-quantized logs preserve
    order, so no quantization artifact may flip a sign."""
    df = run(spark, sf_dir, "ml_psi_score_drift")
    assert len(df) == 6
    assert (df.contribution >= 0).all()
    assert (df.n_expected > 0).all() and (df.n_actual > 0).all()


def test_heaps_beta_in_range(spark, sf_dir):
    """Vocabulary growth exponent must be a sane Heaps' β: strictly
    between 0 and 1 for any corpus with a repeating vocabulary."""
    row = run(spark, sf_dir, "text_heaps_law").iloc[0]
    assert 0.0 < row.beta < 1.0
    assert row.log_vocab_micro <= row.log_tokens_micro


def test_cohort_month_zero_is_full(spark, sf_dir):
    """Month-0 of every cohort is the cohort itself: active equals
    cohort_size and retention is exactly 10⁶ ppm; later months never
    exceed it."""
    df = run(spark, sf_dir, "cohort_retention_matrix")
    m0 = df[df.months_since == 0]
    assert len(m0) > 0
    assert (m0.active == m0.cohort_size).all()
    assert (m0.retention_ppm == 1_000_000).all()
    assert (df.active <= df.cohort_size).all()


def test_item_item_topk_structure(spark, sf_dir):
    """Per-item ranks are contiguous from 1, co-counts respect the
    noise floor, and cosine stays in (0, 1]."""
    df = run(spark, sf_dir, "recsys_item_item_topk")
    assert len(df) > 0
    assert (df.co >= 2).all()
    assert ((df.cosine > 0) & (df.cosine <= 1.0)).all()
    for _, grp in df.groupby("part_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_knn_grid_ranks_and_distances(spark, sf_dir):
    """kNN output: per-query ranks contiguous, distances
    non-decreasing with rank, never self-matching."""
    df = run(spark, sf_dir, "spatial_knn_grid")
    assert len(df) > 0
    assert (df.query_id != df.neighbor_id).all()
    for _, grp in df.groupby("query_id"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g.dist2.diff().dropna() >= 0).all()


def test_sma_crossover_alternates(spark, sf_dir):
    """Strict sign-flip semantics mean consecutive crossover events
    must alternate golden/death — two goldens in a row would imply a
    missed death cross."""
    df = run(spark, sf_dir, "finance_sma_crossover")
    assert len(df) > 0
    dirs = list(df.sort_values("day").direction)
    for prev, cur in zip(dirs, dirs[1:]):
        assert prev != cur
