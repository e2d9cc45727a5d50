"""Invariant tests for the round-7 third-session batch
(plans/extended_ops3.py) — semantic properties the DuckDB parity hash
can't express: axiom checks (Shapley efficiency), monotonicity
(isotonic fit, BH prefix), differential agreement (Viterbi DP vs a
Python reference), and conservation laws. All run the registered
Spark queries at the conftest SF_DIR (sf0.001); DuckDB value-parity
at both scales is covered by test_oracle_parity.py /
test_oracle_parity_sf01.py."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans import REGISTRY


def run(spark, sf_dir, name) -> pd.DataFrame:
    return REGISTRY[name].spark(spark, sf_dir).toPandas()


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Σ_c shapley_num(c) must equal 24·(v(full coalition) − v(∅)) —
    the efficiency axiom survives the ppm quantization exactly because
    every v(S) is quantized BEFORE the marginal sums."""
    from data_lake_with_spark_spark.plans.extended_ops3 import _SHAPLEY_BITS_SQL

    df = run(spark, sf_dir, "attribution_shapley")
    assert sorted(df.channel) == ["click", "error", "signup", "view"]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7").alias("widx"),
        F.expr(_SHAPLEY_BITS_SQL).alias("bit"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    v = (
        ev.groupBy("user_id", "widx")
        .agg(F.bit_or("bit").alias("mask"), F.max("conv").alias("converted"))
        .groupBy("mask")
        .agg(F.expr("SUM(converted) * 1000000 div COUNT(*)").alias("v_ppm"))
        .toPandas()
        .set_index("mask")["v_ppm"]
    )
    v_full = int(v.get(15, 0))
    v_empty = int(v.get(0, 0))
    assert int(df.shapley_num.sum()) == 24 * (v_full - v_empty)


def test_wilson_interval_bounds(spark, sf_dir):
    """Wilson bounds stay inside [0, 1], bracket the point estimate,
    and never collapse to zero width."""
    df = run(spark, sf_dir, "stats_wilson_ci")
    assert (df.wilson_lo >= 0).all() and (df.wilson_hi <= 1).all()
    p = df.n_active / df.n_customers
    assert (df.wilson_lo <= p + 1e-9).all()
    assert (df.wilson_hi >= p - 1e-9).all()
    assert (df.wilson_hi > df.wilson_lo).all()


def test_fd_discovery_bounds(spark, sf_dir):
    """Confidence is a valid ppm, the exact FD scores 1e6, and
    lhs_card never exceeds row count."""
    df = run(spark, sf_dir, "dq_fd_discovery")
    assert (df.conf_ppm <= 1_000_000).all() and (df.conf_ppm > 0).all()
    exact = df[df.fd == "n_nationkey->n_regionkey"]
    assert len(exact) == 1 and int(exact.conf_ppm.iloc[0]) == 1_000_000
    assert (df.lhs_card <= df.n_rows).all()


def test_winnowing_pair_bounds(spark, sf_dir):
    """Shared fingerprints can't exceed either doc's fingerprint count
    and containment is a valid ppm ≥ the 3-share floor."""
    df = run(spark, sf_dir, "text_winnowing_fingerprints")
    assert len(df) > 0
    assert (df.shared_fps <= df[["size_a", "size_b"]].min(axis=1)).all()
    assert (df.shared_fps >= 3).all()
    assert (df.containment_ppm <= 1_000_000).all()
    assert (df.doc_a < df.doc_b).all()


def test_markov_topk_structure(spark, sf_dir):
    """Per antecedent: ranks are contiguous from 1, probabilities are
    valid ppm and nonincreasing in rank."""
    df = run(spark, sf_dir, "recsys_markov_next_item")
    assert (df.prob_ppm <= 1_000_000).all()
    for _, g in df.groupby("cur_brand"):
        ranks = sorted(g.rnk)
        assert ranks == list(range(1, len(ranks) + 1))
        by_rank = g.sort_values("rnk")
        assert (by_rank.prob_ppm.diff().dropna() <= 0).all()


def test_dbscan_point_conservation(spark, sf_dir):
    """Clustered points + noise points == every point scanned, and
    cluster cell counts are positive."""
    df = run(spark, sf_dir, "spatial_dbscan_grid")
    n_pts = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 1500)
        .count()
    )
    assert int(df.n_points.sum()) == n_pts
    noise = df[df.cluster == -1]
    assert len(noise) == 1 and int(noise.n_cells.iloc[0]) == 0
    assert (df[df.cluster != -1].n_cells >= 1).all()


def test_isotonic_fit_is_monotone(spark, sf_dir):
    """The fitted calibration curve must be nondecreasing in bin and
    conserve the positive mass direction (fit between min and max raw
    rates)."""
    df = run(spark, sf_dir, "ml_isotonic_calibration").sort_values("bin")
    assert (df.iso_ppm.diff().dropna() >= 0).all()
    assert df.iso_ppm.min() >= df.raw_ppm.min()
    assert df.iso_ppm.max() <= df.raw_ppm.max()


def test_oof_encoding_excludes_own_fold(spark, sf_dir):
    """n_other must equal the brand total minus the fold's own rows —
    i.e. the fold's own data never leaks into its encoding."""
    df = run(spark, sf_dir, "feature_target_encoding_oof")
    tot = df.groupby("p_brand").n_other.sum()
    # Σ_f (n_b − n_bf) = k·n_b − n_b = (k−1)·n_b with k = 5 folds
    per_brand_nb = tot / 4
    assert (per_brand_nb == per_brand_nb.astype(int)).all()
    assert (df.target_enc_oof >= 0).all() and (df.target_enc_oof <= 1).all()


def test_mase_internal_consistency(spark, sf_dir):
    df = run(spark, sf_dir, "ml_forecast_backtest_mase")
    assert len(df) == 5
    expected = (df.mae_model_sum * 1_000_000 // df.mae_naive_sum).astype("int64")
    assert (df.mase_ppm == expected).all()
    assert (df.n_days > 0).all()


def test_bh_rejections_are_rank_prefix(spark, sf_dir):
    """BH rejects exactly ranks 1..k*; p-values are nondecreasing in
    rank."""
    df = run(spark, sf_dir, "stats_fdr_bh").sort_values("rnk")
    assert (df.p_ppm.diff().dropna() >= 0).all()
    rejected = df[df.rejected].rnk.tolist()
    assert rejected == list(range(1, len(rejected) + 1))


def test_quantile_normalize_reference_shared(spark, sf_dir):
    """ref_ud is identical across segments per vigintile, and each
    segment's vigintile means are nondecreasing (rank preservation)."""
    df = run(spark, sf_dir, "feature_quantile_normalize")
    assert (df.groupby("vigintile").ref_ud.nunique() == 1).all()
    for _, g in df.groupby("mktsegment"):
        assert (g.sort_values("vigintile").group_avg_ud.diff().dropna() >= 0).all()


def test_loso_deltas_balance(spark, sf_dir):
    """Leave-out means must bracket the overall mean: dropping the
    worst source raises it, dropping the best lowers it — so deltas
    span zero (or all-zero on a degenerate corpus)."""
    df = run(spark, sf_dir, "training_loso_source_value")
    assert len(df) == 20
    assert int(df.delta_uchar.max()) >= 0 >= int(df.delta_uchar.min())


def test_viterbi_matches_python_dp(spark, sf_dir):
    """Differential: the HOF fold must agree with a reference Python
    Viterbi over the same integer parameters for every user."""
    from data_lake_with_spark_spark.plans.extended_ops3 import (
        _HMM_EM_A,
        _HMM_EM_I,
        _HMM_T,
    )

    got = run(spark, sf_dir, "sequence_hmm_viterbi").set_index("user_id")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("CAST(unix_millis(ts) AS BIGINT)").alias("tms"),
            "event_id",
            F.expr(
                "CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
                "WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 5 END"
            ).alias("code"),
        )
        .toPandas()
        .sort_values(["user_id", "tms", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        codes = g.code.tolist()
        va = _HMM_EM_A[codes[0] - 1]
        vi = _HMM_EM_I[codes[0] - 1]
        for c in codes[1:]:
            na = _HMM_EM_A[c - 1] + max(va + _HMM_T["aa"], vi + _HMM_T["ia"])
            ni = _HMM_EM_I[c - 1] + max(va + _HMM_T["ai"], vi + _HMM_T["ii"])
            va, vi = na, ni
        row = got.loc[uid]
        assert int(row.score_active) == va and int(row.score_idle) == vi
        assert int(row.viterbi_score) == max(va, vi)


def test_conformal_radius_is_calibration_residual(spark, sf_dir):
    """q_cents must be an actual calibration residual and coverage a
    valid ppm in a plausible band for a 90% interval."""
    df = run(spark, sf_dir, "ml_conformal_interval")
    assert len(df) == 5
    assert (df.q_cents > 0).all()
    assert (df.coverage_ppm <= 1_000_000).all()
    assert (df.coverage_ppm >= 700_000).all()  # loose floor, small folds


def test_kanonymity_conservation(spark, sf_dir):
    df = run(spark, sf_dir, "pii_risk_kanonymity")
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert int(df.n_rows.sum()) == n_cust
    assert int(df.rows_share_ppm.sum()) <= 1_000_000
    risk = set(df[df.at_risk_k5].k_bucket) - {"1", "2", "3-4"}
    assert not risk


def test_sprt_decision_consistency(spark, sf_dir):
    df = run(spark, sf_dir, "ab_sprt_monitor")
    assert len(df) == 2
    for _, r in df.iterrows():
        if r.decision == "continue":
            assert r.decision_at == r.n_obs + 1
        else:
            assert r.decision_at <= r.n_obs


def test_feature_hashing_totals(spark, sf_dir):
    df = run(spark, sf_dir, "feature_hashing_audit")
    assert (df.n_features == df.collision_degree * df.n_buckets).all()
    n_feats = int(df.n_features.sum())
    part = load_table(spark, sf_dir, "part")
    distinct_feats = (
        part.select("p_brand").distinct().count()
        + part.select("p_type").distinct().count()
        + part.select("p_size").distinct().count()
    )
    assert n_feats == distinct_feats
