"""Error bounds for approximate sketches (they're rows-only in the
oracle gate, so accuracy is asserted here) and the AQE skew-join
runtime split."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.streaming import jobs


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("est"),
    ).first()
    # HLL++ rsd=0.01 → 5 sigma ≈ 5%
    assert abs(row["est"] - row["exact"]) / row["exact"] <= 0.05


def test_approx_percentile_within_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("est"),
        F.percentile("l_extendedprice", F.lit(0.45)).alias("p45"),
        F.percentile("l_extendedprice", F.lit(0.55)).alias("p55"),
    ).first()
    # accuracy=1000 → rank error ≤ 1/1000; ±5 percentile is generous
    assert row["p45"] <= row["est"] <= row["p55"]


def test_aqe_splits_skewed_join(spark):
    """A 200k-row hot key versus a uniform side: with the skew
    thresholds lowered to test scale, AQE must mark the sort-merge
    join as skew=true and split the hot partition."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        # half of all rows share one key → hot partition ≫ 2× median
        skewed = spark.range(200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(50_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        j = skewed.join(right, "k")
        # collect() executes THIS plan (count() would build a separate
        # aggregation query and leave j's adaptive plan unfinalized)
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_salted_join_equals_plain_join(spark):
    """salted_join must be result-identical to the plain join on
    skewed data, and must actually spread the hot key's rows: every
    salt bucket of the hot key must be populated."""
    from data_lake_with_spark_spark.operators.skew import SALT, salted_join

    probe = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(5_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    plain = probe.join(build, ["k"])
    salted = salted_join(probe, build, ["k"], salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert (
        salted.unionAll(plain).groupBy(*plain.columns).count()
        .where(F.col("count") != 2).count() == 0
    )
    # the hot key's probe rows hash into all 8 salt buckets
    p = probe.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8))
    )
    assert p.where(F.col("k") == 7).select(SALT).distinct().count() == 8
    # left join keeps unmatched probe rows exactly once
    probe_missing = probe.unionAll(spark.createDataFrame([(99_999, 0)], "k long, payload long"))
    left = salted_join(probe_missing, build, ["k"], salt=4, how="left")
    assert left.where(F.col("k") == 99_999).count() == 1
    assert left.where(F.col("k") == 99_999).collect()[0]["v"] is None


def test_two_phase_count_distinct_matches_native(spark, sf_dir):
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.skew import two_phase_count_distinct

    ev = load_table(spark, sf_dir, "events")
    native = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    two_phase = {
        (r["event_type"], r["n_distinct"])
        for r in two_phase_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert two_phase == native


def test_stream_stream_join_matches_batch(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    out = jobs.run_to_completion(
        jobs.click_purchase_stream_join(stream), "t_ss_join"
    )
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 minutes")),
    ).select("click_id", "purchase_id")
    got = {(r["click_id"], r["purchase_id"]) for r in out.collect()}
    want = {(r["click_id"], r["purchase_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_hll_union_estimate_near_exact(spark, sf_dir):
    """The merged per-day HLL estimate must be close to the true
    month-wide distinct-user count (HLL lgK=12 ⇒ rsd ~1.6%; allow 5%),
    and merging must commute (union of shuffled sketches = same est)."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))).first()[0]
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)
    est2 = (
        daily.orderBy(F.desc("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .first()[0]
    )
    assert est2 == est


def test_stream_stream_outer_join_matches_batch(spark, sf_dir):
    """Left-outer stream-stream join: matches equal the batch inner
    join everywhere; null rows (clicks the watermark proved
    unconverted) are exactly the batch left-join's null clicks, up to
    the tail the final watermark couldn't yet evict."""
    stream = jobs.events_stream(spark, sf_dir)
    out = jobs.run_to_completion(
        jobs.click_purchase_stream_join_outer(stream), "t_ss_outer"
    ).cache()
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 minutes")),
        "left_outer",
    ).cache()

    # matched pairs: identical to batch
    got_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in out.where(F.col("purchase_id").isNotNull()).collect()
    }
    want_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in batch.where(F.col("purchase_id").isNotNull()).collect()
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0

    # null rows: a subset of the batch's unmatched clicks (state only
    # evicts once provably unmatchable)…
    got_nulls = {
        r["click_id"] for r in out.where(F.col("purchase_id").isNull()).collect()
    }
    want_nulls = {
        r["click_id"] for r in batch.where(F.col("purchase_id").isNull()).collect()
    }
    assert got_nulls <= want_nulls
    # …and a superset of the unmatched clicks old enough that the final
    # watermark must have evicted them. Each watermark node tracks the
    # max event time of its OWN filtered input and the global watermark
    # is their min, so the eviction floor is
    # min(max click_ts, max purchase_ts) - 1h, minus the 10-min match
    # window a click stays live for.
    sides = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("mx"))
        .collect()
    )
    wm_floor = min(r["mx"] for r in sides)
    evictable = {
        r["click_id"]
        for r in batch.where(
            F.col("purchase_id").isNull()
            & (
                F.col("click_ts") + F.expr("INTERVAL 10 minutes")
                < F.lit(wm_floor) - F.expr("INTERVAL 1 hour")
            )
        ).collect()
    }
    assert evictable <= got_nulls and len(got_nulls) > 0
    out.unpersist()
    batch.unpersist()


def test_hll_portable_estimate_within_bound(spark, sf_dir):
    """The portable HLL's raw estimate (m=16, no small-range
    correction) must land within the coarse 3σ band of exact distinct
    on every day AND on the union row — utility check; exactness is
    already pinned by the oracle."""
    from data_lake_with_spark_spark.plans import REGISTRY

    rows = REGISTRY["sketch_hll_portable"].spark(spark, sf_dir).collect()
    assert len(rows) > 2
    for r in rows:
        lo, hi = 0.3 * r["exact_users"], 3.0 * r["exact_users"]
        assert lo <= r["users_est"] <= hi, (
            r["day_key"], r["users_est"], r["exact_users"])


def test_skew_stress_bench_pair_equal(spark, sf_dir):
    """The bench's tier2 skew-stress pair (bench._skew_stress): the
    salted and unsalted plans over the deliberately hot-keyed join
    must produce identical aggregates — the bench rows measure COST,
    this pins that they compute the same thing."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    import math

    plain = {
        r["k"]: r["wsum"]
        for r in bench._skew_stress(spark, sf_dir, salted=False).collect()
    }
    salted = {
        r["k"]: r["wsum"]
        for r in bench._skew_stress(spark, sf_dir, salted=True).collect()
    }
    assert plain.keys() == salted.keys() and len(plain) > 0
    # rel_tol, not exact: the two plans sum doubles in different
    # partial-agg orders, so the last ulp of each group's sum may differ
    for k, v in plain.items():
        assert math.isclose(v, salted[k], rel_tol=1e-9, abs_tol=1e-6), (
            k, v, salted[k],
        )
