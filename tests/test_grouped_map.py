"""applyInPandas grouped-map vs the JVM window equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators.grouped import zscore_grouped_map, zscore_window
from data_lake_with_spark_spark.streaming import jobs


def test_grouped_map_zscore_matches_window(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("k"), F.col("l_extendedprice").alias("x"))
        .limit(2000)
    )
    pandas_z = {
        (r["k"], r["x"]): r["z"] for r in zscore_grouped_map(li, "k", "x").collect()
    }
    window_z = {
        (r["k"], r["x"]): r["z"] for r in zscore_window(li, "k", "x").collect()
    }
    assert set(pandas_z) == set(window_z)
    for key, z in pandas_z.items():
        assert abs(z - window_z[key]) < 1e-9


def test_streaming_sliding_matches_batch(spark, sf_dir):
    from data_lake_with_spark_spark.plans import REGISTRY

    stream = jobs.events_stream(spark, sf_dir)
    out = jobs.run_to_completion(jobs.sliding_counts(stream), "t_sliding", mode="complete")
    batch = REGISTRY["window_sliding_hourly"].spark(spark, sf_dir)
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.select("window_start", "event_type", "n_events", "total_value").collect()
    )
    assert key(out) == key(batch)


def test_weighted_mean_udaf_matches_native(spark, sf_dir):
    """GROUPED_AGG pandas UDAF vs the native sum(v*w)/sum(w): equal to
    float tolerance on every group (exact equality is impossible —
    summation order differs between numpy and the JVM)."""
    from data_lake_with_spark_spark.operators.grouped import discount_weighted_price

    li = load_table(spark, sf_dir, "lineitem")
    rows = discount_weighted_price(
        li.where(F.col("l_discount") > 0), "l_returnflag", "l_extendedprice", "l_discount"
    ).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["wmean_udaf"] == pytest.approx(r["wmean_native"], rel=1e-9), r


def test_cogroup_asof_equals_jvm_asof(spark, sf_dir):
    """The two-sided Arrow seam must agree EXACTLY with the JVM
    union+last_value as-of join on the full click→purchase alignment
    (including users with no purchases → null right columns)."""
    from data_lake_with_spark_spark.plans import REGISTRY

    a = sorted(
        map(tuple, REGISTRY["join_asof_cogroup"].spark(spark, sf_dir).collect())
    )
    b = sorted(
        map(
            tuple,
            REGISTRY["join_asof_last_purchase"].spark(spark, sf_dir).collect(),
        )
    )
    assert a == b and len(a) > 0
