"""Incremental view maintenance == full recompute, across inserts,
updates (group-moving and value-only), and deletes driven by the
versioned change feed with pre-images."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.sources import versioned as V


def _recompute(spark, path, group_cols, sum_cols):
    base = V.versioned_read_merged(spark, path, ["k"])
    return {
        tuple(r[c] for c in group_cols) + (r["n_rows"],) + tuple(round(r[c2], 9) for c2 in sum_cols)
        for r in base.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .collect()
    }


def _snap(df, group_cols, sum_cols):
    return {
        tuple(r[c] for c in group_cols) + (r["n_rows"],) + tuple(round(r[c2], 9) for c2 in sum_cols)
        for r in df.collect()
    }


def test_ivm_tracks_full_recompute(spark, tmp_path):
    path = str(tmp_path / "base")
    # v0: initial rows
    V.versioned_merge(
        spark.createDataFrame(
            [(1, "red", 10.0), (2, "red", 5.0), (3, "blue", 2.0)], ["k", "cat", "v"]
        ),
        path,
        ["k"],
    )
    changes0 = V.versioned_changes(spark, path, ["k"], -1, 0, include_preimages=True)
    agg = ivm.maintain(None, changes0, ["cat"], ["v"])
    assert _snap(agg, ["cat"], ["v"]) == _recompute(spark, path, ["cat"], ["v"])

    # v1: value update, group-moving update, insert
    V.versioned_merge(
        spark.createDataFrame(
            [(1, "red", 11.5), (3, "red", 2.0), (4, "green", 7.0)], ["k", "cat", "v"]
        ),
        path,
        ["k"],
    )
    changes1 = V.versioned_changes(spark, path, ["k"], 0, 1, include_preimages=True)
    agg = ivm.maintain(agg, changes1, ["cat"], ["v"])
    assert _snap(agg, ["cat"], ["v"]) == _recompute(spark, path, ["cat"], ["v"])
    # blue's only row moved out → group gone, not zero-row
    assert not [r for r in agg.collect() if r["cat"] == "blue"]

    # v2: delete the last green row
    V.versioned_delete(spark, spark.createDataFrame([(4,)], ["k"]), path, ["k"])
    changes2 = V.versioned_changes(spark, path, ["k"], 1, 2, include_preimages=True)
    agg = ivm.maintain(agg, changes2, ["cat"], ["v"])
    assert _snap(agg, ["cat"], ["v"]) == _recompute(spark, path, ["cat"], ["v"])
    assert {r["cat"] for r in agg.collect()} == {"red"}


def test_change_feed_preimage_shape(spark, tmp_path):
    path = str(tmp_path / "pre")
    V.versioned_merge(spark.createDataFrame([(1, 10.0)], ["k", "v"]), path, ["k"])
    V.versioned_merge(spark.createDataFrame([(1, 20.0)], ["k", "v"]), path, ["k"])
    V.versioned_delete(spark, spark.createDataFrame([(1,)], ["k"]), path, ["k"])
    upd = {
        (r["_change_type"], r["v"])
        for r in V.versioned_changes(
            spark, path, ["k"], 0, 1, include_preimages=True
        ).collect()
    }
    assert upd == {("update_preimage", 10.0), ("update_postimage", 20.0)}
    dele = {
        (r["_change_type"], r["v"])
        for r in V.versioned_changes(
            spark, path, ["k"], 1, 2, include_preimages=True
        ).collect()
    }
    # delete carries its OLD value for subtraction
    assert dele == {("delete", 20.0)}


def test_ivm_moments_track_avg_stddev(spark, tmp_path):
    """maintain_moments + moment_stats equals full-recompute
    avg/var_samp/stddev_samp across inserts, both update kinds, and
    deletes — including n==1 groups (null variance)."""
    path = str(tmp_path / "mom")
    V.versioned_merge(
        spark.createDataFrame(
            [(1, "red", 10.0), (2, "red", 5.0), (3, "blue", 2.0), (4, "red", 7.5)],
            ["k", "cat", "v"],
        ),
        path,
        ["k"],
    )
    state = ivm.maintain_moments(
        None, V.versioned_changes(spark, path, ["k"], -1, 0, include_preimages=True),
        ["cat"], ["v"],
    )

    def check(state):
        got = {
            (r["cat"], r["n_rows"],
             round(r["avg_v"], 9),
             None if r["var_v"] is None else round(r["var_v"], 6),
             None if r["stddev_v"] is None else round(r["stddev_v"], 6))
            for r in ivm.moment_stats(state, ["cat"], ["v"]).collect()
        }
        want = {
            (r["cat"], r["n_rows"],
             round(r["avg_v"], 9),
             None if r["var_v"] is None else round(r["var_v"], 6),
             None if r["stddev_v"] is None else round(r["stddev_v"], 6))
            for r in V.versioned_read_merged(spark, path, ["k"])
            .groupBy("cat")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.avg("v").alias("avg_v"),
                F.var_samp("v").alias("var_v"),
                F.stddev_samp("v").alias("stddev_v"),
            )
            .collect()
        }
        assert got == want

    check(state)

    # value update, group-moving update, insert
    V.versioned_merge(
        spark.createDataFrame(
            [(1, "red", 11.5), (3, "red", 2.0), (5, "green", 7.0)], ["k", "cat", "v"]
        ),
        path,
        ["k"],
    )
    state = ivm.maintain_moments(
        state, V.versioned_changes(spark, path, ["k"], 0, 1, include_preimages=True),
        ["cat"], ["v"],
    )
    check(state)
    # green has one row → sample variance must be null, not 0
    g = {r["cat"]: r for r in ivm.moment_stats(state, ["cat"], ["v"]).collect()}
    assert g["green"]["var_v"] is None and g["green"]["stddev_v"] is None

    # delete two red rows
    V.versioned_delete(spark, spark.createDataFrame([(2,), (4,)], ["k"]), path, ["k"])
    state = ivm.maintain_moments(
        state, V.versioned_changes(spark, path, ["k"], 1, 2, include_preimages=True),
        ["cat"], ["v"],
    )
    check(state)
