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


def test_incremental_gram_df_matches_recompute(spark, tmp_path):
    """The boilerplate document-frequency table maintained from the
    change feed equals recomputing distinct (gram, doc) counts from the
    post-change corpus — across insert, text update, and delete."""
    from data_lake_with_spark_spark.operators.ingest import maintain_gram_df

    path = str(tmp_path / "corp")
    d1 = "a b c d e f g h i"          # grams: 2 distinct 8-grams
    d2 = "a b c d e f g h i j"        # shares gram 'a..h' with d1
    d3 = "z y x w v u t s r q"
    V.versioned_merge(
        spark.createDataFrame([(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]),
        path, ["doc_id"],
    )
    state = maintain_gram_df(
        None, V.versioned_changes(spark, path, ["doc_id"], -1, 0, include_preimages=True)
    )

    def recompute():
        base = V.versioned_read_merged(spark, path, ["doc_id"])
        toks = base.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
        grams = toks.where(F.size("t") >= 8).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("t") - 8),
                        lambda i: F.concat_ws(" ", F.slice("t", i + 1, 8)),
                    )
                )
            ).alias("gram"),
        )
        return {
            (r["gram"], r["n"]) for r in
            grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def snap(state):
        return {(r["gram"], r["n_rows"]) for r in state.collect()}

    assert snap(state) == recompute()
    # the shared 8-gram has doc-frequency 2 (the boilerplate set)
    assert ("a b c d e f g h", 2) in snap(state)

    # update d2 so it no longer shares, insert d4 duplicating d3
    V.versioned_merge(
        spark.createDataFrame(
            [(2, "p o n m l k j i h"), (4, d3)], ["doc_id", "text"]
        ),
        path, ["doc_id"],
    )
    state = maintain_gram_df(
        state, V.versioned_changes(spark, path, ["doc_id"], 0, 1, include_preimages=True)
    )
    assert snap(state) == recompute()
    assert ("a b c d e f g h", 1) in snap(state)

    V.versioned_delete(spark, spark.createDataFrame([(3,)], ["doc_id"]), path, ["doc_id"])
    state = maintain_gram_df(
        state, V.versioned_changes(spark, path, ["doc_id"], 1, 2, include_preimages=True)
    )
    assert snap(state) == recompute()


def test_maintain_join_agg_matches_full_recompute(spark, tmp_path):
    """Enriched-rollup IVM: per-dim-group sums advanced from the fact
    change feed equal the full join+groupBy recompute across inserts,
    updates, and deletes — including facts with no dim match."""
    from data_lake_with_spark_spark.operators import ivm as IVM
    from data_lake_with_spark_spark.sources import versioned as V

    dim = spark.createDataFrame(
        [(1, "red"), (2, "blue")], "dim_id long, color string"
    )
    path = str(tmp_path / "facts")
    V.versioned_merge(
        spark.createDataFrame(
            [(10, 1, 5.0), (11, 1, 7.0), (12, 2, 1.0), (13, 9, 100.0)],
            ["fid", "dim_id", "x"],
        ),
        path,
        ["fid"],
    )  # v0 (fid 13 has no dim row)
    V.versioned_merge(
        spark.createDataFrame([(11, 2, 9.0), (14, 2, 2.0)], ["fid", "dim_id", "x"]),
        path,
        ["fid"],
    )  # v1: update fid 11 (moves group!), insert fid 14
    V.versioned_delete(spark, spark.createDataFrame([(10,)], ["fid"]), path, ["fid"])  # v2

    def recompute(version):
        base = V.versioned_read_merged(spark, path, ["fid"], version=version)
        return {
            (r["color"], r["n_rows"], r["x"])
            for r in base.join(dim, "dim_id")
            .groupBy("color")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("x").alias("x"),
            )
            .collect()
        }

    state = None
    for v in range(3):
        changes = V.versioned_changes(
            spark, path, ["fid"], v - 1, v, include_preimages=True
        )
        state = IVM.maintain_join_agg(
            state, changes, dim, "dim_id", "dim_id", ["color"], ["x"]
        )
        got = {(r["color"], r["n_rows"], r["x"]) for r in state.collect()}
        assert got == recompute(v), f"divergence at v{v}"


def test_apply_delta_preserves_long_exactness(spark):
    """Round-12 (r11 ADVICE): apply_delta folds each sum column in its
    own dtype. 2^53 + 1 is not representable as a double — the old
    double-promoting fold would round it to 2^53 and the +1 merge
    would then be absorbed entirely; the long fold keeps every
    intermediate exact."""
    from data_lake_with_spark_spark.operators import ivm

    big = (1 << 53) + 1
    schema = "g string, v long, _change_type string"
    b0 = spark.createDataFrame([("g", big, "insert")], schema)
    b1 = spark.createDataFrame([("g", 1, "insert")], schema)
    state = ivm.maintain(None, b0, ["g"], ["v"])
    state = ivm.maintain(state, b1, ["g"], ["v"])
    row = state.collect()[0]
    assert dict(state.dtypes)["v"] == "bigint"
    assert row["v"] == big + 1
    # double arithmetic control: the same fold through float64 loses
    # both the +1 of big itself and the merged +1
    assert float(big) + 1.0 != big + 1


def test_read_histogram_quantile_picks_covering_bucket(spark):
    """read_histogram_quantile: smallest bucket whose cumulative count
    covers q_num/q_den of the group total, pure integer arithmetic."""
    from data_lake_with_spark_spark.operators import ivm

    state = spark.createDataFrame(
        [("g", 0, 3), ("g", 1, 2), ("g", 2, 5), ("h", 7, 1)],
        "g string, bucket long, n_rows long",
    )
    med = {
        r["g"]: (r["n_rows"], r["q_bucket"])
        for r in ivm.read_histogram_quantile(state, ["g"], "bucket", 1, 2).collect()
    }
    # cum for g: 3, 5, 10 over total 10 — 2*5 >= 10 first at bucket 1
    assert med == {"g": (10, 1), "h": (1, 7)}
    p90 = {
        r["g"]: r["q_bucket"]
        for r in ivm.read_histogram_quantile(state, ["g"], "bucket", 9, 10).collect()
    }
    # 10*cum >= 9*10 first at bucket 2 (cum 10)
    assert p90 == {"g": 2, "h": 7}


def test_maintain_topk_rejects_deletes(spark):
    """The batch top-k fold raises on delete rows at execution time —
    the raise lives inside the filter predicate, so Catalyst cannot
    push the preimage-drop filter past it."""
    import pytest

    from data_lake_with_spark_spark.operators import ivm

    schema = "g string, i long, v long, _change_type string"
    ins = spark.createDataFrame([("g", 1, 10, "insert")], schema)
    dele = spark.createDataFrame([("g", 1, 10, "delete")], schema)
    state = ivm.maintain_topk(None, ins, ["g"], "i", "v", k=3)
    assert [(r["i"], r["v"]) for r in state.collect()] == [(1, 10)]
    with pytest.raises(Exception, match="insert-only"):
        ivm.maintain_topk(state, dele, ["g"], "i", "v", k=3).collect()
    # preimage rows are dropped, postimage replaces the retained row
    upd = spark.createDataFrame(
        [("g", 1, 10, "update_preimage"), ("g", 1, 25, "update_postimage")],
        schema,
    )
    state2 = ivm.maintain_topk(state, upd, ["g"], "i", "v", k=3)
    assert [(r["i"], r["v"]) for r in state2.collect()] == [(1, 25)]


def test_topk_retractable_tracks_versioned_change_feed(spark, tmp_path):
    """End-to-end lakehouse wiring for the retractable top-k (round
    13): the state advanced by REAL ``versioned_changes(
    include_preimages=True)`` feeds — upserts that RAISE, upserts that
    LOWER a resident leader, and a tombstone DELETE of a resident
    leader — must equal the top-k recompute over each post-change
    snapshot, with the base rescan reading the same versioned table
    the feed came from (the production shape: one table is both the
    change source and the rescan target)."""
    from pyspark.sql import Window as W

    path = str(tmp_path / "scores")

    def base_df(version):
        return V.versioned_read_merged(spark, path, ["k"], version=version).select(
            "cat", F.col("k").alias("id"), F.col("v").alias("score")
        )

    def recompute(version, kk=2):
        w = W.partitionBy("cat").orderBy(F.desc("score"), F.asc("id"))
        return {
            (r["cat"], r["id"], r["score"])
            for r in base_df(version)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= kk)
            .collect()
        }

    def feed(v_from, v_to):
        return V.versioned_changes(
            spark, path, ["k"], v_from, v_to, include_preimages=True
        ).select(
            "cat", F.col("k").alias("id"), F.col("v").alias("score"), "_change_type"
        )

    state = None
    # v0: inserts — a leaderboard of 4 in one group, 1 in another
    V.versioned_merge(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 40.0), (4, "a", 20.0),
             (9, "b", 7.0)],
            ["k", "cat", "v"],
        ),
        path, ["k"],
    )
    state = ivm.maintain_topk_retractable(
        state, feed(-1, 0), base_df(0), ["cat"], "id", "score", k=2
    )
    assert {(r["cat"], r["id"], r["score"]) for r in state.collect()} == recompute(0)

    # v1: RAISE a non-leader (fast path) and LOWER the leader (rescan)
    V.versioned_merge(
        spark.createDataFrame([(1, "a", 25.0), (3, "a", 5.0)], ["k", "cat", "v"]),
        path, ["k"],
    )
    state = ivm.maintain_topk_retractable(
        state, feed(0, 1), base_df(1), ["cat"], "id", "score", k=2
    )
    assert {(r["cat"], r["id"], r["score"]) for r in state.collect()} == recompute(1)

    # v2: tombstone-DELETE the current leader (rescan pulls up the 3rd)
    V.versioned_delete(spark, spark.createDataFrame([(2,)], ["k"]), path, ["k"])
    state = ivm.maintain_topk_retractable(
        state, feed(1, 2), base_df(2), ["cat"], "id", "score", k=2
    )
    got = {(r["cat"], r["id"], r["score"]) for r in state.collect()}
    assert got == recompute(2)
    assert got == {("a", 1, 25.0), ("a", 4, 20.0), ("b", 9, 7.0)}


def test_topk_retractable_unknown_change_type_rescans(spark):
    """An UNKNOWN change type (e.g. the 3-type feed's plain "update")
    must route its group to the base rescan — never be silently
    dropped as a no-op (the silent-wrongness the plain fold's raise
    prevents; here the base supplies the truth instead)."""
    schema = "g long, i long, v long, _change_type string"
    s0 = ivm.maintain_topk_retractable(
        None,
        spark.createDataFrame(
            [(0, 1, 10, "insert"), (0, 2, 30, "insert")], schema
        ),
        spark.createDataFrame([(0, 1, 10), (0, 2, 30)], "g long, i long, v long"),
        ["g"], "i", "v", k=1,
    )
    # plain "update" LOWERS the resident leader 30 -> 5; without the
    # unknown-type risk routing the fold would keep the stale 30
    s1 = ivm.maintain_topk_retractable(
        s0,
        spark.createDataFrame([(0, 2, 5, "update")], schema),
        spark.createDataFrame([(0, 1, 10), (0, 2, 5)], "g long, i long, v long"),
        ["g"], "i", "v", k=1,
    )
    assert {(r["g"], r["i"], r["v"]) for r in s1.collect()} == {(0, 1, 10)}


def test_topk_retractable_null_change_type_rescans(spark):
    """A NULL _change_type is UNKNOWN too (round-13 ADVICE medium):
    ~isin on NULL yields NULL, which otherwise(0) scores as 0, so
    without the explicit isNull() arm the row would dodge BOTH the
    risk routing and the safe-path isin filter — a silent no-op. The
    NULL row must route its group to the base rescan."""
    schema = "g long, i long, v long, _change_type string"
    s0 = ivm.maintain_topk_retractable(
        None,
        spark.createDataFrame(
            [(0, 1, 10, "insert"), (0, 2, 30, "insert")], schema
        ),
        spark.createDataFrame([(0, 1, 10), (0, 2, 30)], "g long, i long, v long"),
        ["g"], "i", "v", k=1,
    )
    # NULL-typed row LOWERS the resident leader 30 -> 5; the base holds
    # the truth, so the rescan must surface (0, 1, 10)
    s1 = ivm.maintain_topk_retractable(
        s0,
        spark.createDataFrame([(0, 2, 5, None)], schema),
        spark.createDataFrame([(0, 1, 10), (0, 2, 5)], "g long, i long, v long"),
        ["g"], "i", "v", k=1,
    )
    assert {(r["g"], r["i"], r["v"]) for r in s1.collect()} == {(0, 1, 10)}


def test_windowed_distinct_edges(spark):
    """Deterministic edge pins for the epoch-partitioned expiring
    distinct states: (a) a row arriving for an already-retired bucket
    is dropped on arrival; (b) deletes raise (expiry IS the retraction
    story); (c) horizon < 1 is rejected."""
    import pytest

    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    schema = "g long, i long, bucket long, _change_type string"
    try:
        s = ivm.maintain_bitmap_windowed(
            None,
            spark.createDataFrame([(0, 1, 9, "insert"), (0, 2, 9, "insert")], schema),
            ["g"], "i", "bucket", horizon=2,
        )
        # bucket 3 is far beyond horizon at watermark 9 -> dropped on
        # arrival; bucket 8 is live
        s = ivm.maintain_bitmap_windowed(
            None if s is None else s,
            spark.createDataFrame([(0, 3, 3, "insert"), (0, 4, 8, "insert")], schema),
            ["g"], "i", "bucket", horizon=2,
        )
        got = {
            (r["g"], r["n_distinct"])
            for r in ivm.read_bitmap_windowed_distinct(s, ["g"]).collect()
        }
        assert got == {(0, 3)}  # ids 1, 2 (bucket 9) + 4 (bucket 8)
        with pytest.raises(Exception, match="insert-only"):
            ivm.maintain_kmv_windowed(
                None,
                spark.createDataFrame([(0, 1, 0, "delete")], schema),
                ["g"], "i", "bucket", horizon=2,
            ).collect()
        with pytest.raises(ValueError, match="horizon"):
            ivm.maintain_hll_windowed(
                None,
                spark.createDataFrame([(0, 1, 0, "insert")], schema),
                ["g"], "i", "bucket", horizon=0,
            )
    finally:
        release_shared_caches()
