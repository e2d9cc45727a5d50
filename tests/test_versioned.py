"""Versioned-table (time travel) semantics."""

from __future__ import annotations

import pytest

from data_lake_with_spark_spark.sources.versioned import (
    current_version,
    versioned_append,
    versioned_read,
    versioned_upsert,
)


def test_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    v1 = versioned_append(spark.createDataFrame([(2, "b")], "k long, v string"), path)
    assert (v0, v1) == (0, 1)
    assert current_version(path) == 1
    assert {r["k"] for r in versioned_read(spark, path).collect()} == {1, 2}
    assert {r["k"] for r in versioned_read(spark, path, version=0).collect()} == {1}


def test_upsert_versions_are_snapshots(spark, tmp_path):
    path = str(tmp_path / "t")
    batch1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    batch2 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    v0, n0 = versioned_upsert(spark, batch1, path, keys=["k"])
    v1, n1 = versioned_upsert(spark, batch2, path, keys=["k"])
    assert (v0, n0) == (0, 2)
    assert (v1, n1) == (1, 1)  # only k=3 is new; k=2 is insert-if-absent
    now = versioned_read(spark, path)
    assert now.count() == 3
    then = versioned_read(spark, path, version=0)
    assert {r["k"] for r in then.collect()} == {1, 2}


def test_read_errors(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        versioned_read(spark, path)
    versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    with pytest.raises(ValueError):
        versioned_read(spark, path, version=5)


def test_noop_upsert_still_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    versioned_upsert(spark, df, path, keys=["k"])
    v, n = versioned_upsert(spark, df, path, keys=["k"])
    assert (v, n) == (1, 0)
    assert versioned_read(spark, path).count() == 1


def test_compaction_preserves_current_and_history(spark, tmp_path):
    from data_lake_with_spark_spark.sources.versioned import compact

    path = str(tmp_path / "t")
    versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    versioned_append(spark.createDataFrame([(2, "b")], "k long, v string"), path)
    cv = compact(spark, path)
    assert cv == 2
    # current view unchanged, served from the single compacted dir
    assert {r["k"] for r in versioned_read(spark, path).collect()} == {1, 2}
    # time travel to pre-compaction versions still works
    assert {r["k"] for r in versioned_read(spark, path, version=0).collect()} == {1}
    # appends after compaction layer on top of the base
    versioned_append(spark.createDataFrame([(3, "c")], "k long, v string"), path)
    assert versioned_read(spark, path).count() == 3


def test_versioned_merge_last_writer_wins(spark, tmp_path):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "merged")
    V.versioned_merge(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "tag", "val"]), path, ["k"])
    V.versioned_merge(spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0)], ["k", "tag", "val"]), path, ["k"])
    got = {r["k"]: (r["tag"], r["val"]) for r in V.versioned_read_merged(spark, path, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0)}
    # time travel to v0: pre-update state
    v0 = {r["k"]: r["tag"] for r in V.versioned_read_merged(spark, path, ["k"], version=0).collect()}
    assert v0 == {1: "a", 2: "b"}


def test_versioned_merge_conflicting_batch(spark, tmp_path):
    import pytest as _pytest

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "conflict")
    conflicted = spark.createDataFrame(
        [(1, "old", 1.0), (1, "new", 2.0)], ["k", "tag", "ts"]
    )
    # no tie-break column → refuse rather than commit an arbitrary winner
    with _pytest.raises(ValueError, match="conflicting"):
        V.versioned_merge(conflicted, path, ["k"])
    # deterministic tie-break: highest order_by value wins
    v, n = V.versioned_merge(conflicted, path, ["k"], order_by="ts")
    assert (v, n) == (0, 1)
    got = V.versioned_read_merged(spark, path, ["k"]).collect()
    assert [(r["k"], r["tag"]) for r in got] == [(1, "new")]
    # exact full-row duplicates collapse silently (not a conflict)
    v2, n2 = V.versioned_merge(
        spark.createDataFrame([(2, "x", 1.0), (2, "x", 1.0)], ["k", "tag", "ts"]),
        path,
        ["k"],
    )
    assert n2 == 1


def test_versioned_delete_tombstones(spark, tmp_path):
    """MoR delete: merged view drops the key, time travel resurrects
    it, compact+vacuum physically erases it, and a later merge can
    re-insert the same key."""
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "del")
    V.versioned_merge(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"]), path, ["k"]
    )
    ver, n = V.versioned_delete(
        spark, spark.createDataFrame([(2,), (2,), (9,)], ["k"]), path, ["k"]
    )
    assert (ver, n) == (1, 2)  # dup key collapsed; absent key 9 tombstones harmlessly
    merged = {r["k"]: r["v"] for r in V.versioned_read_merged(spark, path, ["k"]).collect()}
    assert merged == {1: "a", 3: "c"}
    assert "_tombstone" not in V.versioned_read_merged(spark, path, ["k"]).columns
    # time travel: pre-delete snapshot still has k=2
    v0 = {r["k"] for r in V.versioned_read_merged(spark, path, ["k"], version=0).collect()}
    assert v0 == {1, 2, 3}
    # re-insert after delete wins (higher version than the tombstone)
    V.versioned_merge(spark.createDataFrame([(2, "b2")], ["k", "v"]), path, ["k"])
    merged2 = {r["k"]: r["v"] for r in V.versioned_read_merged(spark, path, ["k"]).collect()}
    assert merged2 == {1: "a", 2: "b2", 3: "c"}
    # physical erasure: delete again, compact with keys, vacuum history
    V.versioned_delete(spark, spark.createDataFrame([(2,)], ["k"]), path, ["k"])
    V.compact(spark, path, keys=["k"])
    V.vacuum(path)
    assert {r["k"] for r in V.versioned_read(spark, path).collect()} == {1, 3}
    assert {r["k"] for r in V.versioned_read_merged(spark, path, ["k"]).collect()} == {1, 3}


def test_versioned_changes_feed(spark, tmp_path):
    """Change feed: inserts/updates/deletes between snapshots with
    state-diff semantics (identical rewrites suppressed), across both
    the delta fast path and the post-compaction full-diff fallback."""
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "cdf")
    V.versioned_merge(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), path, ["k"]
    )  # v0
    V.versioned_merge(
        spark.createDataFrame([(2, "b2"), (3, "c"), (1, "a")], ["k", "v"]), path, ["k"]
    )  # v1: update k2, insert k3, identical rewrite k1
    V.versioned_delete(spark, spark.createDataFrame([(1,)], ["k"]), path, ["k"])  # v2

    def feed(v_from, v_to=None):
        return {
            (r["k"], r["_change_type"])
            for r in V.versioned_changes(spark, path, ["k"], v_from, v_to).collect()
        }

    assert feed(-1, 0) == {(1, "insert"), (2, "insert")}
    # k1's identical rewrite in v1 is not a change
    assert feed(0, 1) == {(2, "update"), (3, "insert")}
    assert feed(1, 2) == {(1, "delete")}
    assert feed(0, 2) == {(2, "update"), (3, "insert"), (1, "delete")}
    assert feed(2, 2) == set()
    # delete rows carry null attributes
    del_row = [
        r for r in V.versioned_changes(spark, path, ["k"], 1, 2).collect()
    ][0]
    assert del_row["v"] is None
    # compaction inside the range → full-diff fallback, same answers
    V.compact(spark, path, keys=["k"])  # v3 snapshot (base)
    V.versioned_merge(spark.createDataFrame([(4, "d")], ["k", "v"]), path, ["k"])  # v4
    assert feed(0, 4) == {(2, "update"), (3, "insert"), (1, "delete"), (4, "insert")}
    with pytest.raises(ValueError):
        V.versioned_changes(spark, path, ["k"], 3, 99)


def test_compact_merged_table_resolves_keys(spark, tmp_path):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "merged_compact")
    V.versioned_merge(spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"]), path, ["k"])
    V.versioned_merge(spark.createDataFrame([(2, 9.0)], ["k", "v"]), path, ["k"])
    V.compact(spark, path, keys=["k"])
    # post-compaction: merged view unchanged, and even a PLAIN read of
    # the compacted snapshot holds no resurrected rows
    assert {(r["k"], r["v"]) for r in V.versioned_read_merged(spark, path, ["k"]).collect()} == {(1, 1.0), (2, 9.0)}
    assert {(r["k"], r["v"]) for r in V.versioned_read(spark, path).collect()} == {(1, 1.0), (2, 9.0)}


def test_stats_manifest_prunes_range_reads(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "skiptbl")
    # range-clustered layout: repartitionByRange gives each file a
    # tight, nearly disjoint k-range (what zorder/sort would produce)
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    V.versioned_append(
        df.repartitionByRange(8, "k"), path, collect_stats=True
    )
    pruned, info = V.versioned_read_range(spark, path, "k", 100, 300)
    assert info["files_total"] == 8
    assert info["files_read"] < info["files_total"], info
    # skipping prunes I/O, never semantics
    expected = df.where((F.col("k") >= 100) & (F.col("k") <= 300))
    assert sorted(r["k"] for r in pruned.collect()) == sorted(
        r["k"] for r in expected.collect()
    )

    # second delta without clustering: its files all overlap the range
    # -> read, but the clustered delta still prunes
    V.versioned_append(
        spark.range(10_000, 20_000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(4),
        path,
        collect_stats=True,
    )
    pruned2, info2 = V.versioned_read_range(spark, path, "k", 100, 300)
    assert info2["files_total"] == 12
    assert info2["files_read"] == info["files_read"], info2  # v1 fully skipped
    assert pruned2.count() == 201


def test_stats_manifest_absent_is_conservative(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "noskip")
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    V.versioned_append(df.repartitionByRange(4, "k"), path)  # no manifest
    pruned, info = V.versioned_read_range(spark, path, "k", 0, 10)
    assert info["files_read"] == info["files_total"] == 4
    assert pruned.count() == 11


def test_stats_manifest_empty_result_keeps_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "emptyskip")
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit("x").alias("s"))
    V.versioned_append(df.repartitionByRange(4, "k"), path, collect_stats=True)
    pruned, info = V.versioned_read_range(spark, path, "k", 5_000, 6_000)
    assert info["files_read"] == 0
    assert pruned.count() == 0
    assert set(pruned.columns) == {"k", "s"}


# ---------------------------------------------------------------- OCC


def test_concurrent_appends_all_commit(spark, tmp_path):
    """Racing writers each commit their own dense version; nothing is
    lost, torn, or double-numbered (the atomic-rename claim)."""
    from concurrent.futures import ThreadPoolExecutor

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "race")

    def writer(i: int) -> int:
        df = spark.createDataFrame([(i, f"w{i}")], "k long, v string")
        return V.versioned_append(df, path)

    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(ex.map(writer, range(12)))

    assert sorted(versions) == list(range(12))  # dense, no dupes
    assert current_version(path) == 11
    got = {r["k"] for r in versioned_read(spark, path).collect()}
    assert got == set(range(12))
    # no stage garbage left behind by committed writers
    import os

    assert not [d for d in os.listdir(path) if d.startswith("_stage-")]


def test_append_cas_conflict_rolls_back(spark, tmp_path):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "cas")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    V.versioned_append(df, path)  # v0
    with pytest.raises(V.ConcurrentWriteError):
        V.versioned_append(df, path, expect_version=-1)  # expects empty table
    assert current_version(path) == 0
    import os

    assert not [d for d in os.listdir(path) if d.startswith("_stage-")]
    # matching expectation commits
    assert V.versioned_append(df, path, expect_version=0) == 1


def test_compact_aborts_on_concurrent_append(spark, tmp_path, monkeypatch):
    """An append that lands while compaction rewrites the snapshot
    must abort the compaction (else its rows vanish from the base)."""
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "cc")
    V.versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    V.versioned_append(spark.createDataFrame([(2, "b")], "k long, v string"), path)

    real_read = V.versioned_read
    fired = []

    def read_then_sneaky_append(spark_, path_, version=None):
        out = real_read(spark_, path_, version)
        if not fired:
            fired.append(True)
            real_read  # keep closure explicit
            V.versioned_append(
                spark.createDataFrame([(9, "z")], "k long, v string"),
                path,
                enforce_schema=False,
            )
        return out

    monkeypatch.setattr(V, "versioned_read", read_then_sneaky_append)
    with pytest.raises(V.ConcurrentWriteError):
        V.compact(spark, path)
    monkeypatch.undo()
    # the sneaky append survived; no compaction markers were written
    assert current_version(path) == 2
    assert V.compaction_base(path) == 0
    assert {r["k"] for r in versioned_read(spark, path).collect()} == {1, 2, 9}
    # retry with no interference now succeeds
    cv = V.compact(spark, path)
    assert cv == 3
    assert {r["k"] for r in versioned_read(spark, path).collect()} == {1, 2, 9}


def test_serializable_upsert_retries_past_conflict(spark, tmp_path, monkeypatch):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "ser")
    V.versioned_upsert(
        spark, spark.createDataFrame([(1, "a")], "k long, v string"), path, ["k"]
    )
    # inject a competing commit between the snapshot read and the CAS
    real_append = V.versioned_append
    fired = []

    def append_after_rival(df, path_, **kw):
        if not fired and kw.get("expect_version") is not None:
            fired.append(True)
            real_append(
                spark.createDataFrame([(7, "r")], "k long, v string"),
                path_,
            )
        return real_append(df, path_, **kw)

    monkeypatch.setattr(V, "versioned_append", append_after_rival)
    v, n = V.versioned_upsert(
        spark,
        spark.createDataFrame([(1, "dup"), (2, "b")], "k long, v string"),
        path,
        ["k"],
        serializable=True,
    )
    monkeypatch.undo()
    assert n == 1  # k=1 stayed an insert-if-absent no-op across the retry
    got = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert got == {1: "a", 7: "r", 2: "b"}


# ------------------------------------------------- schema evolution


def test_schema_evolution_add_and_omit_columns(spark, tmp_path):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "evo")
    V.versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    # additive: new column b
    V.versioned_append(
        spark.createDataFrame([(2, "b", 2.5)], "k long, v string, b double"), path
    )
    # subtractive: later delta omits v entirely
    V.versioned_append(spark.createDataFrame([(3,)], "k long"), path)
    now = versioned_read(spark, path)
    assert set(now.columns) == {"k", "v", "b"}
    rows = {r["k"]: (r["v"], r["b"]) for r in now.collect()}
    assert rows == {1: ("a", None), 2: ("b", 2.5), 3: (None, None)}
    # time travel: schema as of v0 has no b
    assert set(V.versioned_schema(spark, path, version=0).fieldNames()) == {"k", "v"}


def test_schema_enforcement_rejects_type_change(spark, tmp_path):
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "enforce")
    V.versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    with pytest.raises(V.SchemaEnforcementError, match="type changes"):
        V.versioned_append(
            spark.createDataFrame([("oops", "a")], "k string, v string"), path
        )
    assert current_version(path) == 0  # nothing committed
    # explicit bypass still works (caller owns the consequences)
    V.versioned_append(
        spark.createDataFrame([(2.0, "c")], "k double, v string"),
        path,
        enforce_schema=False,
    )
    assert current_version(path) == 1


def test_versioned_history_and_stage_vacuum(spark, tmp_path):
    """DESCRIBE HISTORY analog: per-version row/file counts from
    parquet footers (no Spark job), commit meta surfaced; vacuum
    clears orphaned stage dirs past retention but protects fresh ones."""
    import os

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "hist")
    V.versioned_append(
        spark.createDataFrame([(i, "x") for i in range(10)], "k long, v string"),
        path,
        meta={"job": "seed"},
    )
    V.versioned_append(
        spark.createDataFrame([(10, "y", 1.5)], "k long, v string, w double"), path
    )
    hist = V.versioned_history(path)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["n_rows"] == 10 and hist[1]["n_rows"] == 1
    assert hist[0]["meta"] == {"job": "seed"}
    assert hist[0]["n_columns"] == 2 and hist[1]["n_columns"] == 3
    assert all(h["n_files"] >= 1 and h["n_bytes"] > 0 for h in hist)

    # orphaned stage dirs: old one vacuumed, fresh one protected
    old_stage = os.path.join(path, "_stage-deadbeef")
    os.makedirs(old_stage)
    os.utime(old_stage, (0, 0))  # ancient mtime
    fresh_stage = os.path.join(path, "_stage-cafebabe")
    os.makedirs(fresh_stage)
    V.vacuum(path)  # default retention: fresh survives, ancient goes
    assert not os.path.isdir(old_stage)
    assert os.path.isdir(fresh_stage)
    # zero retention sweeps everything
    V.vacuum(path, stage_retention_s=0.0)
    assert not os.path.isdir(fresh_stage)
    # history still intact (nothing below a compaction base yet)
    assert [h["version"] for h in V.versioned_history(path)] == [0, 1]


def test_bloom_index_point_lookup(spark, tmp_path):
    """Per-file Bloom index: equality probes skip files min/max can't
    prune (unclustered high-cardinality key), absence proofs are
    exact, unindexed dirs read conservatively."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "bloomtbl")
    # unclustered ids: every file's min/max range spans every probe
    df = spark.range(0, 8_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    V.versioned_append(df.repartition(8), path, collect_stats=True)
    V.write_bloom_index(V.versioned_snapshot_dir(path, 0), "k")

    hit, info = V.versioned_read_point(spark, path, "k", 4242)
    assert info["files_total"] == 8
    assert info["files_read"] < 8, info  # bloom pruned most files
    assert [(r["k"], r["v"]) for r in hit.collect()] == [(4242, 8484)]

    # absent key: typically zero files read; result always empty
    miss, info_m = V.versioned_read_point(spark, path, "k", 999_999)
    assert miss.count() == 0
    assert info_m["files_read"] <= info["files_read"]

    # second delta WITHOUT an index: its files always read
    V.versioned_append(
        spark.range(8_000, 9_000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartition(2),
        path,
    )
    hit2, info2 = V.versioned_read_point(spark, path, "k", 8_500)
    assert info2["files_total"] == 10
    assert info2["files_read"] >= 2  # unindexed delta read conservatively
    assert [(r["k"], r["v"]) for r in hit2.collect()] == [(8_500, 17_000)]


def test_changes_fast_path_on_evolved_layout(spark, tmp_path):
    """The change-feed delta fast path must read a hive-partitioned
    delta with its RECORDED schema: bare re-inference would type a
    string-digit partition column as int and poison the key join."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "cdfevo")
    V.versioned_append(
        spark.createDataFrame(
            [(1, "a", "02"), (2, "b", "07")], "k long, v string, bucket string"
        ),
        path,
    )  # v0 flat
    V.versioned_append(
        spark.createDataFrame(
            [(3, "c", "02"), (4, "d", "11")], "k long, v string, bucket string"
        ),
        path,
        partition_by=("bucket",),
    )  # v1 hive-partitioned on the string bucket
    feed = V.versioned_changes(spark, path, ["k"], 0, 1)
    got = {(r["k"], r["bucket"], r["_change_type"]) for r in feed.collect()}
    assert got == {(3, "02", "insert"), (4, "11", "insert")}
    assert dict(feed.dtypes)["bucket"] == "string"


def test_pruned_reads_cover_partitioned_deltas(spark, tmp_path):
    """Range and point pruned reads must COUNT and READ files nested
    in hive-partitioned version dirs (a top-level-only listing
    silently dropped those rows) and recover the partition column via
    basePath."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "mixskip")
    V.versioned_append(
        spark.range(0, 100)
        .select(F.col("id").alias("k"), F.lit("flat").alias("src"))
        .repartitionByRange(4, "k"),
        path,
        collect_stats=True,
    )  # v0 flat, manifested
    V.versioned_append(
        spark.range(100, 200).select(
            F.col("id").alias("k"),
            F.lit("part").alias("src"),
            (F.col("id") % 2).cast("string").alias("bucket"),
        ),
        path,
        partition_by=("bucket",),
    )  # v1 hive-partitioned, no manifest

    got, info = V.versioned_read_range(spark, path, "k", 90, 110)
    assert info["files_total"] > 4  # partitioned delta's files counted
    rows = {(r["k"], r["src"]) for r in got.collect()}
    assert rows == {(k, "flat" if k < 100 else "part") for k in range(90, 111)}
    # partition column recovered, typed string
    assert dict(got.dtypes).get("bucket") == "string"
    assert {r["bucket"] for r in got.where(F.col("src") == "part").collect()} == {
        "0", "1"
    }

    hit, info_p = V.versioned_read_point(spark, path, "k", 150)
    assert [(r["k"], r["src"], r["bucket"]) for r in hit.collect()] == [
        (150, "part", "0")
    ]


def test_compact_folds_evolved_layouts(spark, tmp_path):
    """Compaction of a flat+partitioned table folds every row into one
    flat snapshot; time travel to the mixed era still works."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "mixcompact")
    V.versioned_append(
        spark.createDataFrame([(1, "x", "a")], "k long, v string, p string"), path
    )
    V.versioned_append(
        spark.createDataFrame([(2, "y", "b"), (3, "z", "a")], "k long, v string, p string"),
        path,
        partition_by=("p",),
    )
    cv = V.compact(spark, path)
    got = {(r["k"], r["p"]) for r in V.versioned_read(spark, path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "a")}
    assert V.compaction_base(path) == cv
    assert {r["k"] for r in V.versioned_read(spark, path, version=0).collect()} == {1}
    # post-compaction append + read still fine
    V.versioned_append(
        spark.createDataFrame([(4, "w", "c")], "k long, v string, p string"), path
    )
    assert V.versioned_read(spark, path).count() == 4


def test_optimize_table_orchestration(spark, tmp_path):
    """OPTIMIZE: sprawl folds into one stats-manifested snapshot, the
    bloom index lands on the base, vacuum trims history — and an
    un-sprawled table is left alone."""
    import os

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "opt")
    for i in range(6):
        V.versioned_append(
            spark.range(i * 100, (i + 1) * 100).select(F.col("id").alias("k")), path
        )
    # under the delta budget → no-op compaction
    rep0 = V.optimize_table(spark, path, max_deltas=8, bloom_column="k")
    assert not rep0["compacted"] and rep0["bloom_files"] >= 1
    # over budget → compacts, re-blooms the base, vacuums history
    rep = V.optimize_table(
        spark, path, max_deltas=4, bloom_column="k", run_vacuum=True
    )
    assert rep["compacted"] and rep["vacuumed"] == list(range(6))
    assert V.versioned_read(spark, path).count() == 600
    base_dir = V.versioned_snapshot_dir(path)
    assert os.path.isfile(os.path.join(base_dir, "_BLOOM.json"))
    assert os.path.isfile(os.path.join(base_dir, "_stats.json"))
    # point lookups ride the fresh bloom
    hit, info = V.versioned_read_point(spark, path, "k", 123)
    assert [r["k"] for r in hit.collect()] == [123]
    assert info["files_read"] <= info["files_total"]


def test_serializable_upserts_prevent_write_skew_under_race(spark, tmp_path):
    """Two writers racing insert-if-absent on OVERLAPPING keys: with
    serializable=True every key lands exactly once (the write-skew
    window a plain read-modify-write leaves open)."""
    from concurrent.futures import ThreadPoolExecutor

    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "skew")

    def upserter(tag: str):
        # every writer tries the SAME 6 keys plus 2 of its own
        rows = [(k, tag) for k in range(6)] + [
            (100 + hash(tag) % 50, tag),
            (200 + hash(tag) % 50, tag),
        ]
        df = spark.createDataFrame(rows, "k long, who string")
        return V.versioned_upsert(
            spark, df, path, ["k"], serializable=True, max_retries=20
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(upserter, ["a", "b", "c", "d"]))

    assert len(results) == 4  # nobody exhausted retries
    table = V.versioned_read(spark, path)
    per_key = (
        table.groupBy("k").count().where("count > 1").collect()
    )
    assert per_key == [], f"duplicate keys slipped through: {per_key}"
    # the 6 contested keys exist exactly once each
    assert table.where("k < 6").count() == 6


def test_versioned_clone_forks_independently(spark, tmp_path):
    """Clone = zero-copy fork: identical reads and time travel at the
    cloned version, then both sides evolve without touching each other,
    and vacuuming the source leaves the clone's files intact."""
    from data_lake_with_spark_spark.sources import versioned as V

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    V.versioned_append(df1, src)
    V.versioned_append(df2, src)

    cloned_v = V.versioned_clone(src, dst)
    assert cloned_v == V.current_version(src)
    assert sorted(
        (r["id"], r["v"]) for r in V.versioned_read(spark, dst).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel inside the clone
    assert V.versioned_read(spark, dst, version=0).count() == 2

    # divergence: append to clone only
    V.versioned_append(
        spark.createDataFrame([(4, "d")], "id long, v string"), dst
    )
    assert V.versioned_read(spark, dst).count() == 4
    assert V.versioned_read(spark, src).count() == 3

    # source-side evolution + vacuum never touches the clone
    V.versioned_append(
        spark.createDataFrame([(5, "e")], "id long, v string"), src
    )
    V.vacuum(src, stage_retention_s=0.0)
    assert V.versioned_read(spark, dst).count() == 4

    # cloning onto an existing table refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        V.versioned_clone(src, dst)


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: each commit records its wall clock atomically;
    reading as of a moment between commits yields exactly the earlier
    snapshot, and a timestamp before the first commit raises."""
    import time

    import pytest as _pytest

    from data_lake_with_spark_spark.sources.versioned import (
        version_committed_at,
        versioned_append,
        versioned_history,
        versioned_read,
        versioned_read_asof_timestamp,
    )

    path = str(tmp_path / "asof_table")
    t_before = time.time()
    time.sleep(0.05)
    versioned_append(spark.range(3).toDF("id"), path)
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    versioned_append(spark.range(3, 6).toDF("id"), path)

    got_mid = sorted(
        r["id"] for r in versioned_read_asof_timestamp(spark, path, t_mid).collect()
    )
    assert got_mid == [0, 1, 2]
    got_now = sorted(
        r["id"]
        for r in versioned_read_asof_timestamp(spark, path, time.time()).collect()
    )
    assert got_now == list(range(6))
    assert got_now == sorted(r["id"] for r in versioned_read(spark, path).collect())

    with _pytest.raises(ValueError):
        versioned_read_asof_timestamp(spark, path, t_before)

    at0, at1 = version_committed_at(path, 0), version_committed_at(path, 1)
    assert at0 is not None and at1 is not None and at0 < at1
    hist = versioned_history(path)
    assert [h["committed_at"] for h in hist] == [at0, at1]


def test_check_constraints_block_bad_appends(spark, tmp_path):
    """Delta CHECK-constraint analog: a registered predicate blocks
    violating batches atomically (no version committed), nulls count
    as violations, and dropping the constraint unblocks."""
    import pytest as _pytest

    from data_lake_with_spark_spark.sources.versioned import (
        ConstraintViolationError,
        add_table_constraint,
        current_version,
        drop_table_constraint,
        table_constraints,
        versioned_append,
        versioned_read,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "constrained")
    add_table_constraint(path, "positive_id", "id > 0")
    assert table_constraints(path) == {"positive_id": "id > 0"}

    versioned_append(spark.range(1, 4).toDF("id"), path)
    assert current_version(path) == 0

    with _pytest.raises(ConstraintViolationError):
        versioned_append(spark.range(0, 2).toDF("id"), path)  # id=0 violates
    assert current_version(path) == 0  # nothing committed

    nulls = spark.range(1).select(F.lit(None).cast("long").alias("id"))
    with _pytest.raises(ConstraintViolationError):
        versioned_append(nulls, path, enforce_schema=False)

    drop_table_constraint(path, "positive_id")
    versioned_append(spark.range(0, 2).toDF("id"), path)
    assert sorted(r["id"] for r in versioned_read(spark, path).collect()) == [
        0, 1, 1, 2, 3,
    ]


def test_restore_to_version(spark, tmp_path):
    """RESTORE: one commit re-asserts an old snapshot under
    last-writer-wins — overwritten keys revert, later-added keys
    tombstone, deleted keys come back — while pre-restore history
    stays time-travelable."""
    from data_lake_with_spark_spark.sources.versioned import (
        versioned_append,
        versioned_delete,
        versioned_read_merged,
        versioned_restore,
    )

    path = str(tmp_path / "restorable")
    versioned_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"), path
    )  # v0
    versioned_append(
        spark.createDataFrame([(2, "c"), (3, "d")], "id long, val string"), path
    )  # v1: overwrite 2, add 3
    versioned_delete(
        spark, spark.createDataFrame([(1,)], "id long"), path, ["id"]
    )  # v2: delete 1

    assert {
        (r["id"], r["val"])
        for r in versioned_read_merged(spark, path, ["id"]).collect()
    } == {(2, "c"), (3, "d")}

    v, n_readd, n_tomb = versioned_restore(spark, path, ["id"], to_version=0)
    assert v == 3 and n_readd == 2 and n_tomb == 1  # 1,2 revert; 3 tombstoned

    assert {
        (r["id"], r["val"])
        for r in versioned_read_merged(spark, path, ["id"]).collect()
    } == {(1, "a"), (2, "b")}
    # pre-restore history intact
    assert {
        (r["id"], r["val"])
        for r in versioned_read_merged(spark, path, ["id"], version=1).collect()
    } == {(1, "a"), (2, "c"), (3, "d")}


def test_delete_and_restore_on_constrained_table(spark, tmp_path):
    """CHECK constraints must not block DELETE/RESTORE: tombstone rows
    carry NULL non-key columns by construction, and Delta applies CHECK
    constraints to inserted data only — so a constraint on a non-key
    column is exempt for delete markers while still blocking genuinely
    bad inserts on the same table."""
    import pytest as _pytest

    from data_lake_with_spark_spark.sources.versioned import (
        ConstraintViolationError,
        add_table_constraint,
        versioned_append,
        versioned_delete,
        versioned_read_merged,
        versioned_restore,
    )

    path = str(tmp_path / "constrained_del")
    add_table_constraint(path, "val_nonempty", "length(val) > 0")
    versioned_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string"), path
    )  # v0
    versioned_append(
        spark.createDataFrame([(3, "c")], "id long, val string"), path
    )  # v1

    # DELETE commits despite val being NULL on the tombstone row.
    v, n = versioned_delete(
        spark, spark.createDataFrame([(2,)], "id long"), path, ["id"]
    )
    assert (v, n) == (2, 1)
    assert {
        (r["id"], r["val"])
        for r in versioned_read_merged(spark, path, ["id"]).collect()
    } == {(1, "a"), (3, "c")}

    # RESTORE to v0 tombstones key 3 and re-adds key 2 — both legal.
    versioned_restore(spark, path, ["id"], to_version=0)
    assert {
        (r["id"], r["val"])
        for r in versioned_read_merged(spark, path, ["id"]).collect()
    } == {(1, "a"), (2, "b")}

    # The constraint still blocks real bad inserts (staged-read check).
    with _pytest.raises(ConstraintViolationError):
        versioned_append(
            spark.createDataFrame([(9, "")], "id long, val string"), path
        )
