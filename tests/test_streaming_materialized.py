"""Streaming materialized view: an IVM aggregate advanced per
micro-batch of change rows, each refresh committed as a time-travelable
version. Final state must equal the single-shot fold of all changes
(which test_ivm.py pins to full recompute)."""

from __future__ import annotations

import pandas as pd
import pytest
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.sources import versioned as V
from data_lake_with_spark_spark.streaming import materialized as MV

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), True),
        T.StructField("cat", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("_change_type", T.StringType(), True),
    ]
)

BATCH1 = [
    (1, "red", 10.0, "insert"),
    (2, "red", 5.0, "insert"),
    (3, "blue", 2.0, "insert"),
]
BATCH2 = [
    (1, "red", 10.0, "update_preimage"),
    (1, "red", 11.5, "update_postimage"),
    (3, "blue", 2.0, "update_preimage"),
    (3, "red", 2.0, "update_postimage"),  # group-moving
    (4, "green", 7.0, "insert"),
]
BATCH3 = [(4, "green", 7.0, "delete")]


_WRITE_SEQ = [1_700_000_000]


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "cat", "v", "_change_type"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    # FileStreamSource replays in MODIFICATION-TIME order; two writes
    # landing in the same millisecond tie and can replay out of order
    # under maxFilesPerTrigger=1, applying b2's changes before b1's
    # (observed as a load-dependent flake in the full suite). Pin a
    # strictly increasing mtime per write.
    import os

    _WRITE_SEQ[0] += 10
    os.utime(path, (_WRITE_SEQ[0], _WRITE_SEQ[0]))


def _state_rows(df):
    return {
        (r["cat"], r["n_rows"], round(r["v"], 9)) for r in df.collect()
    }


def test_stream_maintained_view_matches_single_shot_fold(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    state = str(tmp_path / "view")
    _write(str(src / "b1.parquet"), BATCH1)
    _write(str(src / "b2.parquet"), BATCH2)
    _write(str(src / "b3.parquet"), BATCH3)

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_view(stream, state, ["cat"], ["v"], query_name="mv1")
    assert q.awaitTermination(600), 'stream did not terminate'
    all_changes = spark.createDataFrame(BATCH1 + BATCH2 + BATCH3, CHANGE_SCHEMA)
    want = _state_rows(ivm.maintain(None, all_changes, ["cat"], ["v"]))
    got = _state_rows(MV.read_view(spark, state))
    assert got == want
    # blue emptied by the group-moving update; green emptied by delete
    assert {c for c, _, _ in got} == {"red"}

    # time travel: one committed version per micro-batch, and version 0
    # is the view after batch 1 alone
    assert V.current_version(state) == 2
    v0 = _state_rows(MV.read_view(spark, state, version=0))
    b1 = spark.createDataFrame(BATCH1, CHANGE_SCHEMA)
    assert v0 == _state_rows(ivm.maintain(None, b1, ["cat"], ["v"]))


def test_stream_maintained_moment_view(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    state = str(tmp_path / "mview")
    _write(str(src / "b1.parquet"), BATCH1)
    _write(str(src / "b2.parquet"), BATCH2)

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_moment_view(stream, state, ["cat"], ["v"], query_name="mv2")
    assert q.awaitTermination(600), 'stream did not terminate'
    stats = {
        (r["cat"], r["n_rows"], round(r["avg_v"], 9),
         None if r["stddev_v"] is None else round(r["stddev_v"], 6))
        for r in ivm.moment_stats(MV.read_view(spark, state), ["cat"], ["v"]).collect()
    }
    # post-change base: k1 red 11.5, k2 red 5.0, k3 red 2.0, k4 green 7.0
    base = spark.createDataFrame(
        [(1, "red", 11.5), (2, "red", 5.0), (3, "red", 2.0), (4, "green", 7.0)],
        ["k", "cat", "v"],
    )
    want = {
        (r["cat"], r["n_rows"], round(r["avg_v"], 9),
         None if r["stddev_v"] is None else round(r["stddev_v"], 6))
        for r in base.groupBy("cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.avg("v").alias("avg_v"),
            F.stddev_samp("v").alias("stddev_v"),
        )
        .collect()
    }
    assert stats == want


def test_kill_and_resume_from_checkpoint(spark, tmp_path):
    """The real-cluster failure mode: the maintaining query dies and is
    restarted from its checkpoint. The resumed run must drain only the
    UNSEEN source files and converge to exactly the uninterrupted
    single-shot fold — no lost batch, no re-applied batch."""
    src = tmp_path / "changes"
    src.mkdir()
    state = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    # run 1: batches 1+2 only, then the query stops (availableNow)
    _write(str(src / "b1.parquet"), BATCH1)
    _write(str(src / "b2.parquet"), BATCH2)
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_view(
        stream, state, ["cat"], ["v"], query_name="mv_kr1", checkpoint=ckpt
    )
    assert q.awaitTermination(600), 'stream did not terminate'
    v_after_run1 = V.current_version(state)
    assert v_after_run1 is not None

    # "kill": the query object is gone; b3 arrives while we're down
    _write(str(src / "b3.parquet"), BATCH3)

    # resume: same checkpoint, fresh query
    stream2 = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q2 = MV.stream_maintain_view(
        stream2, state, ["cat"], ["v"], query_name="mv_kr2", checkpoint=ckpt
    )
    assert q2.awaitTermination(600), 'stream did not terminate'
    # converged to the uninterrupted fold; batches 1/2 NOT re-applied
    all_changes = spark.createDataFrame(BATCH1 + BATCH2 + BATCH3, CHANGE_SCHEMA)
    want = _state_rows(ivm.maintain(None, all_changes, ["cat"], ["v"]))
    assert _state_rows(MV.read_view(spark, state)) == want
    assert V.current_version(state) == v_after_run1 + 1  # exactly one new refresh


def test_replayed_micro_batch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the state commit
    but before the checkpoint commit re-fires the SAME epoch. The
    epoch guard must make the second application a no-op."""
    state = str(tmp_path / "view")
    b1 = spark.createDataFrame(BATCH1, CHANGE_SCHEMA)
    b2 = spark.createDataFrame(BATCH2, CHANGE_SCHEMA)

    assert MV.apply_changes(state, b1, 0, ["cat"], ["v"]) == 0
    after_first = _state_rows(MV.read_view(spark, state))
    # replay of epoch 0 (simulated sink crash-before-checkpoint)
    assert MV.apply_changes(state, b1, 0, ["cat"], ["v"]) is None
    assert V.current_version(state) == 0
    assert _state_rows(MV.read_view(spark, state)) == after_first
    # the NEXT epoch still applies
    assert MV.apply_changes(state, b2, 1, ["cat"], ["v"]) == 1
    assert MV.applied_epoch(state) == 1
    want = _state_rows(
        ivm.maintain(None, spark.createDataFrame(BATCH1 + BATCH2, CHANGE_SCHEMA), ["cat"], ["v"])
    )
    assert _state_rows(MV.read_view(spark, state)) == want


def test_stream_maintained_join_view(spark, tmp_path):
    """Enriched-rollup streaming IVM: per-dim-group sums maintained
    from a fact change stream equal the batch join+fold, across
    inserts, a group-moving update, and a delete."""
    dim = spark.createDataFrame([(1, "red"), (2, "blue")], "dim_id long, color string")
    JOIN_SCHEMA = "fid long, dim_id long, v double, _change_type string"
    B1 = [(10, 1, 5.0, "insert"), (11, 2, 7.0, "insert"), (12, 9, 1.0, "insert")]
    B2 = [  # fid 11 moves blue → red
        (11, 2, 7.0, "update_preimage"),
        (11, 1, 7.0, "update_postimage"),
        (10, 1, 5.0, "delete"),
    ]
    src = tmp_path / "jchanges"
    src.mkdir()
    state = str(tmp_path / "jview")

    def write_batch(path, rows):
        pdf = pd.DataFrame(rows, columns=["fid", "dim_id", "v", "_change_type"])
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)

    write_batch(str(src / "b1.parquet"), B1)
    write_batch(str(src / "b2.parquet"), B2)

    stream = (
        spark.readStream.schema(JOIN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_join_view(
        stream, dim, state, "dim_id", "dim_id", ["color"], ["v"], query_name="jv1"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    def rows(df):
        return {(r["color"], r["n_rows"], round(r["v"], 9)) for r in df.collect()}

    all_changes = spark.createDataFrame(B1 + B2, JOIN_SCHEMA)
    want = rows(
        ivm.maintain_join_agg(None, all_changes, dim, "dim_id", "dim_id", ["color"], ["v"])
    )
    got = rows(MV.read_view(spark, state))
    assert got == want
    # red holds only the moved fid 11 (10 deleted); blue emptied; fid
    # 12 never matched a dim row
    assert got == {("red", 1, 7.0)}


def test_stream_maintained_histogram_quantiles(spark, sf_dir, tmp_path):
    """The mergeable-histogram claim end-to-end: unit-bucket counts
    maintained per micro-batch (bucket-wise addition via the IVM fold)
    yield EXACTLY the quantiles of the one-shot batch computation over
    the full events table."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.histogram import (
        histogram_quantiles,
        unit_histogram,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pdf = ev.toPandas()
    pdf["bucket"] = pdf["value"].apply(lambda v: int(v // 1))
    pdf["_change_type"] = "insert"
    rows = pdf[["event_type", "bucket", "_change_type"]]

    src = tmp_path / "changes"
    src.mkdir()
    for i, half in enumerate((rows.iloc[::2], rows.iloc[1::2])):
        pq.write_table(
            pa.Table.from_pandas(half, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("bucket", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "hist_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_view(
        stream, state, ["event_type", "bucket"], [], query_name="hist_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    view = MV.read_view(spark, state).withColumnRenamed("n_rows", "cnt")
    got = {
        (r["event_type"], r["q"], r["est"])
        for r in histogram_quantiles(view, "event_type").collect()
    }
    want = {
        (r["event_type"], r["q"], r["est"])
        for r in histogram_quantiles(
            unit_histogram(ev, "event_type", "value"), "event_type"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_maintained_bitmap_distinct(spark, sf_dir, tmp_path):
    """Exact distinct via streaming bitmap folds: per-micro-batch
    OR-merge must reproduce the one-shot countDistinct per event type,
    and a REPLAYED batch (idempotent OR) must not change anything."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.ivm import (
        maintain_bitmap,
        read_bitmap_distinct,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    pdf = ev.toPandas()
    pdf["_change_type"] = "insert"

    src = tmp_path / "changes"
    src.mkdir()
    for i, half in enumerate((pdf.iloc[::2], pdf.iloc[1::2])):
        pq.write_table(
            pa.Table.from_pandas(half, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "bitmap_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_bitmap_view(
        stream, state, ["event_type"], "user_id", query_name="bm_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    got = {
        (r["event_type"], r["n_distinct"])
        for r in read_bitmap_distinct(
            MV.read_view(spark, state), ["event_type"]
        ).collect()
    }
    want = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0

    # idempotence: re-folding the first half changes nothing
    cur = MV.read_view(spark, state)
    batch1 = spark.createDataFrame(pdf.iloc[::2], schema)
    refold = maintain_bitmap(cur, batch1, ["event_type"], "user_id")
    got2 = {
        (r["event_type"], r["n_distinct"])
        for r in read_bitmap_distinct(refold, ["event_type"]).collect()
    }
    assert got2 == want


def test_stream_maintained_kmv_distinct(spark, sf_dir, tmp_path):
    """KMV theta-sketch distinct via streaming folds: the maintained
    state must be BIT-IDENTICAL to the one-shot kmv_sketch (k smallest
    hashes is an associative merge), the estimate must track the true
    distinct within KMV error bounds, and a replayed batch must be a
    no-op."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.ivm import (
        maintain_kmv,
        read_kmv_distinct,
    )
    from data_lake_with_spark_spark.operators.sketches import kmv_sketch

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    pdf = ev.toPandas()
    pdf["_change_type"] = "insert"

    src = tmp_path / "kmv_changes"
    src.mkdir()
    for i, half in enumerate((pdf.iloc[::2], pdf.iloc[1::2])):
        pq.write_table(
            pa.Table.from_pandas(half, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "kmv_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_kmv_view(
        stream, state, ["event_type"], "user_id", k=64, query_name="kmv_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    streamed = {
        (r["event_type"], r["h"])
        for r in MV.read_view(spark, state).collect()
    }
    oneshot = {
        (r["gk"], r["h"])
        for r in kmv_sketch(ev, "user_id", "event_type", k=64).collect()
    }
    assert streamed == oneshot and len(streamed) > 0

    # estimates within KMV error (k=64 → ~12.5% stderr; allow 4σ)
    true = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in read_kmv_distinct(
        MV.read_view(spark, state), ["event_type"], k=64
    ).collect():
        t = true[r["event_type"]]
        assert abs(r["est_distinct"] - t) <= max(3, t * 0.5), (r, t)

    # idempotence: re-folding the first half changes nothing
    cur = MV.read_view(spark, state)
    batch1 = spark.createDataFrame(pdf.iloc[::2], schema)
    refold = maintain_kmv(cur, batch1, ["event_type"], "user_id", k=64)
    assert {
        (r["event_type"], r["h"]) for r in refold.collect()
    } == streamed


def test_stream_maintained_hll_distinct(spark, sf_dir, tmp_path):
    """Portable-HLL distinct via streaming register folds: the
    maintained register table must be BIT-IDENTICAL to the one-shot
    hll_registers MAX (register max is an associative merge), the
    estimate must equal the one-shot sketch's estimate exactly (same
    registers -> same integer sum), and a replayed batch must fold to
    the same state (idempotence)."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.ivm import (
        maintain_hll,
        read_hll_distinct,
    )
    from data_lake_with_spark_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    pdf = ev.toPandas()
    pdf["_change_type"] = "insert"

    src = tmp_path / "hll_changes"
    src.mkdir()
    for i, half in enumerate((pdf.iloc[::2], pdf.iloc[1::2])):
        pq.write_table(
            pa.Table.from_pandas(half, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "hll_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_hll_view(
        stream, state, ["event_type"], "user_id", query_name="hll_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    streamed = {
        (r["event_type"], r["reg"], r["m"])
        for r in MV.read_view(spark, state).collect()
    }
    oneshot = {
        (r["gk"], r["reg"], r["m"])
        for r in hll_registers(ev, "user_id", "event_type")
        .groupBy("gk", "reg")
        .agg(F.max("rho").alias("m"))
        .collect()
    }
    assert streamed == oneshot and len(streamed) > 0

    # estimates identical to the one-shot sketch (same registers)
    got_est = {
        r["event_type"]: (r["users_est"], r["n_zero_registers"])
        for r in read_hll_distinct(
            MV.read_view(spark, state), ["event_type"]
        ).collect()
    }
    want_est = {
        r["gk"]: (r["users_est"], r["n_zero_registers"])
        for r in hll_estimate(hll_registers(ev, "user_id", "event_type")).collect()
    }
    assert got_est == want_est

    # idempotence: re-folding the first half changes nothing
    cur = MV.read_view(spark, state)
    batch1 = spark.createDataFrame(pdf.iloc[::2], schema)
    refold = maintain_hll(cur, batch1, ["event_type"], "user_id")
    assert {
        (r["event_type"], r["reg"], r["m"]) for r in refold.collect()
    } == streamed


def test_stream_maintained_extrema_freshness(spark, sf_dir, tmp_path):
    """Per-source extrema via streaming folds: the maintained
    (vmax, vmin, n_rows) state must equal the one-shot aggregate over
    all events, and the epoch guard must make a replayed micro-batch
    a no-op (counts are NOT replay-idempotent, unlike the
    register/bitmap states -- this pins the guard actually working)."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.ivm import maintain_extrema

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pdf = ev.toPandas()
    pdf["_change_type"] = "insert"

    src = tmp_path / "ext_changes"
    src.mkdir()
    for i, half in enumerate((pdf.iloc[::2], pdf.iloc[1::2])):
        pq.write_table(
            pa.Table.from_pandas(half, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "ext_view")
    ckpt = str(tmp_path / "ext_ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_extrema_view(
        stream, state, ["event_type"], "value",
        query_name="ext_mv", checkpoint=ckpt,
    )
    assert q.awaitTermination(600), "stream did not terminate"

    got = {
        r["event_type"]: (r["vmax"], r["vmin"], r["n_rows"])
        for r in MV.read_view(spark, state).collect()
    }
    want = {
        r["event_type"]: (r["vmax"], r["vmin"], r["n_rows"])
        for r in ev.groupBy("event_type")
        .agg(
            F.max("value").alias("vmax"),
            F.min("value").alias("vmin"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == want and len(got) > 0

    # epoch guard: replaying epoch 0's batch must be skipped entirely
    batch0 = spark.createDataFrame(pdf.iloc[::2], schema)
    before = MV.applied_epoch(state)
    # a non-newer epoch id is a no-op
    import data_lake_with_spark_spark.sources.versioned as V

    v_before = V.current_version(state)
    res = MV.read_view(spark, state)
    cur = maintain_extrema(res, batch0, ["event_type"], "value")
    # direct re-fold WOULD inflate counts -- proving the guard matters
    inflated = {
        r["event_type"]: r["n_rows"] for r in cur.collect()
    }
    assert any(
        inflated[k] > want[k][2] for k in inflated
    ), "re-fold should inflate counts without the guard"
    assert V.current_version(state) == v_before
    assert MV.applied_epoch(state) == before


def test_stream_maintained_changelog_compaction(spark, sf_dir, tmp_path):
    """Streaming changelog compaction == the one-shot batch query:
    the events-derived I/U/D log split into three ARBITRARY
    micro-batches (event_id % 3 — later changes can arrive in earlier
    batches, pinning that the last-write-wins fold is commutative over
    batch splits, not merely associative) must maintain exactly the
    net-effect state cdc_changelog_compact computes in one shot."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.cdc import compact_changelog
    from data_lake_with_spark_spark.plans import REGISTRY

    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    src = str(tmp_path / "cl_changes")
    for i in range(3):
        # spark-written chunks (micros timestamps; pandas would write
        # TIMESTAMP(NANOS) and break the declared stream schema)
        log.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "cl_view")
    ckpt = str(tmp_path / "cl_ckpt")
    stream = (
        spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = MV.stream_maintain_changelog_view(
        stream, state, query_name="cl_mv", checkpoint=ckpt
    )
    assert q.awaitTermination(600), "stream did not terminate"

    def rows(df):
        return {
            (
                r["user_id"],
                r["n_changes"],
                r["first_event_id"],
                r["last_event_id"],
                r["last_op"],
                r["net"],
                r["last_value"],
            )
            for r in df.collect()
        }

    got = rows(MV.read_view(spark, state))
    assert got == rows(compact_changelog(None, log))
    # and the registered batch query (authoritative: DuckDB-oracled)
    assert got == rows(REGISTRY["cdc_changelog_compact"].spark(spark, sf_dir))
    # one committed version per non-empty micro-batch
    assert V.current_version(state) == 2


def test_stream_maintained_topk_leaderboard(spark, sf_dir, tmp_path):
    """Per-type top-5-by-value leaderboard maintained from arbitrary
    micro-batch splits must equal the one-shot window query: top-k
    over a max-monoid is exactly mergeable (topk(A∪B) =
    topk(topk(A)∪topk(B))), so the O(groups·k) state needs no
    sketch. Split by event_id % 3 — later winners arrive in earlier
    batches and vice versa."""
    from data_lake_with_spark_spark.catalog import load_table
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    src = str(tmp_path / "tk_changes")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "tk_view")
    ckpt = str(tmp_path / "tk_ckpt")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = MV.stream_maintain_topk_view(
        stream, state, ["event_type"], "value", "event_id",
        k=5, query_name="tk_mv", checkpoint=ckpt,
    )
    assert q.awaitTermination(600), "stream did not terminate"

    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    want = {
        (r["event_type"], r["event_id"], r["value"])
        for r in ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 5)
        .collect()
    }
    got = {
        (r["event_type"], r["event_id"], r["value"])
        for r in MV.read_view(spark, state).collect()
    }
    assert got == want


def test_stream_maintained_psi_drift(spark, sf_dir, tmp_path):
    """The streamed PSI view must equal the one-shot
    ml_psi_score_drift query EXACTLY (same bins, same ppm, same
    rounded contributions) after folding the same rows through 3
    uneven micro-batches — per-(side, bin) counts are a plain
    additive state, so split shape can't matter; and re-folding a
    batch must be caught by nothing here (no epochs without
    checkpoint) yet produce a different state — proving the count
    state is NOT replay-idempotent and the epoch guard is
    load-bearing in checkpointed deployments."""
    from data_lake_with_spark_spark.plans import REGISTRY

    from data_lake_with_spark_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            F.expr(
                "pmod(CAST(conv(substring(md5(concat(CAST(vec_id AS STRING),"
                " 'psi')), 1, 8), 16, 10) AS BIGINT), 2)"
            ).alias("side"),
            F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
            .cast("long")
            .alias("score_micro"),
        )
        .toPandas()
    )
    rows["_change_type"] = "insert"

    src = tmp_path / "psi_changes"
    src.mkdir()
    splits = (rows.iloc[:7], rows.iloc[7:11], rows.iloc[11:])
    for i, part in enumerate(splits):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )

    schema = T.StructType(
        [
            T.StructField("side", T.LongType(), True),
            T.StructField("score_micro", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "psi_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_psi_view(
        stream, state, "score_micro", "side", query_name="psi_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    got = [
        (r["bin"], r["n_expected"], r["n_actual"], r["expected_ppm"],
         r["actual_ppm"], r["contribution"])
        for r in MV.read_psi_drift(spark, state).collect()
    ]
    want = [
        (r["bin"], r["n_expected"], r["n_actual"], r["expected_ppm"],
         r["actual_ppm"], r["contribution"])
        for r in REGISTRY["ml_psi_score_drift"].spark(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 6

    # count state is not replay-idempotent: refolding batch 0 must
    # change n_rows totals (the epoch guard exists for exactly this)
    before = {
        (r["side"], r["bin"]): r["n_rows"]
        for r in MV.read_view(spark, state).collect()
    }
    batch0 = spark.createDataFrame(splits[0], schema)
    refold = ivm.maintain(
        MV.read_view(spark, state),
        batch0.withColumn("bin", MV.psi_bin("score_micro")).select(
            "side", "bin", "_change_type"
        ),
        ["side", "bin"],
        [],
    )
    after = {(r["side"], r["bin"]): r["n_rows"] for r in refold.collect()}
    assert sum(after.values()) == sum(before.values()) + len(splits[0])


def test_stream_topk_insert_only_contract(spark, sf_dir, tmp_path):
    """The top-k view's insert-only contract (round-7 ADVICE): with a
    CDF-style _change_type column, update_postimage rows fold like
    inserts, update_preimage rows never do (they'd double-fold every
    update), and a delete row fails the stream loudly instead of being
    silently folded in as an insert."""
    from data_lake_with_spark_spark.catalog import load_table
    from pyspark.sql import Window as W

    # orderBy before limit: an unordered .limit(500) is evaluated once
    # for the changes parquet and once for `want` below, and the two
    # evaluations may pick DIFFERENT rows (round-8 ADVICE flake)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .orderBy("event_id")
        .limit(500)
    )
    # every row twice: once as a bogus preimage with an inflated value
    # (must be ignored), once as the real postimage
    changes = ev.select(
        "event_type", "event_id",
        (F.col("value") + 1e9).alias("value"),
        F.lit("update_preimage").alias("_change_type"),
    ).unionByName(
        ev.withColumn("_change_type", F.lit("update_postimage"))
    )
    src = str(tmp_path / "tkc_changes")
    changes.coalesce(1).write.parquet(src)
    state = str(tmp_path / "tkc_view")
    stream = spark.readStream.schema(changes.schema).parquet(src)
    q = MV.stream_maintain_topk_view(
        stream, state, ["event_type"], "value", "event_id", k=3,
        query_name="tkc_mv",
    )
    assert q.awaitTermination(600), "stream did not terminate"

    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    want = {
        (r["event_type"], r["event_id"], r["value"])
        for r in ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .collect()
    }
    got = {
        (r["event_type"], r["event_id"], r["value"])
        for r in MV.read_view(spark, state).collect()
    }
    assert got == want  # preimages ignored: no 1e9-inflated values

    # a delete row must fail the micro-batch, not corrupt the state
    deletes = ev.limit(1).withColumn("_change_type", F.lit("delete"))
    src2 = str(tmp_path / "tkd_changes")
    deletes.coalesce(1).write.parquet(src2)
    stream2 = spark.readStream.schema(deletes.schema).parquet(src2)
    q2 = MV.stream_maintain_topk_view(
        stream2, str(tmp_path / "tkd_view"), ["event_type"], "value",
        "event_id", k=3, query_name="tkd_mv",
    )
    with pytest.raises(Exception, match="insert-only"):
        q2.awaitTermination(600)


def test_stream_topk_update_replaces_retained_id(spark, tmp_path):
    """Round-8 ADVICE (medium): an update_postimage that raises the
    value of an id ALREADY retained in the top-k state must replace
    the stale row, not coexist with it — the unfixed merge kept both
    (group, id) rows, listing the id twice and displacing a
    legitimate distinct k-th member."""

    def run_batch(rows, state):
        df = spark.createDataFrame(
            rows, "g string, id bigint, v bigint, _change_type string"
        )
        src = str(tmp_path / f"tku_src_{len(list(tmp_path.iterdir()))}")
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = MV.stream_maintain_topk_view(
            stream, state, ["g"], "v", "id", k=3, query_name="tku_mv"
        )
        assert q.awaitTermination(600), "stream did not terminate"

    state = str(tmp_path / "tku_view")
    run_batch(
        [("g", 1, 40, "insert"), ("g", 2, 30, "insert"),
         ("g", 3, 20, "insert"), ("g", 4, 10, "insert")],
        state,
    )
    # id 2 raises 30 -> 35: old merge retained BOTH (35, id2) and
    # (30, id2) in the top 3, evicting id 3
    run_batch([("g", 2, 35, "update_postimage")], state)
    got = sorted(
        (r["id"], r["v"]) for r in MV.read_view(spark, state).collect()
    )
    assert got == [(1, 40), (2, 35), (3, 20)]


def test_stream_dedup_neardup_first_arrival(spark, sf_dir, tmp_path):
    """Streaming near-dup dedup-at-ingest == the one-shot batch rule
    when arrival order equals id order: 3 CONTIGUOUS id-range
    micro-batches of the documents table must produce exactly the
    verdicts of the one-shot computation (a doc is dup iff it shares a
    MinHash band with a smaller-id doc AND their signatures agree on
    >= ceil(t*k) positions; dup_of = the smallest such witness,
    dropped docs still witness). State is signatures only — the test
    also pins that the view never persists text."""
    import math

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.dedup import minhash_signatures

    num_hashes, bands, threshold, n = 16, 4, 0.5, 3
    rows_per_band = num_hashes // bands
    min_agree = math.ceil(threshold * num_hashes)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # one-shot expected, from the same public primitives
    sig = minhash_signatures(docs, num_hashes, n, "doc_id", "text")
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        for b in range(bands)
    ]
    frame = sig.select(
        F.col("id").alias("doc_id"),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
        F.array(*band_cols).alias("bands"),
    )
    post = frame.select("doc_id", "sig", F.posexplode("bands").alias("band", "val"))
    agree = F.aggregate(
        F.zip_with("n_sig", "o_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pairs = (
        post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("witness"),
            F.col("a.sig").alias("n_sig"),
            F.col("b.sig").alias("o_sig"),
        )
        .withColumn("agree", agree)
        .where(F.col("agree") >= min_agree)
        .groupBy("doc_id")
        .agg(F.min("witness").alias("dup_of"))
    )
    want = {
        r["doc_id"]: r["dup_of"]
        for r in frame.join(pairs, "doc_id", "left").collect()
    }
    assert any(v is not None for v in want.values()), "corpus has no near-dups"

    # stream the same docs in 3 contiguous id ranges (arrival == id order)
    src = tmp_path / "nd_changes"
    src.mkdir()
    pdf = docs.toPandas().sort_values("doc_id")
    cuts = [0, 170, 340, len(pdf)]
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[cuts[i]:cuts[i + 1]], preserve_index=False),
            str(src / f"b{i}.parquet"),
        )
    state = str(tmp_path / "nd_view")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_dedup_neardup_view(
        stream, state, threshold=threshold, num_hashes=num_hashes,
        bands=bands, n=n, query_name="nd_mv",
    )
    assert q.awaitTermination(600), "stream did not terminate"

    view = MV.read_neardup_state(spark, state)
    assert "text" not in view.columns  # signatures only, never text
    # append-only delta layout: each version holds ONLY its batch
    assert V.current_version(state) == 2
    assert MV.read_neardup_state(spark, state, version=0).count() == 170
    got = {r["doc_id"]: r["dup_of"] for r in view.collect()}
    assert got == want
    kept = {r["doc_id"] for r in view.where("kept").collect()}
    assert kept == {d for d, w in want.items() if w is None}


def test_stream_dedup_neardup_out_of_order_is_conservative(spark, sf_dir, tmp_path):
    """Out-of-order arrival (doc_id % 3 splits — smaller-id witnesses
    can arrive AFTER the docs they would have caught): the smaller-id-
    witness guard means a doc is only marked dup against witnesses
    already seen, so streamed dup verdicts must be a SUBSET of the
    one-shot dups (never a false dup), kept a superset, and every
    streamed dup_of must agree with a real one-shot collision."""
    import math

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.dedup import minhash_signatures

    num_hashes, bands, threshold, n = 16, 4, 0.5, 3
    rows_per_band = num_hashes // bands
    min_agree = math.ceil(threshold * num_hashes)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signatures(docs, num_hashes, n, "doc_id", "text")
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        for b in range(bands)
    ]
    frame = sig.select(
        F.col("id").alias("doc_id"),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
        F.array(*band_cols).alias("bands"),
    )
    post = frame.select("doc_id", "sig", F.posexplode("bands").alias("band", "val"))
    agree = F.aggregate(
        F.zip_with("n_sig", "o_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    oneshot_pairs = {
        (r["doc_id"], r["witness"])
        for r in post.alias("a")
        .join(
            post.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("witness"),
            F.col("a.sig").alias("n_sig"),
            F.col("b.sig").alias("o_sig"),
        )
        .withColumn("agree", agree)
        .where(F.col("agree") >= min_agree)
        .select("doc_id", "witness")
        .collect()
    }
    oneshot_dups = {d for d, _ in oneshot_pairs}
    assert oneshot_dups, "corpus has no near-dups"

    src = tmp_path / "ooo_changes"
    src.mkdir()
    pdf = docs.toPandas()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(pdf[pdf.doc_id % 3 == i], preserve_index=False),
            str(src / f"b{i}.parquet"),
        )
    state = str(tmp_path / "ooo_view")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_dedup_neardup_view(
        stream, state, threshold=threshold, num_hashes=num_hashes,
        bands=bands, n=n, query_name="ooo_mv",
    )
    assert q.awaitTermination(600), "stream did not terminate"

    got = {
        r["doc_id"]: r["dup_of"]
        for r in MV.read_neardup_state(spark, state).collect()
    }
    got_dups = {d for d, w in got.items() if w is not None}
    assert got_dups <= oneshot_dups  # never a false dup
    for d, w in got.items():
        if w is not None:
            assert (d, w) in oneshot_pairs  # every verdict cites a real collision


def test_stream_dedup_neardup_state_exact_across_compaction_restart(
    spark, sf_dir, tmp_path
):
    """Round-8 verdict directive #5: the near-dup view's append-only
    delta state must read EXACTLY across a mid-stream compaction +
    restart cycle. Sequence: ingest batch 0 → compact the state
    (deltas fold into a snapshot) → restart the SAME checkpointed
    stream over batches 1-2 → final verdicts must equal the one-shot
    contiguous run, with each doc exactly once. Also pins that
    compaction carries the epoch guard forward (applied_epoch must
    survive — a replayed epoch after compaction would otherwise
    refold and duplicate state rows) and that time travel to the
    pre-compaction delta still works."""
    from data_lake_with_spark_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id")
    cuts = [0, 170, 340, len(pdf)]

    src = tmp_path / "ndc_changes"
    src.mkdir()
    state = str(tmp_path / "ndc_view")
    cp = str(tmp_path / "ndc_cp")

    def write_batch(i):
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ),
            str(src / f"b{i}.parquet"),
        )

    def run_stream(checkpoint=cp):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_dedup_neardup_view(
            stream, state, query_name="ndc_mv", checkpoint=checkpoint
        )
        assert q.awaitTermination(600), "stream did not terminate"

    # batch 0, then stop (availableNow drains what exists and exits)
    write_batch(0)
    run_stream()
    assert MV.applied_epoch(state) == 0
    v_before = V.current_version(state)

    # mid-stream compaction: deltas fold into a snapshot version
    V.compact(spark, state)
    assert V.current_version(state) == v_before + 1
    # the epoch guard survives the snapshot (the fix under test: a
    # compacted meta without epoch_id resets applied_epoch to None
    # and a post-compaction replay would refold)
    assert MV.applied_epoch(state) == 0
    # time travel to the pre-compaction delta still unions correctly
    assert MV.read_neardup_state(spark, state, version=0).count() == 170

    # restart the same checkpointed stream with two more batches
    write_batch(1)
    write_batch(2)
    run_stream()

    # exact equality with the one-shot contiguous run
    got = {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in MV.read_neardup_state(spark, state).collect()
    }
    assert len(got) == len(pdf)  # each doc exactly once — no refolds

    ws = str(tmp_path / "ndc_oneshot")
    one = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_dedup_neardup_view(one, ws, query_name="ndc_oneshot_mv")
    assert q.awaitTermination(600)
    want = {
        r["doc_id"]: (r["kept"], r["dup_of"])
        for r in MV.read_neardup_state(spark, ws).collect()
    }
    assert got == want

    # accidental reprocess AFTER compaction: a fresh checkpoint over
    # the same source replays epochs 0..2 with stale epoch ids — the
    # carried-forward guard must no-op every one (state unchanged)
    n_versions = V.current_version(state)
    run_stream(checkpoint=str(tmp_path / "ndc_cp2"))
    assert V.current_version(state) == n_versions
    assert (
        MV.read_neardup_state(spark, state).count() == len(pdf)
    )  # still exactly once


def test_stream_ivf_drift_matches_oracled_batch(spark, sf_dir, tmp_path):
    """The streaming IVF drift view (map-side codebook assignment over
    an arriving-vector stream + IVM insert folds) must derive EXACTLY
    the oracled batch query's per-cell readout
    (plans/extended_ops7.ivf_incremental_assign_drift) — streaming
    ingest and the batch index build agree cell for cell."""
    from data_lake_with_spark_spark.plans import REGISTRY
    from data_lake_with_spark_spark.streaming import jobs
    from data_lake_with_spark_spark.streaming import materialized as M

    cb = M.portable_codebook(spark, sf_dir)
    assert len(cb) == 8 and all(len(q) == 64 for _, q in cb)
    state = str(tmp_path / "ivf_drift_state")
    q = M.stream_maintain_ivf_drift_view(
        jobs.embeddings_stream(spark, sf_dir), cb, state, "t_ivf_drift"
    )
    assert q.awaitTermination(600), "stream did not terminate"
    got = {tuple(r) for r in M.read_ivf_drift(spark, state).collect()}
    want = {
        tuple(r)
        for r in REGISTRY["ivf_incremental_assign_drift"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == want and len(want) == 8


def test_ivf_assign_changes_batch_stream_identical(spark, sf_dir):
    """ivf_assign_changes is pure column math: applied to the BATCH
    frame it must reproduce the oracled query's assignment exactly
    (cell counts and distortion sums per (cell, is_new))."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.streaming import materialized as M

    cb = M.portable_codebook(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    changes = M.ivf_assign_changes(emb, cb)
    agg = {
        (r["cell"], r["is_new"]): (r["n"], int(r["sum_d"]))
        for r in changes.groupBy("cell", "is_new")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("d").alias("sum_d"))
        .collect()
    }
    assert sum(n for n, _ in agg.values()) == emb.count()
    # every vector assigned somewhere; 8 cells × 2 parities at most
    assert len(agg) <= 16 and all(c < 8 for c, _ in agg)


def test_stream_maintained_histogram_median(spark, sf_dir, tmp_path):
    """Streaming histogram→quantile view (round 12): per-bucket counts
    folded through the GENERIC stream_maintain_view (the histogram
    state is plain maintain with a bucket group and no sum cols),
    including a RETRACTION batch — deletes decrement buckets, the
    capability the bitmap/extrema states reject. Final median readout
    must equal the recompute over the surviving rows."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.ivm import read_histogram_quantile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 500").alias("bucket"),
    )
    pdf = ev.toPandas()
    cols = ["event_type", "bucket", "_change_type"]
    ins = pdf.copy()
    ins["_change_type"] = "insert"
    dels = pdf[pdf.event_id % 11 == 0].copy()
    dels["_change_type"] = "delete"

    src = tmp_path / "changes"
    src.mkdir()
    for i, batch in enumerate((ins[cols], dels[cols])):
        pq.write_table(
            pa.Table.from_pandas(batch, preserve_index=False),
            str(src / f"b{i}.parquet"),
        )
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType(), True),
            T.StructField("bucket", T.LongType(), True),
            T.StructField("_change_type", T.StringType(), True),
        ]
    )
    state = str(tmp_path / "hist_view")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_view(
        stream, state, ["event_type", "bucket"], [], query_name="hist_mv"
    )
    assert q.awaitTermination(600), "stream did not terminate"

    got = {
        (r["event_type"], r["n_rows"], r["q_bucket"])
        for r in read_histogram_quantile(
            MV.read_view(spark, state), ["event_type"], "bucket", 1, 2
        ).collect()
    }
    surviving = ev.where(F.col("event_id") % 11 != 0)
    recomputed_state = surviving.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias(ivm.N_COL)
    )
    want = {
        (r["event_type"], r["n_rows"], r["q_bucket"])
        for r in read_histogram_quantile(
            recomputed_state, ["event_type"], "bucket", 1, 2
        ).collect()
    }
    assert got == want and len(got) > 0


TKR_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType(), True),
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.LongType(), True),
        T.StructField("_change_type", T.StringType(), True),
    ]
)


def _write_tkr(path, rows):
    pdf = pd.DataFrame(rows, columns=["g", "id", "v", "_change_type"])
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    import os

    _WRITE_SEQ[0] += 10
    os.utime(path, (_WRITE_SEQ[0], _WRITE_SEQ[0]))


def test_stream_topk_retractable_matches_bruteforce(spark, tmp_path):
    """Streaming form of the retractable top-k fold (round-12 verdict
    directive #3): a 3-micro-batch feed carrying inserts, a
    value-LOWERING update of a RESIDENT id and a delete of a RESIDENT
    id — both moves the plain topk view refuses — must leave the state
    equal to the brute-force top-k over the surviving rows, with the
    (k+1)-th pulled back up by the bounded base rescan. Also pins the
    maintained BASE table (merge-on-read) to exactly the live rows."""
    src = tmp_path / "tkr_changes"
    src.mkdir()
    state = str(tmp_path / "tkr_view")
    base = str(tmp_path / "tkr_base")
    # batch 1: 4 inserts in one group — top-2 after: (i3 v=40, i2 v=30)
    _write_tkr(str(src / "b1.parquet"), [
        ("a", 1, 10, "insert"),
        ("a", 2, 30, "insert"),
        ("a", 3, 40, "insert"),
        ("a", 4, 20, "insert"),
    ])
    # batch 2: LOWER the resident max i3 40 -> 5 (state must pull i4
    # back up), plus an unrelated group's insert (fast path)
    _write_tkr(str(src / "b2.parquet"), [
        ("a", 3, 40, "update_preimage"),
        ("a", 3, 5, "update_postimage"),
        ("b", 9, 7, "insert"),
    ])
    # batch 3: DELETE the new resident max i2 (i1 must come back)
    _write_tkr(str(src / "b3.parquet"), [
        ("a", 2, 30, "delete"),
    ])
    stream = (
        spark.readStream.schema(TKR_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_topk_retractable_view(
        stream, state, base, ["g"], "v", "id", k=2,
        query_name="tkr_mv", checkpoint=str(tmp_path / "tkr_ckpt"),
    )
    assert q.awaitTermination(600), "stream did not terminate"
    got = {
        (r["g"], r["id"], r["v"]) for r in MV.read_view(spark, state).collect()
    }
    # survivors: a -> {1:10, 3:5, 4:20}; b -> {9:7}
    assert got == {("a", 4, 20), ("a", 1, 10), ("b", 9, 7)}
    live = {
        (r["g"], r["id"], r["v"])
        for r in V.versioned_read_merged(
            spark, base, keys=["g", "id"]
        ).select("g", "id", "v").collect()
    }
    assert live == {("a", 1, 10), ("a", 3, 5), ("a", 4, 20), ("b", 9, 7)}
    # one committed state version per micro-batch (exactly-once epochs)
    assert V.current_version(state) == 2


def test_stream_topk_retractable_rejects_upsert_delete_same_key(spark, tmp_path):
    """A key arriving as BOTH upsert and delete in one micro-batch has
    no well-defined net effect at the sink (intra-batch order is
    unknowable) — the view must fail the batch loudly, not guess."""
    src = tmp_path / "tkc2_changes"
    src.mkdir()
    _write_tkr(str(src / "b1.parquet"), [
        ("a", 1, 10, "insert"),
        ("a", 1, 10, "delete"),
    ])
    stream = spark.readStream.schema(TKR_SCHEMA).parquet(str(src))
    q = MV.stream_maintain_topk_retractable_view(
        stream, str(tmp_path / "tkc2_view"), str(tmp_path / "tkc2_base"),
        ["g"], "v", "id", k=2, query_name="tkc2_mv",
    )
    with pytest.raises(Exception, match="both upsert and delete"):
        q.awaitTermination(600)


def test_stream_topk_retractable_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-resume for the retractable view's TWO-table commit
    (base merge-on-read + state): a checkpointed run resumed after new
    changes arrive folds ONLY the new micro-batch (epoch guard on the
    state commit, which happens last), the base stays consistent, and
    the final state equals the uninterrupted brute force."""
    src = tmp_path / "tkrr_changes"
    src.mkdir()
    state = str(tmp_path / "tkrr_view")
    base = str(tmp_path / "tkrr_base")
    ckpt = str(tmp_path / "tkrr_ckpt")
    _write_tkr(str(src / "b1.parquet"), [
        ("a", 1, 10, "insert"),
        ("a", 2, 30, "insert"),
        ("a", 3, 40, "insert"),
    ])

    def run():
        stream = (
            spark.readStream.schema(TKR_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_topk_retractable_view(
            stream, state, base, ["g"], "v", "id", k=2,
            query_name="tkrr_mv", checkpoint=ckpt,
        )
        assert q.awaitTermination(600), "stream did not terminate"

    run()
    v1 = V.current_version(state)
    # "crash"; then a delete of the resident max arrives; resume
    _write_tkr(str(src / "b2.parquet"), [("a", 3, 40, "delete")])
    run()
    assert V.current_version(state) == v1 + 1  # exactly one new fold
    got = {
        (r["g"], r["id"], r["v"]) for r in MV.read_view(spark, state).collect()
    }
    assert got == {("a", 2, 30), ("a", 1, 10)}  # i1 pulled back up
    # idle resume: no new files -> no new state version
    run()
    assert V.current_version(state) == v1 + 1


def test_stream_topk_retractable_rejects_unknown_change_type(spark, tmp_path):
    """The sink cannot reconstruct base semantics from an unknown
    change type — the micro-batch must fail loudly (in-plan raise,
    before the atomic base commit), never silently drop the row."""
    src = tmp_path / "tku2_changes"
    src.mkdir()
    _write_tkr(str(src / "b1.parquet"), [("a", 1, 10, "upsert")])
    stream = spark.readStream.schema(TKR_SCHEMA).parquet(str(src))
    q = MV.stream_maintain_topk_retractable_view(
        stream, str(tmp_path / "tku2_view"), str(tmp_path / "tku2_base"),
        ["g"], "v", "id", k=2, query_name="tku2_mv",
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        q.awaitTermination(600)


# ---------------------------------------------------------------------------
# Streaming maintained MinHash band index (round-13 verdict directive #4)
# ---------------------------------------------------------------------------

MHIX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# texts with exact and near duplicates across batches: pairs must span
# batch boundaries so "discovered in the later-arriving side's batch"
# is exercised, plus one intra-batch pair
MHIX_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated sentence about streaming analytics engines"),
    (3, "the quick brown fox jumps over the lazy dog tonight"),   # dup of 1
    (4, "the quick brown fox jumps over the lazy cat tonight"),   # near 1/3
    (5, "another entirely different document mentioning parquet files"),
    (6, "the quick brown fox jumps over the lazy dog tonight"),   # dup of 1/3
    (7, "completely unrelated sentence about streaming analytics engines"),  # dup of 2
]


def _write_mhix(path: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _mhix_oneshot(spark):
    """The one-shot portable pair list over the whole corpus: the
    maintained index probed with everything as a single batch."""
    from data_lake_with_spark_spark.operators import ingest as ING
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    docs = spark.createDataFrame(MHIX_DOCS, MHIX_SCHEMA)
    return {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in ING.minhash_index_new_pairs(
            None, _mh_portable_sigs(docs), MINHASH_BANDS, MINHASH_ROWS, 0.5
        ).collect()
    }


def test_stream_minhash_index_newpairs_equals_oneshot(spark, tmp_path):
    """Per-micro-batch new-pair deltas over a 3-way arrival split must
    union to the one-shot portable pair list (the batch operator's
    driver-oracled equivalence, streamed), each pair exactly once."""
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    src = tmp_path / "mhix_docs"
    src.mkdir()
    _write_mhix(str(src / "b1.parquet"), MHIX_DOCS[:3])   # pair (1,3) intra+cross
    _write_mhix(str(src / "b2.parquet"), MHIX_DOCS[3:5])  # 4 nears 1 and 3
    _write_mhix(str(src / "b3.parquet"), MHIX_DOCS[5:])   # 6 dups 1/3; 7 dups 2
    sigs = str(tmp_path / "mhix_sigs")
    pairs = str(tmp_path / "mhix_pairs")
    stream = (
        spark.readStream.schema(MHIX_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_minhash_index_view(
        stream, sigs, pairs, _mh_portable_sigs, MINHASH_BANDS, MINHASH_ROWS,
        threshold=0.5, query_name="mhix_mv",
        checkpoint=str(tmp_path / "mhix_ckpt"),
    )
    assert q.awaitTermination(600), "stream did not terminate"
    rows = MV.read_minhash_index_pairs(spark, pairs).collect()
    got = {(r["a_id"], r["b_id"], r["jaccard"]) for r in rows}
    expect = _mhix_oneshot(spark)
    assert got == expect and len(expect) >= 4
    # each pair exactly once across all deltas (no replays, no dupes)
    assert len(rows) == len(got)
    # one pairs version per micro-batch; sigs state holds every signed doc
    assert V.current_version(pairs) == 2
    absorbed = {
        r["doc_id"] for r in MV.read_minhash_index_sigs(spark, sigs).collect()
    }
    assert absorbed == {d for d, _ in MHIX_DOCS}


def test_stream_minhash_index_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-resume across the TWO-table commit: a resumed run
    folds only the new micro-batch (epoch guard on the pairs commit),
    emits the cross-boundary pairs exactly once, and an idle resume
    commits nothing."""
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    src = tmp_path / "mhixr_docs"
    src.mkdir()
    sigs = str(tmp_path / "mhixr_sigs")
    pairs = str(tmp_path / "mhixr_pairs")
    ckpt = str(tmp_path / "mhixr_ckpt")
    _write_mhix(str(src / "b1.parquet"), MHIX_DOCS[:5])

    def run():
        stream = (
            spark.readStream.schema(MHIX_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_minhash_index_view(
            stream, sigs, pairs, _mh_portable_sigs, MINHASH_BANDS,
            MINHASH_ROWS, threshold=0.5, query_name="mhixr_mv",
            checkpoint=ckpt,
        )
        assert q.awaitTermination(600), "stream did not terminate"

    run()
    v1 = V.current_version(pairs)
    # "crash"; late arrivals near-dup docs from the FIRST run; resume
    _write_mhix(str(src / "b2.parquet"), MHIX_DOCS[5:])
    run()
    assert V.current_version(pairs) == v1 + 1  # exactly one new delta
    got = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in MV.read_minhash_index_pairs(spark, pairs).collect()
    }
    assert got == _mhix_oneshot(spark)
    # idle resume: no new files -> no new version on either table
    run()
    assert V.current_version(pairs) == v1 + 1


def test_stream_minhash_index_replay_after_partial_commit(spark, tmp_path):
    """Crash BETWEEN the two commits: the sigs delta landed but the
    pairs commit did not, so the replayed micro-batch finds its own
    docs already in the signature state. The sink must (a) anti-join
    them out of the probe state so the re-emitted pair delta is
    identical, and (b) skip the sigs double-append via that table's
    own epoch meta — each doc signed once, each pair emitted once."""
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    src = tmp_path / "mhixp_docs"
    src.mkdir()
    sigs = str(tmp_path / "mhixp_sigs")
    pairs = str(tmp_path / "mhixp_pairs")
    ckpt = str(tmp_path / "mhixp_ckpt")
    _write_mhix(str(src / "b1.parquet"), MHIX_DOCS[:5])

    def run():
        stream = (
            spark.readStream.schema(MHIX_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_minhash_index_view(
            stream, sigs, pairs, _mh_portable_sigs, MINHASH_BANDS,
            MINHASH_ROWS, threshold=0.5, query_name="mhixp_mv",
            checkpoint=ckpt,
        )
        assert q.awaitTermination(600), "stream did not terminate"

    run()  # epoch 0 fully committed
    # simulate the torn epoch-1 sink: sigs committed, pairs NOT
    _write_mhix(str(src / "b2.parquet"), MHIX_DOCS[5:])
    batch2 = spark.createDataFrame(MHIX_DOCS[5:], MHIX_SCHEMA)
    V.versioned_append(_mh_portable_sigs(batch2), sigs, meta={"epoch_id": 1})
    assert MV.applied_epoch(sigs) == 1 and MV.applied_epoch(pairs) == 0
    run()  # replayed epoch 1
    got_rows = MV.read_minhash_index_pairs(spark, pairs).collect()
    got = {(r["a_id"], r["b_id"], r["jaccard"]) for r in got_rows}
    assert got == _mhix_oneshot(spark)
    assert len(got_rows) == len(got)  # no duplicated pair rows
    sig_rows = MV.read_minhash_index_sigs(spark, sigs).collect()
    assert len(sig_rows) == len({r["doc_id"] for r in sig_rows})  # once each


# ---------------------------------------------------------------------------
# Streaming windowed (epoch-expiring) distinct views
# ---------------------------------------------------------------------------

WD_SCHEMA = T.StructType(
    [
        T.StructField("g", T.LongType(), True),
        T.StructField("i", T.LongType(), True),
        T.StructField("bucket", T.LongType(), True),
        T.StructField("_change_type", T.StringType(), True),
    ]
)

# 3 micro-batches of advancing buckets with horizon 2: buckets 0-1
# retire when the watermark reaches 3; batch 3 replays a bucket-3 row
# (idempotent) and delivers a bucket-0 row now beyond the horizon
# (dropped on arrival). Live window at the end: buckets {3, 4}.
WD_BATCHES = [
    [(0, 1, 0, "insert"), (0, 2, 1, "insert"), (1, 9, 1, "insert")],
    [(0, 2, 2, "insert"), (0, 3, 3, "insert"), (1, 9, 3, "insert")],
    [(0, 4, 4, "insert"), (0, 3, 3, "insert"), (0, 1, 0, "insert")],
]
WD_LIVE = [(0, 3), (0, 4), (1, 9)]  # (g, i) with bucket > 4 - 2


def _write_wd(path: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows], pa.int64()),
                "i": pa.array([r[1] for r in rows], pa.int64()),
                "bucket": pa.array([r[2] for r in rows], pa.int64()),
                "_change_type": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        path,
    )


def test_stream_windowed_distinct_views_match_batch(spark, tmp_path):
    """All three windowed families streamed over the 3-batch feed end
    in the same state as the batch folds (and for bitmap, the exact
    live distinct): expiry fires mid-stream, the replay is a no-op,
    and the beyond-horizon late row is dropped on arrival."""
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    src = tmp_path / "wd_changes"
    src.mkdir()
    for n, rows in enumerate(WD_BATCHES):
        _write_wd(str(src / f"b{n}.parquet"), rows)

    got = {}
    for family in MV.WINDOWED_DISTINCT_FAMILIES:
        state = str(tmp_path / f"wd_{family}")
        stream = (
            spark.readStream.schema(WD_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_windowed_distinct_view(
            stream, state, ["g"], "i", "bucket", horizon=2, family=family,
            k=2, query_name=f"wd_{family}_mv",
            checkpoint=str(tmp_path / f"wd_{family}_ckpt"),
        )
        assert q.awaitTermination(600), "stream did not terminate"
        assert V.current_version(state) == 2  # one version per batch
        got[family] = MV.read_view(spark, state)

    live_df = spark.createDataFrame(
        [(g, i, "insert") for g, i in WD_LIVE], "g long, i long, _change_type string"
    )
    try:
        bm = {
            (r["g"], r["n_distinct"])
            for r in ivm.read_bitmap_windowed_distinct(got["bitmap"], ["g"]).collect()
        }
        assert bm == {(0, 2), (1, 1)}
        kmv_got = {
            (r["g"], r["est_distinct"])
            for r in ivm.read_kmv_windowed_distinct(got["kmv"], ["g"], k=2).collect()
        }
        kmv_want = {
            (r["g"], r["est_distinct"])
            for r in ivm.read_kmv_distinct(
                ivm.maintain_kmv(None, live_df, ["g"], "i", k=2), ["g"], k=2
            ).collect()
        }
        assert kmv_got == kmv_want
        hll_got = {
            (r["g"], r["users_est"])
            for r in ivm.read_hll_windowed_distinct(got["hll"], ["g"]).collect()
        }
        hll_want = {
            (r["g"], r["users_est"])
            for r in ivm.read_hll_distinct(
                ivm.maintain_hll(None, live_df, ["g"], "i"), ["g"]
            ).collect()
        }
        assert hll_got == hll_want
    finally:
        release_shared_caches()


def test_stream_windowed_distinct_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: a resumed windowed view folds only the new
    micro-batch (epoch guard), expiry still fires on the new
    watermark, and an idle resume commits nothing."""
    src = tmp_path / "wdr_changes"
    src.mkdir()
    state = str(tmp_path / "wdr_view")
    ckpt = str(tmp_path / "wdr_ckpt")
    _write_wd(str(src / "b0.parquet"), WD_BATCHES[0])
    _write_wd(str(src / "b1.parquet"), WD_BATCHES[1])

    def run():
        stream = (
            spark.readStream.schema(WD_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_windowed_distinct_view(
            stream, state, ["g"], "i", "bucket", horizon=2, family="bitmap",
            query_name="wdr_mv", checkpoint=ckpt,
        )
        assert q.awaitTermination(600), "stream did not terminate"

    run()
    v1 = V.current_version(state)
    _write_wd(str(src / "b2.parquet"), WD_BATCHES[2])
    run()
    assert V.current_version(state) == v1 + 1  # exactly one new fold
    got = {
        (r["g"], r["n_distinct"])
        for r in ivm.read_bitmap_windowed_distinct(
            MV.read_view(spark, state), ["g"]
        ).collect()
    }
    assert got == {(0, 2), (1, 1)}
    run()  # idle resume
    assert V.current_version(state) == v1 + 1


def test_stream_windowed_distinct_rejects_unknown_family(spark, tmp_path):
    import pytest

    stream = spark.readStream.schema(WD_SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="family"):
        MV.stream_maintain_windowed_distinct_view(
            stream, str(tmp_path / "x"), ["g"], "i", "bucket", 2, family="bloom"
        )


# ---------------------------------------------------------------------------
# Streaming maintained connected components (stream_maintain_cc_view)
# ---------------------------------------------------------------------------

CC_SCHEMA = "a_id bigint, b_id bigint"
# Three arrival batches engineered so every refresh exercises a
# different absorb path: b1 seeds two components; b2 merges them
# through a bridging edge AND starts a disjoint pair; b3 re-delivers a
# known edge (no-op) while a NEW MINIMUM node (0) relabels {8,9}.
CC_B1 = [(1, 2), (5, 6)]
CC_B2 = [(2, 5), (8, 9)]
CC_B3 = [(0, 9), (1, 2)]


def _write_cc_edges(path: str, rows, order: int = 0) -> None:
    import os
    import time

    pq.write_table(
        pa.table(
            {
                "a_id": pa.array([r[0] for r in rows], pa.int64()),
                "b_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )
    # FileStreamSource orders micro-batches by modification time —
    # same-instant writes arrive in arbitrary order, so pin distinct
    # mtimes to make the per-batch delta sizes deterministic.
    t = time.time() - 1000 + order
    os.utime(path, (t, t))


def _cc_oneshot(spark, batches):
    from data_lake_with_spark_spark.operators import graph as G

    edges = [e for b in batches for e in b]
    return {
        (r["id"], r["lab"])
        for r in G.min_label_components(
            spark.createDataFrame(edges, CC_SCHEMA)
        ).collect()
    }


def test_stream_cc_labels_equal_oneshot_with_bounded_deltas(spark, tmp_path):
    """The resolved label table after a 3-batch arrival split must
    equal the one-shot min-label fixpoint over every edge, and each
    refresh must commit ONLY changed/new rows (the O(changed) merge-
    on-read contract): 4, 4, 3 rows for this fixture, never the
    whole assignment."""
    src = tmp_path / "cc_edges"
    src.mkdir()
    _write_cc_edges(str(src / "b1.parquet"), CC_B1, order=0)
    _write_cc_edges(str(src / "b2.parquet"), CC_B2, order=1)
    _write_cc_edges(str(src / "b3.parquet"), CC_B3, order=2)
    labels = str(tmp_path / "cc_labels")
    stream = (
        spark.readStream.schema(CC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_cc_view(
        stream, labels, query_name="cc_mv",
        checkpoint=str(tmp_path / "cc_ckpt"),
    )
    assert q.awaitTermination(600), "stream did not terminate"
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert got == _cc_oneshot(spark, [CC_B1, CC_B2, CC_B3])
    assert got == {(0, 0), (8, 0), (9, 0), (1, 1), (2, 1), (5, 1), (6, 1)}
    # one version per micro-batch, each committing only the delta
    assert V.current_version(labels) == 2
    delta_rows = [
        spark.read.parquet(V.versioned_snapshot_dir(labels, v)).count()
        for v in range(3)
    ]
    assert delta_rows == [4, 4, 3]


def test_stream_cc_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-resume: a resumed run folds only the new micro-batch
    (epoch guard), and an idle resume commits nothing."""
    src = tmp_path / "ccr_edges"
    src.mkdir()
    _write_cc_edges(str(src / "b1.parquet"), CC_B1, order=0)
    _write_cc_edges(str(src / "b2.parquet"), CC_B2, order=1)
    labels = str(tmp_path / "ccr_labels")
    ckpt = str(tmp_path / "ccr_ckpt")

    def run():
        stream = (
            spark.readStream.schema(CC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = MV.stream_maintain_cc_view(
            stream, labels, query_name="ccr_mv", checkpoint=ckpt
        )
        assert q.awaitTermination(600), "stream did not terminate"

    run()
    assert V.current_version(labels) == 1
    mid = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert mid == _cc_oneshot(spark, [CC_B1, CC_B2])
    _write_cc_edges(str(src / "b3.parquet"), CC_B3, order=2)
    run()
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert got == _cc_oneshot(spark, [CC_B1, CC_B2, CC_B3])
    assert V.current_version(labels) == 2
    run()  # idle resume: no new files, no new commits
    assert V.current_version(labels) == 2


def test_stream_minhash_pairs_chain_into_cc_absorb(spark, tmp_path):
    """The composed maintained dedup loop across BOTH state tables:
    the streaming MinHash index's per-batch pair deltas, folded
    version by version into cc_incremental_absorb, must land on the
    same components as one-shot CC over the one-shot pair list —
    i.e. the two maintained halves compose without re-pairing or
    re-flooding anything."""
    from data_lake_with_spark_spark.operators import graph as G
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    src = tmp_path / "chain_docs"
    src.mkdir()
    _write_mhix(str(src / "b1.parquet"), MHIX_DOCS[:3])
    _write_mhix(str(src / "b2.parquet"), MHIX_DOCS[3:5])
    _write_mhix(str(src / "b3.parquet"), MHIX_DOCS[5:])
    sigs = str(tmp_path / "chain_sigs")
    pairs = str(tmp_path / "chain_pairs")
    stream = (
        spark.readStream.schema(MHIX_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_minhash_index_view(
        stream, sigs, pairs, _mh_portable_sigs, MINHASH_BANDS, MINHASH_ROWS,
        threshold=0.5, query_name="chain_mv",
        checkpoint=str(tmp_path / "chain_ckpt"),
    )
    assert q.awaitTermination(600), "stream did not terminate"
    state = None
    for v in range(V.current_version(pairs) + 1):
        delta = spark.read.parquet(V.versioned_snapshot_dir(pairs, v)).select(
            "a_id", "b_id"
        )
        if delta.isEmpty():
            continue
        state = G.cc_incremental_absorb(state, delta)
    got = {(r["id"], r["lab"]) for r in state.collect()}
    oneshot_pairs = [(a, b) for a, b, _ in _mhix_oneshot(spark)]
    want = {
        (r["id"], r["lab"])
        for r in G.min_label_components(
            spark.createDataFrame(oneshot_pairs, CC_SCHEMA)
        ).collect()
    }
    assert got == want and len(want) >= 4


# ---------------------------------------------------------------------------
# Streaming CC with retraction (stream_maintain_cc_cdc_view)
# ---------------------------------------------------------------------------

CCC_SCHEMA = T.StructType(
    [
        T.StructField("a_id", T.LongType(), True),
        T.StructField("b_id", T.LongType(), True),
        T.StructField("_change_type", T.StringType(), True),
    ]
)
# B1 builds a 4-path and a pair; B2 SPLITS the path (the change the
# insert-only view cannot express) and starts a new pair; B3 deletes a
# whole component (both endpoints must tombstone out) and RE-INSERTS
# the previously deleted edge (reconnecting through tombstoned-then-
# revived label rows).
CCC_B1 = [(1, 2, "insert"), (2, 3, "insert"), (3, 4, "insert"), (10, 11, "insert")]
CCC_B2 = [(2, 3, "delete"), (20, 21, "insert")]
CCC_B3 = [(10, 11, "delete"), (2, 3, "insert")]
CCC_FINAL = {(1, 1), (2, 1), (3, 1), (4, 1), (20, 20), (21, 20)}


def _write_ccc(path: str, rows, order: int = 0) -> None:
    import os
    import time

    pq.write_table(
        pa.table(
            {
                "a_id": pa.array([r[0] for r in rows], pa.int64()),
                "b_id": pa.array([r[1] for r in rows], pa.int64()),
                "_change_type": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        path,
    )
    t = time.time() - 1000 + order
    os.utime(path, (t, t))


def _run_ccc(spark, src, edges, labels, ckpt, name):
    stream = (
        spark.readStream.schema(CCC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = MV.stream_maintain_cc_cdc_view(
        stream, edges, labels, query_name=name, checkpoint=ckpt
    )
    assert q.awaitTermination(600), "stream did not terminate"


def test_stream_cc_cdc_labels_equal_oneshot_over_survivors(spark, tmp_path):
    from data_lake_with_spark_spark.operators import graph as G

    src = tmp_path / "ccc_feed"
    src.mkdir()
    _write_ccc(str(src / "b1.parquet"), CCC_B1, order=0)
    _write_ccc(str(src / "b2.parquet"), CCC_B2, order=1)
    _write_ccc(str(src / "b3.parquet"), CCC_B3, order=2)
    edges = str(tmp_path / "ccc_edges")
    labels = str(tmp_path / "ccc_labels")
    _run_ccc(spark, src, edges, labels, str(tmp_path / "ccc_ckpt"), "ccc_mv")
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert got == CCC_FINAL
    # the resolved edge table is exactly the surviving edge set
    surv = {
        (r["a_id"], r["b_id"])
        for r in V.versioned_read_merged(spark, edges, ["a_id", "b_id"]).collect()
    }
    assert surv == {(1, 2), (2, 3), (3, 4), (20, 21)}
    # and the label table equals one-shot CC over it
    want = {
        (r["id"], r["lab"])
        for r in G.min_label_components(
            spark.createDataFrame(sorted(surv), "a_id bigint, b_id bigint")
        ).collect()
    }
    assert got == want


def test_stream_cc_cdc_restart_from_checkpoint(spark, tmp_path):
    src = tmp_path / "cccr_feed"
    src.mkdir()
    _write_ccc(str(src / "b1.parquet"), CCC_B1, order=0)
    edges = str(tmp_path / "cccr_edges")
    labels = str(tmp_path / "cccr_labels")
    ckpt = str(tmp_path / "cccr_ckpt")
    _run_ccc(spark, src, edges, labels, ckpt, "cccr_mv")
    mid = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert mid == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    _write_ccc(str(src / "b2.parquet"), CCC_B2, order=1)
    _write_ccc(str(src / "b3.parquet"), CCC_B3, order=2)
    _run_ccc(spark, src, edges, labels, ckpt, "cccr_mv")
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert got == CCC_FINAL
    v = V.current_version(labels)
    _run_ccc(spark, src, edges, labels, ckpt, "cccr_mv")  # idle resume
    assert V.current_version(labels) == v


def test_stream_cc_cdc_replay_after_partial_commit(spark, tmp_path):
    """Crash BETWEEN the edges commit and the labels commit: the
    replayed micro-batch finds its epoch already on the edge table, so
    it must read the edge state one version BACK (the exact pre-batch
    set), skip the edges double-append, and emit the identical label
    delta."""
    from pyspark.sql import functions as F
    from data_lake_with_spark_spark.sources.versioned import TOMBSTONE

    src = tmp_path / "cccp_feed"
    src.mkdir()
    edges = str(tmp_path / "cccp_edges")
    labels = str(tmp_path / "cccp_labels")
    ckpt = str(tmp_path / "cccp_ckpt")
    _write_ccc(str(src / "b1.parquet"), CCC_B1, order=0)
    _run_ccc(spark, src, edges, labels, ckpt, "cccp_mv")  # epoch 0 done
    # simulate the torn epoch-1 sink: edges committed, labels NOT
    torn = spark.createDataFrame(
        [(20, 21, False), (2, 3, True)], f"a_id bigint, b_id bigint, {TOMBSTONE} boolean"
    )
    V.versioned_append(torn, edges, meta={"epoch_id": 1})
    assert MV.applied_epoch(edges) == 1 and MV.applied_epoch(labels) == 0
    _write_ccc(str(src / "b2.parquet"), CCC_B2, order=1)
    _run_ccc(spark, src, edges, labels, ckpt, "cccp_mv")  # replayed epoch 1
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 3), (4, 3), (10, 10), (11, 10), (20, 20), (21, 20)}
    # no edges double-append: exactly versions 0 and 1
    assert V.current_version(edges) == 1
    surv = {
        (r["a_id"], r["b_id"])
        for r in V.versioned_read_merged(spark, edges, ["a_id", "b_id"]).collect()
    }
    assert surv == {(1, 2), (3, 4), (10, 11), (20, 21)}


def test_stream_cc_cdc_rejects_unknown_change_type(spark, tmp_path):
    src = tmp_path / "cccu_feed"
    src.mkdir()
    _write_ccc(str(src / "b1.parquet"), [(1, 2, "update")], order=0)
    stream = spark.readStream.schema(CCC_SCHEMA).parquet(str(src))
    q = MV.stream_maintain_cc_cdc_view(
        stream, str(tmp_path / "cccu_edges"), str(tmp_path / "cccu_labels"),
        query_name="cccu_mv",
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        q.awaitTermination(600)


def test_stream_cc_cdc_rejects_intra_batch_insert_delete(spark, tmp_path):
    src = tmp_path / "ccci_feed"
    src.mkdir()
    _write_ccc(
        str(src / "b1.parquet"),
        [(1, 2, "insert"), (1, 2, "delete")],
        order=0,
    )
    stream = spark.readStream.schema(CCC_SCHEMA).parquet(str(src))
    q = MV.stream_maintain_cc_cdc_view(
        stream, str(tmp_path / "ccci_edges"), str(tmp_path / "ccci_labels"),
        query_name="ccci_mv",
    )
    with pytest.raises(Exception, match="both insert and delete"):
        q.awaitTermination(600)


@pytest.mark.parametrize("seed", [7, 23, 41])
def test_stream_cc_cdc_random_feed_matches_oneshot(spark, tmp_path, seed):
    """Seeded random insert/delete feeds through the REAL sink path
    (random micro-batch splits, deletes only of currently-alive edges,
    re-inserts of previously deleted ones): the resolved label table
    must equal one-shot CC over the surviving edge set, and the
    resolved edge table must equal the model's surviving set."""
    import random

    from data_lake_with_spark_spark.operators import graph as G

    rng = random.Random(seed)
    alive: set = set()
    batches = []
    for _ in range(3):
        rows = []
        touched: set = set()  # sink contract: one net change per edge per batch
        for _ in range(rng.randint(2, 5)):
            deletable = sorted(alive - touched)
            if deletable and rng.random() < 0.35:
                e = rng.choice(deletable)
                rows.append((e[0], e[1], "delete"))
                alive.discard(e)
                touched.add(e)
            else:
                a, b = rng.sample(range(10), 2)
                e = (min(a, b), max(a, b))
                if e in touched or e in alive:
                    continue
                rows.append((e[0], e[1], "insert"))
                alive.add(e)
                touched.add(e)
        if rows:
            batches.append(rows)
    src = tmp_path / f"cccf{seed}_feed"
    src.mkdir()
    for i, rows in enumerate(batches):
        _write_ccc(str(src / f"b{i}.parquet"), rows, order=i)
    edges = str(tmp_path / f"cccf{seed}_edges")
    labels = str(tmp_path / f"cccf{seed}_labels")
    _run_ccc(
        spark, src, edges, labels, str(tmp_path / f"cccf{seed}_ckpt"),
        f"cccf{seed}_mv",
    )
    surv = {
        (r["a_id"], r["b_id"])
        for r in V.versioned_read_merged(spark, edges, ["a_id", "b_id"]).collect()
    }
    assert surv == alive
    got = {
        (r["id"], r["lab"]) for r in MV.read_cc_labels(spark, labels).collect()
    }
    if alive:
        want = {
            (r["id"], r["lab"])
            for r in G.min_label_components(
                spark.createDataFrame(sorted(alive), "a_id bigint, b_id bigint")
            ).collect()
        }
    else:
        want = set()
    assert got == want
