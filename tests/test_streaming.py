"""Streaming jobs: batch↔streaming differential tests (SURVEY §7.3) —
the streaming plan over a finite replay must equal the batch window
plan on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.plans import REGISTRY
from data_lake_with_spark_spark.streaming import jobs


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    return jobs.events_stream(spark, sf_dir)


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_tumbling_matches_batch(spark, sf_dir, stream):
    out = jobs.run_to_completion(
        jobs.tumbling_counts(stream), "t_tumbling", mode="complete"
    )
    batch = REGISTRY["window_tumbling_hourly"].spark(spark, sf_dir)
    assert _sorted_rows(out, "window_start", "event_type") == _sorted_rows(
        batch, "window_start", "event_type"
    )


def test_session_matches_batch(spark, sf_dir, stream):
    out = jobs.run_to_completion(
        jobs.session_aggregate(stream), "t_session", mode="complete"
    )
    batch = REGISTRY["window_session_5min"].spark(spark, sf_dir)
    assert _sorted_rows(out, "user_id", "session_start") == _sorted_rows(
        batch, "user_id", "session_start"
    )


def test_stream_static_enrichment_matches_batch(spark, sf_dir, stream):
    """Stream-static dim join == the same join in batch, including
    pass-through of events with no dim match (left semantics)."""
    from data_lake_with_spark_spark.catalog import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    out = jobs.run_to_completion(
        jobs.enrich_stream_with_dim(stream, dim, "user_id", "c_custkey"),
        "t_enrich",
    ).select("event_id", "user_id", "c_name")
    batch = (
        load_table(spark, sf_dir, "events")
        .join(
            dim.withColumnRenamed("c_custkey", "user_id"), "user_id", "left"
        )
        .select("event_id", "user_id", "c_name")
    )
    assert _sorted_rows(out, "event_id") == _sorted_rows(batch, "event_id")
    assert out.where(F.col("c_name").isNull()).count() == batch.where(
        F.col("c_name").isNull()
    ).count()


def test_streaming_dedup_unique_ids(spark, sf_dir, stream):
    out = jobs.run_to_completion(jobs.streaming_dedup(stream), "t_dedup")
    n = out.count()
    assert n == out.select("event_id").distinct().count()
    batch_n = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").distinct().count()
    )
    assert n == batch_n


def test_stateful_running_totals(spark, sf_dir, stream):
    out = jobs.run_to_completion(
        jobs.running_user_totals(stream), "t_totals", mode="update"
    )
    # final state per user (memory sink in update mode appends each
    # emission; take the last per user = final totals)
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert _sorted_rows(final, "user_id") == _sorted_rows(batch, "user_id")


def test_stream_into_lake_exactly_once(spark, sf_dir, tmp_path):
    from data_lake_with_spark_spark.sources.versioned import versioned_read

    path = str(tmp_path / "lake_events")
    stream = jobs.events_stream(spark, sf_dir)
    q = jobs.stream_into_lake(stream, path, keys=["event_id"], query_name="lake1")
    assert q.awaitTermination(600), 'stream did not terminate'
    table = versioned_read(spark, path)
    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").distinct().count()
    )
    assert table.count() == n_distinct
    # replaying the whole stream into the same lake appends nothing
    q2 = jobs.stream_into_lake(
        jobs.events_stream(spark, sf_dir), path, keys=["event_id"], query_name="lake2"
    )
    assert q2.awaitTermination(600), 'stream did not terminate'
    assert versioned_read(spark, path).count() == n_distinct


def test_streaming_dedup_within_watermark(spark, sf_dir):
    out = jobs.run_to_completion(
        jobs.streaming_dedup_within_watermark(jobs.events_stream(spark, sf_dir)),
        "t_dedup_wm",
    )
    n = out.count()
    assert n == out.select("event_id").distinct().count()


def test_stream_rollup_lake_matches_batch(spark, sf_dir, tmp_path):
    """The continuously-merged rollup table must equal the batch
    hourly aggregate exactly (decimal sums: no float drift)."""
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.sources import versioned as V

    path = str(tmp_path / "rollup_lake")
    stream = jobs.events_stream(spark, sf_dir)
    q = jobs.stream_rollup_into_lake(jobs.hourly_rollup(stream), path, "rollup1")
    assert q.awaitTermination(600), 'stream did not terminate'
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_dec"])
        for r in V.versioned_read_merged(spark, path, ["hour", "event_type"]).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_dec"])
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_dec"),
        )
        .collect()
    }
    assert got == want


def test_stateful_running_totals_tws(spark, sf_dir):
    """transformWithStateInPandas twin of running_user_totals: same
    final per-user counts as the batch aggregate. Needs the RocksDB
    state store provider — set for this query's session, restored
    after — and protobuf for the state-server protocol (absent in this
    container → skip; the operator itself is exercised wherever
    protobuf exists)."""
    pytest.importorskip("google.protobuf")
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = jobs.events_stream(spark, sf_dir)
        out = jobs.run_to_completion(
            jobs.running_user_totals_tws(stream), "t_totals_tws", mode="update"
        )
        final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        assert _sorted_rows(final, "user_id") == _sorted_rows(batch, "user_id")
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_streaming_ohlc_matches_batch(spark, sf_dir, stream):
    """Candlesticks are pure hash-agg accumulators: the streaming
    hourly OHLC replay must equal the batch query bar for bar."""
    out = jobs.run_to_completion(
        jobs.ohlc_bars(stream), "t_ohlc", mode="complete"
    )
    batch = (
        REGISTRY["finance_ohlc_hourly"]
        .spark(spark, sf_dir)
        .select(
            F.col("bar"),
            "event_type",
            "open_mu",
            "high_mu",
            "low_mu",
            "close_mu",
            "n_ticks",
        )
    )
    assert _sorted_rows(out, "event_type", "bar") == _sorted_rows(
        batch, "event_type", "bar"
    )


def _batch_sessions(spark, sf_dir):
    """(all_sessions, closed_sessions) as row-tuple sets — the batch
    twin of stateful_sessionize (sessionize_event_paths' exact
    grouping) plus the open/closed split at the final 0s watermark
    (= max event time): a session is CLOSED iff
    last_activity_ms + gap < max_ms."""
    from pyspark.sql import Window as W

    ev = jobs.normalize_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("user_id", "event_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer epoch-ms (unix_millis), matching the engine's
    # us//1000 arithmetic — double-cast truncation can land 1ms low
    # for a timestamp sitting exactly on a gap/watermark boundary
    ms = F.unix_millis(F.col("ts"))
    prev_ms = F.unix_millis(F.lag("ts").over(w))
    new_sess = F.when(
        prev_ms.isNull() | (ms - prev_ms > jobs.SESSION_GAP_MS), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "sess_id", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    batch = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(ordered, lambda x: x["event_type"]), ">"
            ).alias("path"),
        )
    )
    max_ms = ev.agg(F.unix_millis(F.max("ts"))).collect()[0][0]
    cols = ("user_id", "session_start", "n_events", "path")
    all_sessions = {tuple(r) for r in batch.select(*cols).collect()}
    closed = {
        tuple(r)
        for r in batch.where(
            F.unix_millis(F.col("last_ts")) + jobs.SESSION_GAP_MS < max_ms
        )
        .select(*cols)
        .collect()
    }
    return all_sessions, closed


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    """The arbitrary-state sessionizer (applyInPandasWithState,
    EventTimeTimeout, append-on-close) must emit exactly the batch
    twin's sessions whose close deadline the final watermark passed:
    with a 0-second watermark delay the final watermark is max(ts),
    so every session with last_activity + gap < max(ts) times out and
    is emitted exactly once; later sessions are still open when the
    replay ends and must NOT have been emitted."""
    stream = jobs.events_stream(spark, sf_dir).withWatermark(
        "ts", "0 seconds"
    )
    out = jobs.run_to_completion(
        jobs.stateful_sessionize(stream), "t_sessions", mode="append"
    )
    got = {tuple(r) for r in out.select(
        "user_id", "session_start", "n_events", "path"
    ).collect()}
    _, want = _batch_sessions(spark, sf_dir)
    assert len(want) > 0  # the fixture really exercises closures
    assert got == want


def test_stateful_sessionize_multibatch_splice(spark, sf_dir, tmp_path):
    """Session state must splice across micro-batches: replaying the
    same events as MANY files (maxFilesPerTrigger=1) must emit the
    same closed sessions as the single-batch replay — the open-state
    merge path (head-of-batch continues the stored session) is only
    exercised when a session straddles a batch boundary."""
    ev = jobs.normalize_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("user_id", "event_id", "ts", "event_type")
    # time-ordered 8-way split so sessions straddle file boundaries
    # (repartitionByRange keeps event-time order ACROSS files, which
    # the operator's contract requires of its source). FileStreamSource
    # replays by MODIFICATION TIME and a bulk write gives every part
    # one mtime — pin ascending mtimes in range order, else ranges
    # replay shuffled and the 0s watermark drops them as late.
    import os

    src = str(tmp_path / "replay")
    ev.repartitionByRange(8, "ts").write.parquet(src)
    parts = sorted(
        p for p in os.listdir(src) if p.startswith("part-")
    )
    t0 = 1_700_000_000
    for i, p in enumerate(parts):
        os.utime(os.path.join(src, p), (t0 + i * 10, t0 + i * 10))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    out = jobs.run_to_completion(
        jobs.stateful_sessionize(stream), "t_sessions_mb", mode="append"
    )
    got = {tuple(r) for r in out.collect()}

    single = jobs.run_to_completion(
        jobs.stateful_sessionize(
            jobs.events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
        ),
        "t_sessions_sb",
        mode="append",
    )
    want = {tuple(r) for r in single.collect()}
    # multi-batch replay advances the watermark file by file, so it can
    # only close MORE trailing sessions than the single batch, never
    # different ones: single-batch closures must be a subset, and any
    # extras must be genuine batch-twin sessions (checked against the
    # FULL batch session set — a splice bug that emits a spurious
    # fragment of a still-open session would land outside it).
    assert want <= got, got.symmetric_difference(want)
    batch_all, _ = _batch_sessions(spark, sf_dir)
    assert got <= batch_all, got - batch_all


def test_stateful_sessionize_kill_resume_exactly_once(spark, sf_dir, tmp_path):
    """Custom session state must survive a query restart: kill after
    draining half the replay, restart from the same checkpoint with
    the rest. Sessions must come out exactly once across both runs
    (state recovery, no re-emission) and cover everything the
    single-batch replay closes."""
    import os

    ev = jobs.normalize_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("user_id", "event_id", "ts", "event_type")
    staging = str(tmp_path / "staging")
    ev.repartitionByRange(8, "ts").write.parquet(staging)
    parts = sorted(p for p in os.listdir(staging) if p.startswith("part-"))
    src = tmp_path / "replay"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t0 = 1_700_000_000
    for i, p in enumerate(parts):
        os.rename(os.path.join(staging, p), str(src / p))
        os.utime(str(src / p), (t0 + i * 10, t0 + i * 10))
        if i == 3:
            break  # run 1 sees only the first half of the time range

    out_dir = str(tmp_path / "sessions_out")

    def run():
        # file sink, not memory: only a durable sink supports resuming
        # from the checkpoint after a kill
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "0 seconds")
        )
        q = (
            jobs.stateful_sessionize(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not terminate"
        return {tuple(r) for r in spark.read.parquet(out_dir).collect()}

    first = run()
    # "kill": the query is gone; the rest of the data lands while down
    for i, p in enumerate(parts):
        if i <= 3:
            continue
        os.rename(os.path.join(staging, p), str(src / p))
        os.utime(str(src / p), (t0 + i * 10, t0 + i * 10))
    union = run()

    assert first, "run 1 closed no sessions"
    assert first < union, "run 2 closed no further sessions"
    # exactly-once across the restart: no session row duplicated
    total = spark.read.parquet(out_dir)
    assert total.count() == total.distinct().count() == len(union)
    single = jobs.run_to_completion(
        jobs.stateful_sessionize(
            jobs.events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
        ),
        "t_sess_kr_single",
        mode="append",
    )
    want = {tuple(r) for r in single.collect()}
    assert want <= union


def test_stream_stream_join_matches_registered_twin(spark, sf_dir):
    """The watermarked stream-stream interval join must equal its
    REGISTERED, DuckDB-oracled batch twin (join_click_purchase_within)
    row for row — the anchor that lets the driver's oracle verdict on
    the batch query stand in for the streaming operator too."""
    out = jobs.run_to_completion(
        jobs.click_purchase_stream_join(jobs.events_stream(spark, sf_dir)),
        "t_ss_twin",
    )
    got = {
        (r["click_id"], r["purchase_id"], r["user_id"])
        for r in out.collect()
    }
    twin = REGISTRY["join_click_purchase_within"].spark(spark, sf_dir)
    want = {
        (r["click_id"], r["purchase_id"], r["user_id"])
        for r in twin.collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_join_kill_resume_exactly_once(spark, sf_dir, tmp_path):
    """Stream-stream join state must survive a query restart: kill
    after draining half the time-ordered replay, restart from the same
    checkpoint with the rest. Pairs must come out exactly once across
    both runs, and the union must equal the registered batch twin —
    including pairs whose click arrived before the kill and whose
    purchase arrived after (buffered-state recovery)."""
    import os

    ev = jobs.normalize_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("event_id", "user_id", "ts", "event_type")
    staging = str(tmp_path / "staging")
    ev.repartitionByRange(8, "ts").write.parquet(staging)
    parts = sorted(p for p in os.listdir(staging) if p.startswith("part-"))
    src = tmp_path / "replay"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "pairs_out")
    t0 = 1_700_000_000
    for i, p in enumerate(parts):
        os.rename(os.path.join(staging, p), str(src / p))
        os.utime(str(src / p), (t0 + i * 10, t0 + i * 10))
        if i == 3:
            break  # run 1 sees only the first half of the time range

    def run() -> int:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            jobs.click_purchase_stream_join(stream)
            .select("click_id", "purchase_id", "user_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "stream did not terminate"
        return spark.read.parquet(out_dir).count()

    run()
    for i, p in enumerate(parts):
        if i <= 3:
            continue
        os.rename(os.path.join(staging, p), str(src / p))
        os.utime(str(src / p), (t0 + i * 10, t0 + i * 10))
    run()

    total = spark.read.parquet(out_dir)
    got = {tuple(r) for r in total.collect()}
    # exactly-once across the restart: no pair duplicated
    assert total.count() == len(got)
    twin = REGISTRY["join_click_purchase_within"].spark(spark, sf_dir)
    want = {
        (r["click_id"], r["purchase_id"], r["user_id"])
        for r in twin.collect()
    }
    assert got == want and len(want) > 0


def test_stateful_sessionize_rejects_out_of_order(spark, tmp_path):
    """The sessionizer's ordering precondition is ENFORCED, not just
    documented: an allowed-late row (inside a generous watermark
    delay) that lands BEHIND the stored open session's last activity
    must fail the query loudly instead of splicing a silently-wrong
    session (round-10 ADVICE)."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, 1, t0 + dt.timedelta(seconds=s), "view")
                for i, s in rows
            ],
            "event_id long, user_id long, ts timestamp, event_type string",
        )

    src = tmp_path / "replay"
    src.mkdir()
    mk([(1, 0), (2, 10)]).coalesce(1).write.parquet(str(src / "b1"))
    # batch 2's head (t0+5s) is OLDER than the stored last (t0+10s)
    # but inside the 1-hour watermark delay — allowed-late, unmergeable
    mk([(3, 5)]).coalesce(1).write.parquet(str(src / "b2"))
    files = []
    for sub in ("b1", "b2"):
        for p in os.listdir(str(src / sub)):
            if p.startswith("part-"):
                files.append(str(src / sub / p))
    base = 1_700_000_000
    for i, f in enumerate(sorted(files)):
        os.utime(f, (base + i * 10, base + i * 10))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        jobs.stateful_sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_ooo")
        .start()
    )
    with pytest.raises(Exception, match="out-of-order event"):
        try:
            q.processAllAvailable()
            # surface the async failure if processAllAvailable returned
            if q.exception() is not None:
                raise q.exception()
        finally:
            q.stop()


def test_stream_join_drops_late_purchase(spark, tmp_path):
    """Watermark/late-data contract for the stream-stream interval
    join (round-11 verdict directive #6): a purchase arriving AFTER
    the watermark has passed its event time is provably ABSENT from
    the streaming join's output — while the batch twin
    (operators/joins.range_join_bucketed over the same rows) includes
    the pair. The oracled operational readout of this drop behavior is
    plans/extended_ops8.watermark_late_accounting."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def rows(spec):
        return [
            (i, u, t0 + dt.timedelta(minutes=m), et) for i, u, m, et in spec
        ]

    schema = "event_id long, user_id long, ts timestamp, event_type string"
    # the +120 min click AND purchase (user 2, same ts so they don't
    # join each other) advance BOTH sides' watermarks — the global
    # watermark is the MIN across watermark operators, and the join
    # filters each event type BEFORE its watermark node, so a non-join
    # row type would advance neither
    b1 = [
        (1, 1, 0, "click"),
        (2, 1, 5, "purchase"),
        (3, 2, 120, "click"),
        (5, 2, 120, "purchase"),
    ]
    b2 = [(4, 1, 6, "purchase")]  # in-band for click 1, but LATE:
    # watermark after batch 1 is 12:00 − 10 min = 11:50 ≫ 10:06
    src = tmp_path / "replay"
    src.mkdir()

    def feed(sub, spec):
        d = src / sub
        spark.createDataFrame(rows(spec), schema).coalesce(1).write.parquet(
            str(d)
        )
        assert any(p.startswith("part-") for p in os.listdir(str(d)))

    # batch 1 only at stream start; batch 2 lands AFTER batch 1 is
    # fully processed, so the watermark (max seen 12:00 − 10 min =
    # 11:50) is in force when the late purchase arrives
    feed("b1", b1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        jobs.click_purchase_stream_join(
            stream, within="10 minutes", watermark="10 minutes"
        )
        .select("click_id", "purchase_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_drop")
        .start()
    )
    try:
        q.processAllAvailable()
        feed("b2", b2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM t_late_drop").collect()
    }
    # the in-time purchase joined; the late one was dropped silently
    assert got == {(1, 2)}

    # batch twin over the SAME rows: both pairs are present
    from data_lake_with_spark_spark.operators.joins import range_join_bucketed

    all_ev = spark.createDataFrame(rows(b1) + rows(b2), schema)
    clicks = all_ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = all_ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    twin = {
        (r["click_id"], r["purchase_id"])
        for r in range_join_bucketed(
            clicks, purchases, by="user_id", left_ts="ts", right_ts="p_ts",
            max_gap_seconds=600,
        ).collect()
    }
    assert twin == {(1, 2), (1, 4)}


def test_watermark_frontier_monotone(spark, sf_dir):
    """The horizon frontier is monotone (looser watermark drops no
    MORE events) and conserves the event total across horizons."""
    rows = REGISTRY["watermark_horizon_frontier"].spark(spark, sf_dir).collect()
    by_h = {r["horizon_minutes"]: r["n_late"] for r in rows}
    hs = sorted(by_h)
    assert hs == [1, 10, 30, 120]
    assert all(by_h[a] >= by_h[b] for a, b in zip(hs, hs[1:]))
    totals = {r["n_late"] + r["n_ontime"] for r in rows}
    assert len(totals) == 1


def test_session_gap_frontier_monotone(spark, sf_dir):
    """More inactivity tolerance never creates sessions; every user
    contributes at least one session at any gap."""
    rows = REGISTRY["session_gap_frontier"].spark(spark, sf_dir).collect()
    by_g = {r["gap_minutes"]: r["n_sessions"] for r in rows}
    gs = sorted(by_g)
    assert gs == [1, 5, 30, 120]
    assert all(by_g[a] >= by_g[b] for a, b in zip(gs, gs[1:]))
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert all(v >= n_users for v in by_g.values())


def test_stream_join_state_bounded_by_watermark(spark, sf_dir, tmp_path):
    """The stream-stream join's state is BOUNDED by the watermark —
    measured, not asserted from docs: replaying events in 8 time-ordered
    micro-batches with a 10-minute watermark, the final state-store row
    count is a small fraction of the rows that flowed through the join
    (evicted clicks/purchases leave as the watermark passes them). The
    operational complement of test_stream_join_drops_late_purchase: that
    one pins what the watermark REJECTS, this one pins what it RELEASES."""
    import os

    from data_lake_with_spark_spark.functions.time import normalize_ts

    ev = normalize_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("event_id", "user_id", "ts", "event_type")
    n_join_inputs = ev.where(
        F.col("event_type").isin("click", "purchase")
    ).count()
    staging = str(tmp_path / "staging")
    ev.repartitionByRange(8, "ts").write.parquet(staging)
    parts = sorted(p for p in os.listdir(staging) if p.startswith("part-"))
    src = tmp_path / "replay"
    src.mkdir()
    t0 = 1_700_000_000
    for i, p in enumerate(parts):
        os.rename(os.path.join(staging, p), str(src / p))
        os.utime(str(src / p), (t0 + i * 10, t0 + i * 10))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        jobs.click_purchase_stream_join(
            stream, within="10 minutes", watermark="10 minutes"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_state_bound")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not terminate"
    progress = q.lastProgress
    assert progress is not None
    state_rows = sum(
        op["numRowsTotal"] for op in progress["stateOperators"]
    )
    # 8 ts-ordered batches over ~30 days of events: by the final batch
    # the watermark has evicted everything older than ~20 minutes of
    # event time — the state must be a small remnant, never the stream
    assert 0 <= state_rows < 0.2 * n_join_inputs, (
        state_rows,
        n_join_inputs,
    )
