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
