"""Streaming jobs over a file-replay of the events table.

The reference is pure batch (SURVEY §2.8); these are the EXT streaming
operators the testdata's stream-shaped ``events`` table mandates:
tumbling/sliding window aggregation with watermark, streaming
deduplication, session windows, and a custom stateful operator
(applyInPandasWithState running per-user counters).

Batch↔streaming parity: Spark's ``window()``/``session_window()``
produce the same groups in both modes, so ``plans/windows_batch.py``
serves as the differential oracle for these jobs — the pytest suite
runs a job to completion on static data (processAllAvailable) and
compares against the batch plan.

Scale: file replay stands in for Kafka; everything here is
partition-parallel and state is keyed (user_id / event_id), so a real
cluster shards state across executors via the state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_lake_with_spark_spark.functions.time import normalize_ts
from data_lake_with_spark_spark.plans.parity import dsum

def events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Declared schema for the events stream, probed from the file.

    readStream schemas are declared, not inferred — and the driver's
    ``events.parquet`` has shipped ``ts`` as both epoch-nanos bigint
    and ``timestamp[us]`` (TIMESTAMP_NTZ). Hardcoding either shape
    breaks on the other (round 3 proved it), so probe the footer with
    a one-off batch read: parquet schema reads are metadata-only, no
    job runs.
    """
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream replay of events.parquet, ts normalized to TIMESTAMP.

    The file source requires a directory: point it at the sf dir with
    a glob filter (events.parquet is a single file in the testdata)."""
    raw = (
        spark.readStream.schema(events_raw_schema(spark, sf_dir))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir.rstrip("/"))
    )
    return normalize_ts(raw, "ts")


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream replay of embeddings.parquet — the arriving-vector
    feed for the streaming IVF drift view (schema probed from the
    footer, metadata-only)."""
    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir.rstrip("/"))
    )


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows per event type with late-data watermark —
    the streaming twin of plans/windows_batch.window_tumbling_hourly."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding 1-hour/30-minute windows — streaming twin of
    plans/windows_batch.window_sliding_hourly."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-event_id stream: watermarked dropDuplicates —
    state for ids older than the watermark is evicted (bounded state,
    the only viable dedup at unbounded scale)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def streaming_dedup_within_watermark(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """dropDuplicatesWithinWatermark: dedups events whose *event times*
    fall within the watermark delay of each other even when the dedup
    key excludes the timestamp — state is evicted by event time, so
    re-emission of a key is allowed after the window passes (the
    semantics most dedup-at-ingest pipelines actually want)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_aggregate(stream: DataFrame, gap: str = "5 minutes", watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows (gap-based) — streaming twin of
    plans/windows_batch.window_session_5min."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


USER_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _user_totals_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: running per-user totals across
    micro-batches (the applyInPandasWithState escape hatch for
    operators Spark lacks natively)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


SESSION_PATH_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, path string"
)
# State keeps MICROSECOND timestamps (the events table's native
# precision — ms-truncated state emitted sub-ms-wrong session_starts);
# the GAP test floors to ms first, matching the batch twin's
# epoch_ms() rule exactly.
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, path string"
SESSION_GAP_MS = 1_800_000  # 30 min — pinned to the batch twin


def _sessionize_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Arbitrary-state sessionization kernel (transformWithState-shaped,
    expressed on the protobuf-free applyInPandasWithState API): state
    is the user's OPEN session (start, last-activity, count, ordered
    event-type path); closed sessions are emitted exactly once —
    either when a later event arrives past the 30-min gap, or when the
    EVENT-TIME TIMEOUT fires because the watermark passed
    last + gap. This is the operator ``F.session_window`` cannot
    express: the per-session aggregate is sequence-ordered (the
    '>'-joined path), and emission is append-exactly-once on session
    CLOSE, not an update stream of partial aggregates.

    In-batch work is vectorized (pandas diff/cumsum group split, one
    groupby-agg); only the state splice is per-invocation Python.
    Requires per-key event-time order across micro-batches up to the
    watermark (the file-replay and any keyed Kafka source satisfy it;
    late rows beyond the watermark are dropped upstream by
    ``withWatermark``) — ENFORCED below: a batch head older than the
    stored last activity raises instead of splicing out of order."""
    gap = SESSION_GAP_MS
    if state.hasTimedOut:
        start_us, last_us, n, path = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "n_events": [n],
                "path": [path],
            }
        )
        return
    frames = [b for b in batches if len(b)]
    if not frames:  # defensive: no data, no timeout — re-arm and exit
        if state.exists:
            state.setTimeoutTimestamp(
                max(
                    state.get[1] // 1000 + gap,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        return
    pdf = pd.concat(frames, ignore_index=True)
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    pdf = pdf.sort_values(["us", "event_id"], ignore_index=True)
    gms = pdf["us"] // 1000  # ms-floored gap clock (batch-twin rule)
    # group split: a row starts a new session when its gap from the
    # previous row exceeds the threshold (first row provisionally
    # starts one; the open-state splice below may merge it).
    new_sess = gms.diff().fillna(gap + 1) > gap
    open_row = None
    if state.exists:
        start_us, last_us, n, path = state.get
        if pdf["us"].iloc[0] < last_us:
            # ENFORCED PRECONDITION (not just documented): the splice
            # assumes per-key event-time order ACROSS micro-batches.
            # An allowed-late row (nonzero watermark delay + an
            # out-of-order source) arriving after the stored
            # last-activity would merge out of sequence — wrong path
            # order, session_start possibly later than the earliest
            # event. State holds only the open session's aggregate
            # (not its events), so reordering is unrecoverable here:
            # fail fast instead of emitting a silently-wrong session.
            raise ValueError(
                "stateful_sessionize: out-of-order event for user "
                f"{key[0]}: batch head {int(pdf['us'].iloc[0])}us < "
                f"stored last activity {last_us}us. The operator "
                "requires per-key event-time order across "
                "micro-batches — replay with a 0-second watermark "
                "delay (ordered source) or feed a per-key-ordered "
                "stream (e.g. keyed Kafka partitions)."
            )
        if int(gms.iloc[0]) - last_us // 1000 <= gap:
            new_sess.iloc[0] = False  # continues the open session
        open_row = (start_us, last_us, n, path)
    grp = new_sess.cumsum()  # 0 = continuation of the open session
    agg = (
        pdf.groupby(grp)
        .agg(
            start_us=("us", "min"),
            last_us=("us", "max"),
            n=("us", "size"),
            path=("event_type", lambda s: ">".join(s)),
        )
        .sort_index()
    )
    sessions: list[tuple[int, int, int, str]] = []
    if open_row is not None:
        if 0 in agg.index:  # splice: batch head extends the open session
            head = agg.loc[0]
            merged = (
                open_row[0],
                int(head["last_us"]),
                open_row[2] + int(head["n"]),
                open_row[3] + ">" + head["path"],
            )
            sessions.append(merged)
            agg = agg.drop(index=0)
        else:  # gap exceeded: the stored session closes as-is
            sessions.append(open_row)
    sessions.extend(
        (int(r.start_us), int(r.last_us), int(r.n), r.path)
        for r in agg.itertuples()
    )
    *closed, open_sess = sessions
    state.update(open_sess)
    # Clamp above the current watermark: a trailing session whose
    # close deadline the watermark already passed must still get a
    # FUTURE timeout (Spark rejects timestamps <= watermark); it then
    # fires on the next trigger, which is when it could first be
    # observed anyway.
    state.setTimeoutTimestamp(
        max(open_sess[1] // 1000 + gap, state.getCurrentWatermarkMs() + 1)
    )
    if closed:
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "session_start": [
                    pd.Timestamp(s[0], unit="us") for s in closed
                ],
                "n_events": [s[2] for s in closed],
                "path": [s[3] for s in closed],
            }
        )


def stateful_sessionize(stream: DataFrame) -> DataFrame:
    """Gap-based sessionization with ordered event-type paths as a
    CUSTOM STATEFUL streaming operator — the streaming twin of the
    batch ``sessionize_event_paths`` query (plans/analytics_ops.py),
    which serves as its differential oracle in the pytest suite.
    Append mode: each session is emitted exactly once when it closes
    (gap exceeded by a successor, or event-time timeout once the
    watermark passes last_activity + 30 min). The caller supplies the
    watermark (``stream.withWatermark("ts", ...)``) — event-time
    timeouts require one.

    Scale shape: state is keyed on user_id and sharded across
    executors by the state store; per-key state is one open session
    (four scalars + a bounded path string), so total state is
    O(active users), independent of history length — the property
    that makes gap sessionization viable on an unbounded stream where
    the batch window form would need the full history every run.

    Splice-cost bound: the open-state splice is per-GROUP driver-side
    Python inside the kernel (everything else is vectorized pandas),
    so per-task wall-clock carries an O(groups-per-task) constant of
    a few tens of microseconds per active user. That stays off the
    critical path while groups-per-task ≲ ~100k (≈ seconds of splice
    work per trigger, amortized across ``spark.sql.shuffle.partitions``
    state-store tasks); a 100× user count is absorbed by raising the
    shuffle-partition count (state shards with it) — i.e. repartition
    the state store, not the kernel. If a single trigger must splice
    millions of ACTIVE keys per task, the kernel's per-group constant
    dominates and the right fix is more state partitions, never a
    bigger batch."""
    return (
        stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_PATH_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Stateful running totals per user via applyInPandasWithState
    (update mode; processing-time timeout disabled — state lives for
    the replay)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_totals_fn,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_stream_join(
    stream: DataFrame, within: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each click joined to the same
    user's purchases within ``within`` AFTER the click. Watermarks on
    both sides bound the join state (late rows age out) — the scalable
    form of the batch range join (operators/joins.range_join_bucketed).
    """
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")


def click_purchase_stream_join_outer(
    stream: DataFrame, within: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click emits — with
    its purchase when one arrives inside ``within``, with nulls once
    the watermark proves none can. The null row for an unmatched click
    is emitted only when the purchase-side watermark passes
    ``click_ts + within`` (until then a match could still arrive), so
    clicks near the head of the stream stay buffered in state — the
    correct, bounded-state semantics for "conversion or churn" feeds.
    Matched output is identical to the inner form."""
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    """Stream-static enrichment: every micro-batch joins against the
    (re-read-per-batch) static dimension — stateless, no watermark
    needed, and the dim side broadcasts under the usual threshold, so
    the stream never shuffles. The streaming form of the reference's
    fact-enrichment join (etl.py:244-247). Left join: events without a
    dim row pass through with nulls rather than being dropped."""
    d = F.broadcast(
        dim.withColumnRenamed(dim_key, stream_key) if dim_key != stream_key else dim
    )
    return stream.join(d, stream_key, "left")


def stream_into_lake(
    stream: DataFrame, path: str, keys: list[str], query_name: str = "lake_sink"
):
    """Exactly-once streaming ingestion: foreachBatch → versioned
    upsert. Each micro-batch commits as an idempotent insert-if-absent
    version, so replays/retries of a batch append nothing — the
    end-to-end exactly-once pattern on a plain-parquet lake."""
    from data_lake_with_spark_spark.sources.versioned import versioned_upsert

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        versioned_upsert(batch_df.sparkSession, batch_df, path, keys)

    return (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def run_to_completion(df: DataFrame, query_name: str, mode: str = "append") -> DataFrame:
    """Drive a streaming plan over the static replay to completion via
    a memory sink; returns the materialized result as a DataFrame.

    Mode note for finite replays: in append mode a windowed aggregate
    only emits windows the watermark has passed — the replay's final
    windows would be withheld. Tests that want the full result use
    ``complete`` (aggregations) or rely on row-level append
    (dedup)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {query_name}")


def hourly_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The hourly hypertable pre-aggregate (twin of the batch form in
    plans/windows_batch.rollup_hypertable_daily), streaming-safe:
    watermarked so state is bounded."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_dec"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "value_dec",
        )
    )


def stream_rollup_into_lake(
    rollup: DataFrame, path: str, query_name: str = "rollup_sink"
):
    """Continuously-maintained rollup table: update-mode streaming
    aggregation → foreachBatch versioned MERGE (replace-by-key).

    Each micro-batch emits only the (hour, event_type) groups it
    changed; the merge appends those rows as a new version and readers
    resolve last-writer-wins (merge-on-read) — so the lake always
    holds the current rollup, updates cost O(changed groups), and
    every micro-batch remains a time-travelable snapshot. This is the
    streaming half of the hypertable pattern: the batch query serves
    coarser windows FROM this table instead of raw events."""
    from data_lake_with_spark_spark.sources.versioned import versioned_merge

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versioned_merge(batch_df, path, keys=["hour", "event_type"])

    return (
        rollup.writeStream.foreachBatch(sink)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def _make_user_totals_processor():
    """StatefulProcessor for transformWithStateInPandas — Spark 4's
    successor to applyInPandasWithState (running_user_totals above is
    the legacy twin). Composable typed state handles instead of one
    tuple blob; requires the RocksDB state store provider, which also
    brings changelog checkpointing + state bounded by disk, not heap —
    the 100 TB keyed-state posture. Defined lazily (import inside) so
    environments without the API still import this module."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Running per-user totals via transformWithStateInPandas — same
    contract as running_user_totals (update mode, state lives for the
    replay), on the modern stateful API. The caller's session must use
    the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass), and the runtime
    needs protobuf (the state-server wire protocol) — absent in this
    container, so the pytest skips; applyInPandasWithState above is
    the environment-portable path."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_user_totals_processor(),
            outputStructType=USER_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def ohlc_bars(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming hourly OHLC bars (twin of the batch
    finance_ohlc_hourly): min_by/max_by over the unique (ts, event_id)
    struct ordinal are plain hash-agg accumulators, so candlesticks
    stream with bounded watermarked state exactly like counts do —
    no per-bar sort, no ordered state."""
    mu = F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)")
    return (
        stream.withWatermark("ts", watermark)
        .select(
            "event_type",
            "ts",
            mu.alias("mu"),
            F.struct("ts", "event_id").alias("ord"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.expr("min_by(mu, ord)").cast("bigint").alias("open_mu"),
            F.max("mu").cast("bigint").alias("high_mu"),
            F.min("mu").cast("bigint").alias("low_mu"),
            F.expr("max_by(mu, ord)").cast("bigint").alias("close_mu"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("bar"),
            "event_type",
            "open_mu",
            "high_mu",
            "low_mu",
            "close_mu",
            "n_ticks",
        )
    )
