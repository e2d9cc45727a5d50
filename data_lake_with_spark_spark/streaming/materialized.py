"""Streaming materialized views: an IVM aggregate advanced by a
CHANGE-FEED STREAM.

``operators/ivm.py`` proved the refresh step (signed deltas == full
recompute); this module drives it continuously: each micro-batch of
change rows (the ``versioned_changes(include_preimages=True)`` shape —
``_change_type`` ∈ insert / update_preimage / update_postimage /
delete) folds into the view state inside a foreachBatch sink, and each
refresh commits as a NEW VERSION of the state table. Two properties
fall out of that pairing:

- **O(changes) refresh at any scale** — the base table is never
  rescanned; only changed groups shuffle (the delta side of the merge
  is micro-batch-sized).
- **Time travel over refreshes** — version N of the state table IS the
  materialized view after micro-batch N, so a consumer can pin the
  view as of any past refresh (``versioned_read_snapshot(path, v)``)
  while the stream keeps advancing. Writes go to a fresh version dir,
  so the read-modify-write inside the sink never overwrites what it is
  reading.

The reference has no streaming surface (SURVEY §2.8) — this is the
EXT streaming analog of its summary-table builds (reference
``etl.py:209-211``: recompute-the-world dims), done incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.sources import versioned as V


def read_view(spark: SparkSession, state_path: str, version: int | None = None) -> DataFrame:
    """The materialized view as of refresh ``version`` (default:
    latest). Each version is a self-contained snapshot."""
    return V.versioned_read_snapshot(spark, state_path, version)


def applied_epoch(state_path: str) -> int | None:
    """Source epoch id committed with the LATEST refresh (None when the
    view doesn't exist yet or was maintained without epoch tracking)."""
    meta = V.version_meta(state_path)
    return None if meta is None else meta.get("epoch_id")


def apply_changes(
    state_path: str,
    batch_df: DataFrame,
    epoch_id: int | None,
    group_cols: list[str],
    sum_cols: list[str],
    moments: bool = False,
) -> int | None:
    """Fold one micro-batch of change rows into the view state and
    commit it as the next version, IDEMPOTENTLY per epoch: when
    ``epoch_id`` is not newer than the epoch recorded with the latest
    committed refresh, the call is a no-op — the state already
    includes this batch. foreachBatch is at-least-once (a crash
    between the sink and the checkpoint commit REPLAYS the batch with
    the same epoch id on restart); recording the epoch atomically with
    the version commit (versioned_append meta) turns that into
    exactly-once state. Returns the committed version, or None when
    skipped."""
    if epoch_id is not None:
        last = applied_epoch(state_path)
        if last is not None and epoch_id <= last:
            return None  # replayed micro-batch; already folded
    spark = batch_df.sparkSession
    try:
        cur = read_view(spark, state_path)
    except FileNotFoundError:
        cur = None
    fold = ivm.maintain_moments if moments else ivm.maintain
    return V.versioned_append(
        fold(cur, batch_df, group_cols, sum_cols),
        state_path,
        meta=None if epoch_id is None else {"epoch_id": epoch_id},
    )


def stream_maintain_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    query_name: str = "ivm_view",
    checkpoint: str | None = None,
):
    """Maintain (group_cols, n_rows, <sum_cols>) from a stream of
    pre-image change rows. Returns the started StreamingQuery
    (availableNow trigger — drain what exists, then stop; swap the
    trigger for a continuous deployment).

    Pass ``checkpoint`` for the production shape: the query resumes
    from the checkpointed source offsets after a kill, and the
    epoch-id guard in ``apply_changes`` makes the one replayed
    micro-batch a no-op instead of a double-fold (epoch ids are stable
    across restarts of the same checkpoint). Without a checkpoint a
    restart re-reads from scratch, so epochs restart at 0 and are NOT
    recorded."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes(
            state_path,
            batch_df,
            epoch_id if checkpoint is not None else None,
            group_cols,
            sum_cols,
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_moment_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    value_cols: list[str],
    query_name: str = "ivm_moment_view",
    checkpoint: str | None = None,
):
    """Same loop for the moment-sum state (n, Σx, Σx² per value col) —
    ``ivm.moment_stats(read_view(...))`` derives avg/var/stddev of the
    live view at any pinned refresh. Same checkpoint/epoch-replay
    contract as stream_maintain_view."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes(
            state_path,
            batch_df,
            epoch_id if checkpoint is not None else None,
            group_cols,
            value_cols,
            moments=True,
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_join_view(
    fact_changes_stream: DataFrame,
    dim: DataFrame,
    state_path: str,
    fact_key: str,
    dim_key: str,
    group_cols: list[str],
    sum_cols: list[str],
    query_name: str = "ivm_join_view",
    checkpoint: str | None = None,
):
    """Streaming maintenance of an ENRICHED rollup (fact ⋈ dim grouped
    on dim attributes): each micro-batch of fact change rows is
    enriched by one broadcast dim join (Δ(fact⋈dim) = Δfact⋈dim for a
    refresh-static dim — see operators/ivm.py:maintain_join_agg) and
    folded into the versioned view state. Same checkpoint/epoch-replay
    exactly-once contract as stream_maintain_view; the dim is captured
    at query start — re-deploy the query to pick up a dim change (and
    re-evaluate the view on the dim's own cadence)."""
    from pyspark.sql import functions as F

    d = F.broadcast(dim.withColumnRenamed(dim_key, fact_key))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes(
            state_path,
            batch_df.join(d, fact_key, "inner"),
            epoch_id if checkpoint is not None else None,
            group_cols,
            sum_cols,
        )

    w = fact_changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_bitmap_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    id_col: str,
    query_name: str = "bitmap_view",
    checkpoint: str | None = None,
):
    """Streaming EXACT distinct counts: per-micro-batch OR-fold of
    32-bit id bitmaps into a versioned state table (ivm.
    maintain_bitmap). The fold is idempotent per id, so replays are
    CORRECT even without the epoch guard; the guard still skips
    redundant versions. Read with ivm.read_bitmap_distinct — the
    streaming twin of agg_bitmap_distinct_users."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain_bitmap(cur, batch_df, group_cols, id_col),
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_kmv_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    id_col: str,
    k: int = 256,
    query_name: str = "kmv_view",
    checkpoint: str | None = None,
):
    """Streaming APPROXIMATE distinct counts with bounded state: per-
    micro-batch fold of k-minimum-hash sketches into a versioned state
    table (ivm.maintain_kmv). Idempotent per id like the bitmap view,
    but state is k hashes per group independent of the id range — the
    sketch to reach for when ids are sparse 64-bit values — and the
    maintained state doubles as the intersection-capable theta sketch
    (sketches.kmv_overlap). Read with ivm.read_kmv_distinct."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain_kmv(cur, batch_df, group_cols, id_col, k=k),
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


WINDOWED_DISTINCT_FAMILIES = ("bitmap", "kmv", "hll")


def stream_maintain_windowed_distinct_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    id_col: str,
    bucket_col: str,
    horizon: int,
    family: str = "bitmap",
    k: int = 256,
    query_name: str = "windowed_distinct_view",
    checkpoint: str | None = None,
):
    """Streaming SLIDING-WINDOW distinct counts — the epoch-partitioned
    expiring states (``ivm.maintain_{bitmap,kmv,hll}_windowed``,
    round-13 verdict directive #5) advanced per micro-batch into a
    versioned snapshot table. Arrivals fold into their epoch bucket's
    sub-state; buckets past ``horizon`` of the monotone watermark
    retire with the refresh, so the committed snapshot holds exactly
    the live window (state bounded by horizon · per-bucket size per
    group — the table every "distinct users, trailing N days"
    dashboard reads). Idempotent per id within a bucket (replays
    cannot inflate), with the usual epoch guard skipping redundant
    versions; ``family`` picks bitmap (exact), kmv (bounded-state
    estimate, ``k``) or hll (16 registers). Read with the matching
    ``ivm.read_*_windowed_distinct`` over ``read_view``. The windowed
    folds build shared() plan caches (watermark + filter both consume
    the merged frame) — the sink releases them after each commit so a
    long-running stream's executor storage stays bounded."""
    if family not in WINDOWED_DISTINCT_FAMILIES:
        raise ValueError(
            f"family must be one of {WINDOWED_DISTINCT_FAMILIES}, got {family!r}"
        )

    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    def fold(cur: DataFrame | None, batch: DataFrame) -> DataFrame:
        if family == "bitmap":
            return ivm.maintain_bitmap_windowed(
                cur, batch, group_cols, id_col, bucket_col, horizon
            )
        if family == "kmv":
            return ivm.maintain_kmv_windowed(
                cur, batch, group_cols, id_col, bucket_col, horizon, k=k
            )
        return ivm.maintain_hll_windowed(
            cur, batch, group_cols, id_col, bucket_col, horizon
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        try:
            V.versioned_append(
                fold(cur, batch_df),
                state_path,
                meta=None if eid is None else {"epoch_id": eid},
            )
        finally:
            release_shared_caches()

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_hll_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    id_col: str,
    query_name: str = "hll_view",
    checkpoint: str | None = None,
):
    """Streaming APPROXIMATE distinct counts with FIXED state: per-
    micro-batch register-MAX fold of portable-HLL registers into a
    versioned state table (ivm.maintain_hll). Idempotent per id like
    the bitmap/KMV views, but state is <=16 rows per group no matter
    how many ids arrive -- the cheapest of the three distinct states;
    registers are bit-identical to the one-shot sketch and roll up
    across groups (the sketch_hll_cube algebra). Read with
    ivm.read_hll_distinct -- the streaming twin of
    sketch_hll_portable."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain_hll(cur, batch_df, group_cols, id_col),
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_extrema_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    value_col: str,
    query_name: str = "extrema_view",
    checkpoint: str | None = None,
):
    """Streaming per-group MAX/MIN/count state (ivm.maintain_extrema)
    -- the incremental backbone of the freshness-SLA monitor: vmax of
    the event-time column per source IS the ingest watermark, read at
    any moment without rescanning the base table. n_rows makes the
    epoch guard load-bearing (counts are not replay-idempotent);
    checkpointed runs are exactly-once, unchcheckpointed dev runs
    record no epochs."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain_extrema(cur, batch_df, group_cols, value_col),
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_changelog_view(
    changes_stream: DataFrame,
    state_path: str,
    query_name: str = "changelog_view",
    checkpoint: str | None = None,
):
    """Streaming changelog compaction: per-key last-write-wins
    net-effect state (operators/cdc.py:compact_changelog) advanced one
    micro-batch at a time — the Debezium/Flink-upsert sink as a
    materialized view, and the streaming twin of the
    ``cdc_changelog_compact`` batch query (pytest pins final state ==
    the one-shot compaction of all changes, under any batch split).
    n_changes makes the epoch guard load-bearing (counts double on
    replay); checkpointed runs are exactly-once via the same
    epoch-with-version commit as every other view here."""
    from data_lake_with_spark_spark.operators import cdc as CDC

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            CDC.compact_changelog(cur, batch_df),
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_topk_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int = 5,
    query_name: str = "topk_view",
    checkpoint: str | None = None,
):
    """Streaming per-group top-k leaderboard: the state is the k
    highest-``order_col`` rows per group (ties broken by ``id_col``
    ascending — a total order, so the state is unique). Top-k over a
    max-monoid is exactly mergeable — topk(A ∪ B) = topk(topk(A) ∪
    topk(B)) — so each refresh folds the micro-batch's own top-k into
    the ≤k retained rows per group and the final state equals the
    one-shot window query over all rows regardless of batch split
    (pytest-pinned). Unlike count-based "heavy hitters" (which need
    count-min + candidates), max-based top-k needs no sketch: the
    state IS exact at O(groups·k) size — the leaderboard shape every
    monitoring pipeline maintains.

    INSERT-ONLY contract: a max-monoid leaderboard cannot retract —
    once a row falls out of the retained ≤k state, the information to
    undo a later delete is gone. When the input carries a CDF-style
    ``_change_type`` column, ``insert``/``update_postimage`` rows are
    folded, ``update_preimage`` rows are dropped (they are the
    pre-state, never foldable — folding them would double-count every
    update), and a ``delete`` row RAISES at execution time (the
    raise-in-filter inside ``ivm.maintain_topk``, failing the
    micro-batch before the atomic state commit) instead of being
    silently folded in as an insert and corrupting the leaderboard. Before the top-k window the merge
    collapses cur ∪ fresh to ONE row per (group, id) via
    max(order_col), so a postimage for an id already retained in state
    REPLACES it rather than coexisting with the stale row — exact for
    inserts (ids unique, identity reduction) and for value-RAISING
    updates (max = postimage). The residual caveat: an update that
    LOWERS a retained row's ``order_col`` cannot retract the old
    higher value (max keeps it), so under such feeds the state is an
    upper bound; it is exact for insert-only or value-monotone feeds. Route
    delete-bearing / non-monotone changefeeds to a recount-capable
    view (stream_maintain_view's signed counts) instead."""
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # No eager delete probe here (round-12 ADVICE): the insert-only
        # contract is enforced IN THE PLAN by ivm.maintain_topk's
        # execution-time raise-in-filter, and versioned_append commits
        # atomically (staged write, manifest last), so a delete row
        # fails the micro-batch before any state mutation — the former
        # deletes.isEmpty() pre-check paid a whole extra job per
        # micro-batch for the same guarantee.
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        # the fold itself (top-k(fresh) union'd, one row per (group,
        # id) via max so a postimage REPLACES its stale retained row,
        # re-topped) lives in ivm.maintain_topk — the batch form the
        # driver oracles via ivm_topk_equivalence (round 12)
        merged = ivm.maintain_topk(
            cur, batch_df, group_cols, id_col, order_col, k
        )
        V.versioned_append(
            merged,
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def stream_maintain_topk_retractable_view(
    changes_stream: DataFrame,
    state_path: str,
    base_path: str,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int = 5,
    query_name: str = "topk_retract_view",
    checkpoint: str | None = None,
):
    """``stream_maintain_topk_view`` WITH a retraction story (round-12
    verdict directive #3, streaming form): deletes and value-LOWERING
    updates no longer fail the micro-batch — the sink additionally
    maintains the keyed BASE table the change feed describes
    (merge-on-read: ``versioned_merge`` for insert/update_postimage
    rows, ``versioned_delete`` tombstones for deletes — both
    O(batch)), and the fold (``ivm.maintain_topk_retractable``)
    rescans ONLY the eviction-risk groups from that base; every other
    group rides the O(batch + k·groups) max-monoid fast path.

    The base table is the honest price of retraction: once a row falls
    out of the retained ≤k state the (k+1)-th is unrecoverable from
    the state alone, so SOME O(live rows) store must exist — here it
    is merge-on-read (reads resolve per-key latest + tombstones), so
    the per-batch WRITE stays O(batch) and only the risk-group rescan
    reads it.

    Feed preconditions (raised loudly, never silently merged): at most
    one postimage per (group, id) per micro-batch (versioned_merge's
    conflict raise), and a key must not be both upserted and deleted
    in the same micro-batch (intra-batch order is unknowable at the
    sink). update_preimage rows ride along: the base writes skip them
    and the fold uses them only for risk detection.

    Exactly-once: the epoch guard sits on the STATE table commit,
    which happens LAST — a replay after a crash re-applies the base
    merge/delete (idempotent by content: same rows, same tombstone
    keys) and re-folds once; a replay after the state commit skips
    everything."""
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        ct = F.col("_change_type")
        cols = [*group_cols, id_col, order_col]
        # The base write must understand every row it applies — an
        # UNKNOWN change type (e.g. a 3-type feed's plain "update")
        # cannot be reconstructed into base semantics at the sink, so
        # it fails the micro-batch in-plan (before the atomic base
        # commit) instead of being silently dropped. The batch
        # operator can afford to rescan instead (its caller supplies
        # the base truth); the sink cannot.
        keep_up = (
            F.when(ct.isin("insert", "update_postimage"), F.lit(True))
            .when(ct.isin("update_preimage", "delete"), F.lit(False))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "stream_maintain_topk_retractable_view: unknown"
                            " _change_type="
                        ),
                        ct,
                    )
                ).cast("boolean")
            )
        )
        ups = batch_df.where(keep_up).select(*cols)
        dels = batch_df.where(ct == "delete").select(*group_cols, id_col)
        keys = [*group_cols, id_col]
        conflicted = ups.select(*keys).intersect(dels.select(*keys))
        if not conflicted.isEmpty():
            raise ValueError(
                "stream_maintain_topk_retractable_view: a key appears as "
                "both upsert and delete in one micro-batch — intra-batch "
                "order is unknowable at the sink; compact the feed so each "
                "key carries one net change per batch"
            )
        # base FIRST (the fold's rescan needs the post-batch rows);
        # versioned_merge raises on conflicting postimages per key
        V.versioned_merge(ups, base_path, keys=keys)
        if not dels.isEmpty():
            V.versioned_delete(spark, dels, base_path, keys=keys)
        base_after = V.versioned_read_merged(spark, base_path, keys=keys).select(
            *cols
        )
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        merged = ivm.maintain_topk_retractable(
            cur, batch_df, base_after, group_cols, id_col, order_col, k
        )
        V.versioned_append(
            merged,
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


PSI_DEFAULT_EDGES = (-200000, -100000, 0, 100000, 200000)


def psi_bin(score_col: str, edges=PSI_DEFAULT_EDGES):
    """Fixed-edge bin assignment for a micro-scaled score column —
    map-side column math, identical to the one-shot
    ml_psi_score_drift binning (fixed edges, not quantiles, so a
    row's bin never depends on the rest of the stream — the property
    that makes the PSI state mergeable at all)."""
    from pyspark.sql import functions as F

    expr = None
    for i, e in enumerate(edges):
        cond = F.col(score_col) < F.lit(int(e))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return expr.otherwise(len(edges)).alias("bin")


def stream_maintain_psi_view(
    changes_stream: DataFrame,
    state_path: str,
    score_col: str,
    side_col: str,
    edges=PSI_DEFAULT_EDGES,
    query_name: str = "psi_view",
    checkpoint: str | None = None,
):
    """Streaming population-stability monitor: per-(side, bin) COUNTS
    are the whole state (bins from fixed edges, so counts merge across
    micro-batches with the plain additive fold), and PSI derives at
    READ time from the live state — the model-drift readout every
    deployed scorer wants continuously, maintained in O(changes) per
    batch with 2·(len(edges)+1) state rows total. Same epoch-guard /
    checkpoint contract as stream_maintain_view; deletes retract
    counts through the signed delta, so a sliding-window deployment
    (expire old scores as deletes) keeps PSI over a moving window."""
    binned = changes_stream.withColumn("bin", psi_bin(score_col, edges)).select(
        side_col, "bin", "_change_type"
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changes(
            state_path,
            batch_df,
            epoch_id if checkpoint is not None else None,
            [side_col, "bin"],
            [],
        )

    w = binned.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def read_psi_drift(
    spark: SparkSession,
    state_path: str,
    side_col: str = "side",
    version: int | None = None,
) -> DataFrame:
    """PSI per bin from a psi-view state (side 0 = expected, 1 =
    actual): integer ppm probabilities, micro-nat quantized logs, one
    rounded contribution per bin — arithmetic identical to the batch
    ml_psi_score_drift query (batch-equality pytest-pinned), including
    its zero-count smoothing: ppm clamps to ≥1 inside the log and the
    side totals to ≥1 under the division, so a bin that empties on one
    side (drift at its most extreme) reports a large finite
    contribution instead of NULL. Pure column math over ≤ 2·n_bins
    state rows; pin ``version`` to read the drift as of any past
    refresh."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.plans.parity import pround

    state = read_view(spark, state_path, version)
    cell = state.groupBy("bin").agg(
        F.sum(F.when(F.col(side_col) == 0, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_expected"),
        F.sum(F.when(F.col(side_col) == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_actual"),
    )
    tot = cell.agg(
        F.sum("n_expected").cast("bigint").alias("ne"),
        F.sum("n_actual").cast("bigint").alias("na"),
    )
    ppm = cell.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_expected",
        "n_actual",
        F.expr(
            "CAST(n_expected * 1000000 DIV GREATEST(ne, 1) AS BIGINT)"
        ).alias("expected_ppm"),
        F.expr(
            "CAST(n_actual * 1000000 DIV GREATEST(na, 1) AS BIGINT)"
        ).alias("actual_ppm"),
    )

    def qln(col):
        # clamp to >= 1 ppm before the log: ln(1) = 0, never NULL
        return F.floor(
            F.log(F.greatest(col, F.lit(1)).cast("double")) * 1e6
        ).cast("bigint")

    term = (F.col("expected_ppm") - F.col("actual_ppm")) * (
        qln(F.col("expected_ppm")) - qln(F.col("actual_ppm"))
    )
    return ppm.select(
        F.col("bin").cast("int").alias("bin"),
        "n_expected",
        "n_actual",
        "expected_ppm",
        "actual_ppm",
        pround(term.cast("double") / 1e12, 6).alias("contribution"),
    ).orderBy("bin")


def stream_dedup_neardup_view(
    docs_stream: DataFrame,
    state_path: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "neardup_view",
    checkpoint: str | None = None,
):
    """Streaming near-dup dedup-at-ingest — the LLM training-data
    admission gate run continuously: every arriving document is tested
    against EVERYTHING already ingested (plus earlier docs in its own
    micro-batch) and the state records a verdict per doc: ``kept``
    or ``dup_of`` the smallest-id witness it collided with.

    Scale design — the state is SIGNATURES ONLY, never text:
    per doc, ``num_hashes`` MinHash values (xxhash64 shingle minima —
    the same family as operators/dedup.py:minhash_signatures) plus
    ``bands`` banded bucket hashes, i.e. O(docs · num_hashes · 8 B)
    total. Candidates come from a band-hash equi-join (new posting ×
    state posting — never all-pairs); verification is the
    signature-agreement count (matching MinHash positions estimate
    Jaccard; the integer cutoff ceil(threshold · num_hashes) makes the
    verdict exact arithmetic, replay-stable, and text-free). Per
    refresh the shuffle is the banded candidate join, and — because a
    doc's verdict NEVER changes — the state commits as an append-only
    DELTA (O(batch) write per refresh, read via delta-union +
    compaction), unlike the aggregate views whose snapshots must
    rewrite. Read the verdicts with ``read_neardup_state``.

    SMALLER-ID-WITNESS contract: a doc is a dup iff it collides with a
    smaller-id doc — previously ingested or earlier in its own batch —
    exactly the batch rule "drop every doc with a smaller-id match"
    (dropped docs still witness). Each arriving doc's verdict therefore
    equals the one-shot computation REGARDLESS of batch split; the one
    streaming limitation is that an already-admitted doc cannot be
    retracted when a smaller-id duplicate arrives later (its verdict
    row stays ``kept``), so full state equality with the one-shot run
    holds when arrival order equals id order (contiguous splits) —
    pytest-pinned. Same epoch-guard / versioned-commit contract as the
    other views.
    """
    import math

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators.dedup import minhash_signatures

    min_agree = math.ceil(threshold * num_hashes)
    rows_per_band = num_hashes // bands

    def signature_frame(batch_df: DataFrame) -> DataFrame:
        sig = minhash_signatures(
            batch_df.select(id_col, text_col), num_hashes, n, id_col, text_col
        )
        band_cols = [
            F.xxhash64(
                *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col("id").alias("doc_id"),
            F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
            F.array(*band_cols).alias("bands"),
        )

    def posting(frame: DataFrame) -> DataFrame:
        return frame.select(
            "doc_id", "sig", F.posexplode("bands").alias("band", "val")
        )

    def agree_count(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(state_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        try:
            cur = V.versioned_read(spark, state_path)
        except FileNotFoundError:
            cur = None
        fresh = signature_frame(batch_df)
        new_post = posting(fresh).alias("n")

        def scored(witness_post) -> DataFrame:
            return new_post.join(
                witness_post,
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.val") == F.col("o.val"))
                & (F.col("n.doc_id") > F.col("o.doc_id")),
            ).select(
                F.col("n.doc_id").alias("doc_id"),
                F.col("o.doc_id").alias("witness"),
                agree_count(F.col("n.sig"), F.col("o.sig")).alias("agree"),
            )

        # intra-batch witnesses: smaller-id docs of the same batch;
        # state witnesses: everything previously ingested (state ids
        # precede all batch ids under the first-arrival contract, so
        # the same doc_id > witness guard applies to both sides)
        cands = scored(posting(fresh.select("doc_id", "sig", "bands")).alias("o"))
        if cur is not None:
            cands = cands.unionByName(
                scored(posting(cur.select("doc_id", "sig", "bands")).alias("o"))
            )
        matches = (
            cands.where(F.col("agree") >= min_agree)
            .groupBy("doc_id")
            .agg(F.min("witness").alias("dup_of"))
        )
        verdicts = fresh.join(matches, "doc_id", "left").select(
            "doc_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "sig",
            "bands",
        )
        # verdicts are append-only (a doc's verdict never changes), so
        # each refresh commits ONLY the batch's rows as a delta —
        # O(batch) write instead of an O(state) snapshot rewrite; the
        # reader unions deltas (and compaction folds them when file
        # count grows, sources/versioned.py:compact)
        V.versioned_append(
            verdicts,
            state_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = docs_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()

def read_neardup_state(
    spark: SparkSession, state_path: str, version: int | None = None
) -> DataFrame:
    """The near-dup ingest view's verdict state as of ``version``
    (default latest): delta-union over the append-only per-batch
    commits — each doc appears exactly once with its immutable
    verdict (doc_id, kept, dup_of, sig, bands)."""
    return V.versioned_read(spark, state_path, version)


def stream_maintain_minhash_index_view(
    docs_stream: DataFrame,
    sigs_path: str,
    pairs_path: str,
    sigs_fn,
    n_bands: int,
    n_rows: int,
    threshold: float = 0.5,
    query_name: str = "minhash_index_view",
    checkpoint: str | None = None,
):
    """Streaming form of the maintained MinHash band index (round-13
    verdict directive #4): each micro-batch of documents is signed by
    ``sigs_fn`` (a builder like ``plans/llm_ops._mh_portable_sigs``
    returning ``(doc_id, sh, s0..s{n_bands·n_rows-1})``), probed
    against the persisted signature state with
    ``ingest.minhash_index_new_pairs`` — emitting exactly the near-dup
    pairs NEW this batch — then absorbed. The union of the per-batch
    pair deltas equals the one-shot portable pair list over the whole
    corpus regardless of batch split (the batch operator's driver-
    oracled equivalence, ingest_minhash_newpairs_equivalence), each
    pair discovered once, in the batch of its later-arriving side.

    Two versioned tables, both delta-append (O(batch) writes — docs
    are immutable, pair verdicts are immutable):

    - ``sigs_path``: signatures + distinct shingles of everything
      absorbed (the ``_shingles`` companion discipline — history never
      re-tokenizes). Read via delta-union; compaction folds files.
    - ``pairs_path``: the per-batch new-pair deltas (a_id, b_id,
      jaccard). ``read_minhash_index_pairs`` unions them into the
      living pair list.

    Exactly-once across the TWO-table commit: the epoch guard sits on
    the PAIRS commit, which happens last. A replay after a crash
    between the commits sees its own docs already in the signature
    state — the sink anti-joins the batch's doc ids out of the probe
    state (restoring the exact pre-batch index) and skips the
    double-append via the sigs table's own epoch meta, then emits the
    identical pair delta. Scale shape per refresh: batch signing is
    per-row HOF work over the batch only; the probe is the
    batch-posting ⋈ index-posting equi-join on (band, key) —
    O(batch·bands), never a corpus re-pair; the exact-Jaccard verify
    touches collision survivors only."""

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import ingest as ING

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(pairs_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        # materialize the batch signatures ONCE: they feed the probe,
        # the sigs append and the pair verify (HOF shingle/minhash
        # folds are the expensive part of a refresh)
        fresh = sigs_fn(batch_df).localCheckpoint(eager=True)
        try:
            state = V.versioned_read(spark, sigs_path)
        except FileNotFoundError:
            state = None
        if state is not None:
            # replay-proofing: a crash AFTER the sigs commit but
            # BEFORE the pairs commit leaves this batch's docs in the
            # state — remove them so the probe sees exactly the
            # pre-batch index and the re-emitted delta is identical
            state = state.join(
                F.broadcast(fresh.select("doc_id")), "doc_id", "left_anti"
            )
        new_pairs = ING.minhash_index_new_pairs(
            state, fresh, n_bands, n_rows, threshold
        )
        if eid is None or (applied_epoch(sigs_path) or -1) < eid:
            V.versioned_append(
                fresh,
                sigs_path,
                meta=None if eid is None else {"epoch_id": eid},
            )
        V.versioned_append(
            new_pairs,
            pairs_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = docs_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def read_minhash_index_pairs(
    spark: SparkSession, pairs_path: str, version: int | None = None
) -> DataFrame:
    """The maintained index's living near-dup pair list as of
    ``version`` (default latest): delta-union over the per-batch
    new-pair commits — each (a_id, b_id) exactly once."""
    return V.versioned_read(spark, pairs_path, version)


def read_minhash_index_sigs(
    spark: SparkSession, sigs_path: str, version: int | None = None
) -> DataFrame:
    """Everything the index has absorbed (doc_id, sh, s0..) as of
    ``version`` — the probe-side state a batch joins against."""
    return V.versioned_read(spark, sigs_path, version)



# ---------------------------------------------------------------------------
# Streaming IVF ingest: assign arriving vectors to a frozen codebook
# map-side, fold per-cell distortion state incrementally — the
# streaming twin of plans/extended_ops7.ivf_incremental_assign_drift.
# ---------------------------------------------------------------------------

PORTABLE_CODEBOOK_CELLS = (26, 34)  # vec_id range of the landmark cells


def portable_codebook(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[int]]]:
    """The portable integer coarse codebook (the
    vector_topk_ivfpq_portable landmark idiom): quantized components
    of embeddings vec_id 26..33, cell = vec_id - 26. A BOUNDED driver
    artifact (8 cells × dims ints) — the codebook is what a real
    deployment ships to executors as a broadcast/literal anyway."""
    from pyspark.sql import functions as F

    lo, hi = PORTABLE_CODEBOOK_CELLS
    rows = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
        .where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select(
            (F.col("vec_id") - lo).alias("cell"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.floor(x * 1000 + 0.5).cast("bigint"),
            ).alias("q"),
        )
        .collect()
    )
    return sorted((r["cell"], list(r["q"])) for r in rows)


def ivf_assign_changes(vectors: DataFrame, codebook: list[tuple[int, list[int]]]) -> DataFrame:
    """(vec_id, embedding) → insert-change rows (cell, is_new, d):
    nearest codebook cell by exact integer L2 with the (d, cell)
    tie-break, computed ENTIRELY map-side — the codebook is a literal
    array, per-row distance is zip_with+aggregate, argmin is
    array_min over (d, cell) structs (lexicographic struct ordering =
    the batch query's ORDER BY d, cell). Zero shuffles before the
    tiny keyed fold; works identically on a batch frame or a stream
    (pure column ops), which is what the differential test exploits."""
    from pyspark.sql import functions as F

    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000 + 0.5).cast("bigint"),
    )
    with_q = vectors.withColumn("_q", q)

    def cell_dist(cb: list[int], cell: int):
        lit_cb = F.array(*[F.lit(int(v)) for v in cb])
        d = F.aggregate(
            F.zip_with(F.col("_q"), lit_cb, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return F.struct(d.alias("d"), F.lit(cell).cast("bigint").alias("cell"))

    best = F.array_min(F.array(*[cell_dist(cb, c) for c, cb in codebook]))
    return with_q.withColumn("best", best).select(
        F.col("best.cell").alias("cell"),
        (F.col("vec_id") % 2).alias("is_new"),
        F.col("best.d").alias("d"),
        F.lit("insert").alias("_change_type"),
    )


def stream_maintain_ivf_drift_view(
    vector_stream: DataFrame,
    codebook: list[tuple[int, list[int]]],
    state_path: str,
    query_name: str = "ivf_drift_view",
    checkpoint: str | None = None,
):
    """Maintain per-(cell, is_new) distortion state from a STREAM of
    arriving vectors: map-side codebook assignment (no retrain, no
    shuffle) + the standard IVM insert fold. State is (cell, is_new,
    n_rows, d) — O(cells), independent of stream length; the drift
    readout derives means at read time (``read_ivf_drift``). The
    streaming form of plans/extended_ops7.ivf_incremental_assign_drift
    (differential-tested against it)."""
    return stream_maintain_view(
        ivf_assign_changes(vector_stream, codebook),
        state_path,
        group_cols=["cell", "is_new"],
        sum_cols=["d"],
        query_name=query_name,
        checkpoint=checkpoint,
    )


def read_ivf_drift(spark: SparkSession, state_path: str) -> DataFrame:
    """Per-cell drift readout from the maintained state: base vs
    arrival counts and mean distortion (truncating DIV, matching the
    batch query's integer means)."""
    from pyspark.sql import functions as F

    s = read_view(spark, state_path)
    base = s.where(F.col("is_new") == 0).select(
        "cell", F.col(ivm.N_COL).alias("n_base"), F.col("d").alias("_bd")
    )
    new = s.where(F.col("is_new") == 1).select(
        "cell", F.col(ivm.N_COL).alias("n_new"), F.col("d").alias("_nd")
    )
    return (
        base.join(new, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.expr("CAST(coalesce(_bd, 0) AS BIGINT) DIV greatest(coalesce(n_base, 0), 1)").alias("base_mean_d"),
            F.expr("CAST(coalesce(_nd, 0) AS BIGINT) DIV greatest(coalesce(n_new, 0), 1)").alias("new_mean_d"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# Streaming maintained connected components: the cluster half of the
# streaming dedup loop (the pair half is
# stream_maintain_minhash_index_view — chain its pairs table into this
# view's pairs stream and the corpus's duplicate-cluster assignment
# stays current per micro-batch).
# ---------------------------------------------------------------------------


def stream_maintain_cc_view(
    pairs_stream: DataFrame,
    labels_path: str,
    query_name: str = "cc_view",
    checkpoint: str | None = None,
):
    """Streaming twin of ``graph.cc_incremental_absorb``: each
    micro-batch of undirected edges ``(a_id, b_id)`` folds into the
    maintained component assignment at ``labels_path`` — a MERGE-ON-
    READ versioned table keyed on ``id`` whose resolved view always
    equals the one-shot ``min_label_components`` fixpoint over every
    edge absorbed so far (the batch operator's driver-oracled
    equivalence, graph_cc_incremental_equivalence).

    Per refresh the sink reads the resolved assignment, absorbs the
    batch (broadcast endpoint probe + contracted-graph CC + broadcast
    remap — history never re-floods), and commits ONLY the rows whose
    label changed or are new (an (id, lab) anti join against the
    pre-batch state), so a refresh writes O(members of merged
    components + new nodes), never the corpus. Reads resolve
    last-writer-wins per id (``versioned_read_merged``); compaction
    folds the deltas exactly like Delta OPTIMIZE after MERGE.

    Exactly-once: a SINGLE table commit per batch, epoch-guarded — a
    replayed micro-batch (foreachBatch is at-least-once) either finds
    its epoch already committed and no-ops, or re-reads the untouched
    pre-batch state and recomputes the identical delta. Kill-and-
    resume and stream==batch equality are pinned in
    tests/test_streaming_materialized.py."""
    from data_lake_with_spark_spark.operators import graph as G

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(labels_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        pairs = batch_df.select("a_id", "b_id")
        try:
            state = V.versioned_read_merged(spark, labels_path, ["id"])
        except FileNotFoundError:
            state = None
        new_state = G.cc_incremental_absorb(state, pairs)
        delta = (
            new_state
            if state is None
            else new_state.join(state, ["id", "lab"], "left_anti")
        )
        V.versioned_append(
            delta,
            labels_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = pairs_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def read_cc_labels(
    spark: SparkSession, labels_path: str, version: int | None = None
) -> DataFrame:
    """The maintained component assignment (id, lab) as of ``version``
    (default latest), resolved last-writer-wins per id."""
    return V.versioned_read_merged(spark, labels_path, ["id"], version)


def stream_maintain_cc_cdc_view(
    changes_stream: DataFrame,
    edges_path: str,
    labels_path: str,
    query_name: str = "cc_cdc_view",
    checkpoint: str | None = None,
):
    """``stream_maintain_cc_view`` WITH a retraction story: the feed
    carries ``(a_id, b_id, _change_type)`` rows, ``insert`` adding
    edges and ``delete`` removing them (the change an insert-only fold
    cannot express — removing an edge can SPLIT a component). Mirrors
    the retractable top-k sink's architecture: the sink additionally
    maintains the EDGE table the feed describes (merge-on-read, one
    O(batch) append of alive + tombstone rows per refresh), because
    once an edge is deleted the splitting verdict is unrecoverable from
    the label state alone — the induced-subgraph rescan
    (``graph.cc_incremental_retract``) reads the surviving edges of
    JUST the affected components from it. Deletes apply first (against
    the pre-batch edge set), then inserts absorb
    (``graph.cc_incremental_absorb``); the resolved label table always
    equals the one-shot fixpoint over the surviving edge set.

    Feed preconditions (raised loudly, never silently merged): an
    unknown ``_change_type`` fails the micro-batch in-plan before any
    commit (the sink cannot reconstruct what the row meant); an edge
    both inserted and deleted in ONE micro-batch raises (intra-batch
    order is unknowable at the sink). Deleting an edge that was never
    absorbed is a documented no-op (nothing to split).

    Exactly-once across the TWO-table commit: the epoch guard sits on
    the LABELS commit, which happens last. A replayed micro-batch that
    finds its epoch already on the EDGE table (crash between the
    commits) reads the edge state one version back — the exact
    pre-batch edge set — skips the double-append, and recomputes the
    identical label delta. Label rows whose node lost its last
    surviving edge commit as TOMBSTONES (the one-shot node universe is
    edge endpoints), so a later re-insert re-absorbs them cleanly."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators import graph as G
    from data_lake_with_spark_spark.sources.versioned import TOMBSTONE

    EKEYS = ["a_id", "b_id"]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        eid = epoch_id if checkpoint is not None else None
        if eid is not None:
            last = applied_epoch(labels_path)
            if last is not None and eid <= last:
                return
        spark = batch_df.sparkSession
        ct = F.col("_change_type")
        is_insert = (
            F.when(ct == "insert", F.lit(True))
            .when(ct == "delete", F.lit(False))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "stream_maintain_cc_cdc_view: unknown"
                            " _change_type="
                        ),
                        F.coalesce(ct, F.lit("NULL")),
                    )
                ).cast("boolean")
            )
        )
        ins = batch_df.where(is_insert).select(*EKEYS).dropDuplicates(EKEYS)
        dels = batch_df.where(~is_insert).select(*EKEYS).dropDuplicates(EKEYS)
        if not ins.join(dels, EKEYS).isEmpty():
            raise ValueError(
                "stream_maintain_cc_cdc_view: an edge appears as both "
                "insert and delete in one micro-batch — intra-batch order "
                "is unknowable at the sink; compact the feed so each edge "
                "carries one net change per batch"
            )
        # pre-batch edge set; a replay after the edges commit reads one
        # version back (the exact pre-batch state)
        edges_done = eid is not None and (applied_epoch(edges_path) or -1) >= eid
        try:
            v = V.current_version(edges_path)
            ev = v - 1 if edges_done else v
            pre_edges = (
                None
                if ev is None or ev < 0
                else V.versioned_read_merged(
                    spark, edges_path, EKEYS, version=ev
                ).select(*EKEYS)
            )
        except FileNotFoundError:
            pre_edges = None
        if pre_edges is not None:
            pre_edges = pre_edges.localCheckpoint(eager=True)
        try:
            labels = V.versioned_read_merged(spark, labels_path, ["id"])
        except FileNotFoundError:
            labels = None
        new_labels = labels
        dels_known = (
            dels.join(pre_edges, EKEYS) if pre_edges is not None else None
        )
        if (
            labels is not None
            and dels_known is not None
            and not dels_known.isEmpty()
        ):
            surviving = pre_edges.join(dels, EKEYS, "left_anti")
            new_labels = G.cc_incremental_retract(
                new_labels, surviving, dels_known
            )
        if not ins.isEmpty():
            new_labels = G.cc_incremental_absorb(new_labels, ins)
        # commit edges FIRST (alive inserts + tombstoned deletes), then
        # the epoch-guarded labels delta
        if not edges_done:
            edge_delta = ins.withColumn(TOMBSTONE, F.lit(False)).unionByName(
                (dels_known if dels_known is not None else dels.limit(0))
                .withColumn(TOMBSTONE, F.lit(True))
            )
            V.versioned_append(
                edge_delta,
                edges_path,
                meta=None if eid is None else {"epoch_id": eid},
            )
        if labels is None:
            delta = new_labels
        else:
            changed = new_labels.join(labels, ["id", "lab"], "left_anti")
            dropped = (
                labels.join(new_labels.select("id"), "id", "left_anti")
                .withColumn(TOMBSTONE, F.lit(True))
            )
            delta = changed.withColumn(TOMBSTONE, F.lit(False)).unionByName(
                dropped
            )
        V.versioned_append(
            delta,
            labels_path,
            meta=None if eid is None else {"epoch_id": eid},
        )

    w = changes_stream.writeStream.foreachBatch(sink).queryName(query_name)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()
