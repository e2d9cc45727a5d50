"""CDC patterns on plain parquet: SCD2 merge emulation and skew-salted
aggregation.

The reference's upsert is insert-if-absent (SURVEY §2.5); real lakes
also need update semantics. Without Delta's ``MERGE INTO`` (no Delta
jars in this environment — it is the drop-in upgrade), SCD2 is
emulated with anti-join + union + window, which is exactly what MERGE
compiles to on immutable files anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a batch of updates to an SCD2 history table.

    ``current``: (key, attrs..., valid_from, valid_to NULL=open).
    ``updates``: (key, attrs..., ts) — reduced to the latest row per
    key (max_by on ts) before applying.

    Semantics per key: if the open row's attrs differ from the update
    (or no open row exists), close the open row at the update ts and
    append a new open version. No-op updates (same attrs) change
    nothing — applying the same batch twice is idempotent.
    """
    latest = updates.groupBy(key).agg(
        F.max_by(F.struct(*attrs), ts_col).alias("_u"), F.max(ts_col).alias("_uts")
    )
    upd = latest.select(
        key, *[F.col(f"_u.{a}").alias(f"_u_{a}") for a in attrs], "_uts"
    )
    attrs_differ = F.lit(False)
    for a in attrs:
        attrs_differ = attrs_differ | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))

    cur = current.join(upd, key, "left_outer")
    is_open = F.col(valid_to).isNull()
    has_change = F.col("_uts").isNotNull() & attrs_differ

    # existing rows: open+changed rows get closed, everything else kept
    kept = cur.select(
        key,
        *attrs,
        F.col(valid_from),
        F.when(is_open & has_change, F.col("_uts")).otherwise(F.col(valid_to)).alias(valid_to),
    )
    # new open versions: changed keys + brand-new keys
    open_rows = current.where(is_open).select(key, *attrs)
    # attrs_differ is null-safe, so a missing open row (all-null attrs)
    # also counts as changed → brand-new keys insert correctly
    changed_new = (
        upd.join(open_rows, key, "left_outer")
        .where(attrs_differ)
        .select(
            key,
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_uts").alias(valid_from),
            F.lit(None).cast("timestamp").alias(valid_to),
        )
    )
    return kept.unionByName(changed_new)


def salted_sum(
    df: DataFrame, keys: list[str], value_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Skew-resistant sum: pre-aggregate on (keys, random salt) so a
    hot key spreads over ``salt_buckets`` reducers, then combine.
    Equivalent to groupBy(keys).sum — Spark's own partial aggregation
    usually covers this; explicit salting is for the cases where the
    hot key's partials still overwhelm one reducer (e.g. after a join
    that re-partitioned on the skewed key).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value_col).alias("_psum"))
    return partial.groupBy(*keys).agg(F.sum("_psum").alias(f"sum_{value_col}"))


CHANGELOG_STATE_COLS = [
    "user_id",
    "n_changes",
    "first_event_id",
    "last_event_id",
    "last_ts",
    "last_op",
    "net",
    "last_value",
]


def compact_changelog(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Fold a micro-batch of I/U/D changelog rows into last-write-wins
    net-effect state — the incremental twin of the
    ``cdc_changelog_compact`` query (same semantics: the newest row
    per key by (ts, event_id) decides op/net/value, a trailing delete
    tombstones the key, n_changes counts every folded change).

    ``batch`` rows: (user_id, event_id, ts, op ∈ 'I'/'U'/'D', value).
    ``state``: a prior result of this fold (or None). The fold is
    ASSOCIATIVE over batch boundaries because the state keeps the last
    (ts, event_id) — merging state with a new batch re-runs the same
    newest-row-wins rule over one state row + the batch's compacted
    row per key, so any batch split of the changelog produces the
    same final state as one shot (pinned by pytest batch-equality).
    Shuffle shape per refresh: one window keyed on user_id over the
    micro-batch, then prior state splits on the batch's distinct key
    set (broadcast-able semi/anti joins) — only TOUCHED keys' state
    rows enter the merge window, untouched rows pass through
    unchanged. Window/shuffle work is O(changes); the untouched
    passthrough is a narrow scan (the state rewrite itself is
    O(state) I/O, as for any full-snapshot view)."""
    key_w = W.partitionBy("user_id")
    compacted = (
        batch.select(
            "user_id",
            "event_id",
            "ts",
            "op",
            "value",
            F.row_number()
            .over(key_w.orderBy(F.desc("ts"), F.desc("event_id")))
            .alias("rn"),
            F.count(F.lit(1)).over(key_w).cast("bigint").alias("n_changes"),
            F.min("event_id").over(key_w).alias("first_event_id"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_changes",
            "first_event_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("op").alias("last_op"),
            F.when(F.col("op") == "D", F.lit("DELETE"))
            .otherwise(F.lit("UPSERT"))
            .alias("net"),
            F.when(F.col("op") == "D", F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("last_value"),
        )
    )
    if state is None:
        return compacted.select(*CHANGELOG_STATE_COLS)
    state = state.select(*CHANGELOG_STATE_COLS)
    batch_keys = batch.select("user_id").distinct()
    touched = state.join(batch_keys, "user_id", "left_semi")
    untouched = state.join(batch_keys, "user_id", "left_anti")
    merged = touched.unionByName(compacted)
    resolved = (
        merged.select(
            *CHANGELOG_STATE_COLS,
            F.row_number()
            .over(key_w.orderBy(F.desc("last_ts"), F.desc("last_event_id")))
            .alias("rn"),
            F.sum("n_changes").over(key_w).cast("bigint").alias("_n"),
            F.min("first_event_id").over(key_w).alias("_f"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("_n").alias("n_changes"),
            F.col("_f").alias("first_event_id"),
            "last_event_id",
            "last_ts",
            "last_op",
            "net",
            "last_value",
        )
    )
    return untouched.unionByName(resolved)
