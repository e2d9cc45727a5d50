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


def stream_maintain_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    query_name: str = "ivm_view",
):
    """Maintain (group_cols, n_rows, <sum_cols>) from a stream of
    pre-image change rows. Returns the started StreamingQuery
    (availableNow trigger — drain what exists, then stop; swap the
    trigger for a continuous deployment)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain(cur, batch_df, group_cols, sum_cols), state_path
        )

    return (
        changes_stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_maintain_moment_view(
    changes_stream: DataFrame,
    state_path: str,
    group_cols: list[str],
    value_cols: list[str],
    query_name: str = "ivm_moment_view",
):
    """Same loop for the moment-sum state (n, Σx, Σx² per value col) —
    ``ivm.moment_stats(read_view(...))`` derives avg/var/stddev of the
    live view at any pinned refresh."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            cur = read_view(spark, state_path)
        except FileNotFoundError:
            cur = None
        V.versioned_append(
            ivm.maintain_moments(cur, batch_df, group_cols, value_cols), state_path
        )

    return (
        changes_stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
