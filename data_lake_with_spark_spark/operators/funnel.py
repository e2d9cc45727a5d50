"""Parameterized N-stage conversion funnel over an event log.

Generalizes the fixed 3-stage funnel query (reference analog: the
songplays fact pipeline's event semantics, /root/reference/etl.py:239-294
— user behavior over a timestamped log): an ordered list of stage
event types, each reached at-or-after the user's first qualifying
timestamp of the previous stage, optionally within ``max_gap_seconds``
of it.

Scale shape: each stage is one type-filtered two-column pass over the
log, aggregated per user (map-side partial min) and equi-joined to the
previous stage's per-user frame. Stage frames are user-cardinality —
orders of magnitude smaller than the log — so the joins broadcast and
the log is never shuffled as a whole. The gap test compares integer
epoch-millis (exact; double epoch seconds drift on sub-second ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.time import epoch_ms
from data_lake_with_spark_spark.operators.plan_cache import shared

# A funnel stage: either an event-type string (matched against
# ``type_col``) or a (label, arbitrary-boolean-Column) pair — e.g.
# ("big_purchase", (F.col("event_type") == "purchase") & (F.col("value") > 100)).
Stage = "str | tuple[str, Column]"


def _normalize_stages(
    stages: Sequence, type_col: str
) -> list[tuple[str, Column]]:
    norm: list[tuple[str, Column]] = []
    for s in stages:
        if isinstance(s, str):
            norm.append((s, F.col(type_col) == s))
        else:
            label, pred = s
            norm.append((label, pred))
    return norm


def funnel_stage_users(
    events: DataFrame,
    stages: Sequence,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> list[DataFrame]:
    """Per-stage frames ``(user_col, _t)``: each user who reached the
    stage, with their first qualifying timestamp. Stages are event-type
    strings or (label, predicate Column) pairs — a predicate stage
    filters the log on any boolean expression, so the same operator
    expresses type funnels, value-threshold funnels, and
    property-match funnels (predicates still push to the scan).

    Each stage's survivor frame is a tracked shared() cache: stage k
    feeds BOTH stage k+1's qualifying join and the caller's count —
    uncached, the chain re-derived stage k's whole subtree per
    consumer (a 3-stage funnel cost 1+2+3 = 6 event scans instead of
    3; round-10 scan audit). Survivors are per-user minima — small
    relative to the log, exactly what executor storage is for."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for _label, pred in _normalize_stages(stages, type_col):
        cand = events.where(pred).select(user_col, ts_col)
        if prev is not None:
            cand = cand.join(prev, user_col).where(F.col(ts_col) >= F.col("_t"))
            if max_gap_seconds is not None:
                cand = cand.where(
                    epoch_ms(ts_col) - epoch_ms("_t")
                    <= max_gap_seconds * 1000
                )
            cand = cand.drop("_t")
        prev = shared(cand.groupBy(user_col).agg(F.min(ts_col).alias("_t")))
        frames.append(prev)
    return frames


def funnel_counts(
    events: DataFrame,
    stages: Sequence,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Long-form funnel: one row per stage — ``(stage_idx, stage,
    n_users)`` — users monotonically non-increasing down the funnel.
    Stage labels are the event-type string or the first element of a
    (label, predicate) pair."""
    frames = funnel_stage_users(
        events, stages, ts_col, user_col, type_col, max_gap_seconds
    )
    labels = [label for label, _ in _normalize_stages(stages, type_col)]
    counted = [
        f.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"), F.lit(label).alias("stage"), "n_users"
        )
        for i, (label, f) in enumerate(zip(labels, frames))
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionAll(c)
    return out.orderBy("stage_idx")
