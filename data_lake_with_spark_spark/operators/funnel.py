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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_users(
    events: DataFrame,
    stages: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> list[DataFrame]:
    """Per-stage frames ``(user_col, _t)``: each user who reached the
    stage, with their first qualifying timestamp."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        cand = events.where(F.col(type_col) == stage).select(user_col, ts_col)
        if prev is not None:
            cand = cand.join(prev, user_col).where(F.col(ts_col) >= F.col("_t"))
            if max_gap_seconds is not None:
                cand = cand.where(
                    F.unix_millis(F.col(ts_col)) - F.unix_millis(F.col("_t"))
                    <= max_gap_seconds * 1000
                )
            cand = cand.drop("_t")
        prev = cand.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        frames.append(prev)
    return frames


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Long-form funnel: one row per stage — ``(stage_idx, stage,
    n_users)`` — users monotonically non-increasing down the funnel."""
    frames = funnel_stage_users(
        events, stages, ts_col, user_col, type_col, max_gap_seconds
    )
    counted = [
        f.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"), F.lit(stage).alias("stage"), "n_users"
        )
        for i, (stage, f) in enumerate(zip(stages, frames))
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionAll(c)
    return out.orderBy("stage_idx")
