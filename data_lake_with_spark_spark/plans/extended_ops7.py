"""Round-11 batch: IVM delta-correctness as an ORACLED equality, and
the registered batch twin of the stream-stream interval join.

Same registry discipline as plans/extended_ops.py..6: integer-exact
or deterministically-rounded outputs, full DuckDB oracles, no
cartesian products, no Python in the hot path. Extensions beyond the
reference's own surface (reference scope: /root/reference/etl.py — no
counterpart there). Registered under the ≤20/round birth cap; each
entry is sf0.01-gated at birth via tests/test_oracle_parity_sf01.py
CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions.time import epoch_ms
from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.operators.joins import range_join_bucketed
from data_lake_with_spark_spark.operators.plan_cache import shared
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# IVM: three CDF-shaped change batches folded through operators/ivm
# must equal the full recompute over the post-change base table.
# ---------------------------------------------------------------------------

# The change feed is derived DETERMINISTICALLY from events so the
# oracle can replay it as plain SQL over the post-change rows:
#   epoch 0  INSERT  every event with event_id % 3 == 0
#   epoch 1  INSERT  every event with event_id % 3 == 1, plus an
#            UPDATE (preimage/postimage pair, value doubled) of every
#            epoch-0 row with event_id % 7 == 0
#   epoch 2  INSERT  every event with event_id % 3 == 2, plus a
#            DELETE of every epoch-0, non-updated row with
#            event_id % 11 == 0
# Values fold as integer CENTS (events.value carries 2 decimals, so
# FLOOR(v*100+0.5) is exact): every intermediate sum is an integer —
# exactly representable in the double accumulators up to 2^53, far
# above any driver scale — so the delta path and the recompute agree
# bit-for-bit on both engines.
IVM_DELTA_ORACLE = """
WITH final_rows AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           * CASE WHEN event_id % 3 = 0 AND event_id % 7 = 0
                  THEN 2 ELSE 1 END AS cents
  FROM events
  WHERE NOT (event_id % 3 = 0 AND event_id % 7 <> 0
             AND event_id % 11 = 0)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents
FROM final_rows
GROUP BY event_type
ORDER BY event_type
"""


@register("ivm_delta_equivalence", oracle=IVM_DELTA_ORACLE, tags=("ivm", "cdc"))
def ivm_delta_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance correctness as a DRIVER-ORACLED
    equality: a sum/count aggregate advanced through three CDF change
    batches (insert / update_preimage+postimage / delete — the
    ``versioned_changes(include_preimages=True)`` shape that
    ``streaming/materialized.py`` folds per micro-batch) must equal
    the full recompute over the post-change base table, which is what
    the DuckDB oracle computes directly. The fold is O(changes) per
    refresh — the property that makes the materialized view viable at
    100 TB, here pinned against recompute at driver scale. The whole
    three-epoch fold composes LAZILY (signed-delta aggs + full-outer
    merges); no action runs at construction."""
    # shared(): the six change branches (3 insert epochs, update
    # pre+post, delete) all derive from this one projection — without
    # it the plan tree scans events 6×
    ev = shared(
        _t(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    eid = F.col("event_id")
    updated = (eid % 3 == 0) & (eid % 7 == 0)
    deleted = (eid % 3 == 0) & (eid % 7 != 0) & (eid % 11 == 0)

    def tagged(df: DataFrame, change: str) -> DataFrame:
        return df.select(
            "event_type", "cents", F.lit(change).alias("_change_type")
        )

    upd_base = ev.where(updated)
    batches = [
        tagged(ev.where(eid % 3 == 0), "insert"),
        tagged(ev.where(eid % 3 == 1), "insert")
        .unionByName(tagged(upd_base, "update_preimage"))
        .unionByName(
            tagged(upd_base.withColumn("cents", F.col("cents") * 2), "update_postimage")
        ),
        tagged(ev.where(eid % 3 == 2), "insert")
        .unionByName(tagged(ev.where(deleted), "delete")),
    ]
    state: DataFrame | None = None
    for batch in batches:
        state = ivm.maintain(state, batch, ["event_type"], ["cents"])
    return state.select(
        "event_type",
        F.col(ivm.N_COL).alias("n_rows"),
        F.col("cents").cast("long").alias("sum_value_cents"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Stream-stream interval join, batch twin (oracled)
# ---------------------------------------------------------------------------

CLICK_PURCHASE_ORACLE = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id AS user_id,
       CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS gap_ms
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL '10 minutes'
ORDER BY click_id, purchase_id
"""


@register(
    "join_click_purchase_within",
    oracle=CLICK_PURCHASE_ORACLE,
    tags=("join", "range", "streaming-twin"),
)
def join_click_purchase_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked STREAM-STREAM interval join
    (``streaming/jobs.click_purchase_stream_join``, 10-minute band):
    each click joined to the same user's purchases strictly after it
    and within 10 minutes. Expressed as the bucketized band join
    (``operators/joins.range_join_bucketed`` — 2 equi-join probes per
    row, never an O(n²) theta join), so the scale shape matches the
    streaming form's bounded state. The streaming side is pinned to
    this result by tests/test_approx_and_skew.py (replay equality)
    and tests/test_streaming.py (kill-and-resume exactly-once)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    out = range_join_bucketed(
        clicks, purchases, by="user_id", left_ts="ts", right_ts="p_ts",
        max_gap_seconds=600,
    )
    # the bucketed join keeps both sides' user_id (equal by the join
    # condition) — project the click side's copy
    return out.select(
        "click_id",
        "purchase_id",
        F.col("l.user_id").alias("user_id"),
        (epoch_ms("p_ts") - epoch_ms("ts")).alias("gap_ms"),
    ).orderBy("click_id", "purchase_id")


CLICK_PURCHASE_OUTER_ORACLE = """
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id AS user_id,
       CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS gap_ms
FROM events c LEFT JOIN events p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL '10 minutes'
WHERE c.event_type = 'click'
ORDER BY click_id, purchase_id
"""


@register(
    "join_click_purchase_outer",
    oracle=CLICK_PURCHASE_OUTER_ORACLE,
    tags=("join", "range", "streaming-twin"),
)
def join_click_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join
    (``streaming/jobs.click_purchase_stream_join_outer``): every click
    emits — with its purchases inside the 10-minute band, or once with
    nulls when none exist (the "conversion or churn" feed). The outer
    band join composes two scalable hash joins (inner bucketized pairs
    ∪ anti-joined unmatched clicks — see
    operators/joins.range_join_bucketed_outer), never a theta join."""
    from data_lake_with_spark_spark.operators.joins import range_join_bucketed_outer

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    out = range_join_bucketed_outer(
        clicks, purchases, by="user_id", left_ts="ts", right_ts="p_ts",
        max_gap_seconds=600,
    )
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        (epoch_ms("p_ts") - epoch_ms("ts")).alias("gap_ms"),
    ).orderBy("click_id", "purchase_id")


# Moments view over the SAME deterministic 3-epoch change feed as
# ivm_delta_equivalence: state is (n, Σcents, Σcents²) — avg and
# variance derive at read time without rescanning the base. Every
# state sum is integer-valued (< 2^53, exact in the double
# accumulators); the derivation formula below is the SAME IEEE ops on
# both engines, so pround(4) agrees bit-for-bit.
IVM_MOMENT_ORACLE = """
WITH final_rows AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           * CASE WHEN event_id % 3 = 0 AND event_id % 7 = 0
                  THEN 2 ELSE 1 END AS cents
  FROM events
  WHERE NOT (event_id % 3 = 0 AND event_id % 7 <> 0
             AND event_id % 11 = 0)
), m AS (
  SELECT event_type,
         COUNT(*) AS n_rows,
         CAST(SUM(cents) AS DOUBLE) AS s,
         CAST(SUM(cents * cents) AS DOUBLE) AS ss
  FROM final_rows GROUP BY event_type
)
SELECT event_type, n_rows,
       FLOOR((s / n_rows) * 1e4 + 0.5) / 1e4 AS avg_cents,
       CASE WHEN n_rows > 1 THEN
         FLOOR(GREATEST((ss - s * s / n_rows) / (n_rows - 1), 0.0) * 1e4 + 0.5) / 1e4
       END AS var_cents
FROM m
ORDER BY event_type
"""


@register("ivm_moment_equivalence", oracle=IVM_MOMENT_ORACLE, tags=("ivm", "cdc"))
def ivm_moment_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-state IVM correctness, driver-oracled: avg/variance kept
    in step through the 3-epoch CDF feed via ``ivm.maintain_moments``
    (state = n, Σx, Σx² as three self-maintainable signed-delta sums)
    must equal the full recompute — the read-time derivation
    (``ivm.moment_stats``) never touches the base table. Same
    integer-cents exactness argument as ivm_delta_equivalence."""
    ev = shared(
        _t(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    eid = F.col("event_id")
    updated = (eid % 3 == 0) & (eid % 7 == 0)
    deleted = (eid % 3 == 0) & (eid % 7 != 0) & (eid % 11 == 0)

    def tagged(df: DataFrame, change: str) -> DataFrame:
        return df.select(
            "event_type", "cents", F.lit(change).alias("_change_type")
        )

    upd_base = ev.where(updated)
    batches = [
        tagged(ev.where(eid % 3 == 0), "insert"),
        tagged(ev.where(eid % 3 == 1), "insert")
        .unionByName(tagged(upd_base, "update_preimage"))
        .unionByName(
            tagged(upd_base.withColumn("cents", F.col("cents") * 2), "update_postimage")
        ),
        tagged(ev.where(eid % 3 == 2), "insert")
        .unionByName(tagged(ev.where(deleted), "delete")),
    ]
    state: DataFrame | None = None
    for batch in batches:
        state = ivm.maintain_moments(state, batch, ["event_type"], ["cents"])
    stats = ivm.moment_stats(state, ["event_type"], ["cents"])
    p4 = lambda c: F.floor(c * 1e4 + 0.5) / 1e4  # noqa: E731 — pround(4)
    return stats.select(
        "event_type",
        F.col(ivm.N_COL).alias("n_rows"),
        p4(F.col("avg_cents")).alias("avg_cents"),
        p4(F.col("var_cents")).alias("var_cents"),
    ).orderBy("event_type")


IVM_JOIN_ORACLE = """
WITH final_rows AS (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           * CASE WHEN event_id % 3 = 0 AND event_id % 7 = 0
                  THEN 2 ELSE 1 END AS cents
  FROM events
  WHERE NOT (event_id % 3 = 0 AND event_id % 7 <> 0
             AND event_id % 11 = 0)
)
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(f.cents) AS BIGINT) AS sum_value_cents
FROM final_rows f JOIN customer c ON f.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY mktsegment
"""


@register("ivm_join_view_equivalence", oracle=IVM_JOIN_ORACLE, tags=("ivm", "cdc", "join"))
def ivm_join_view_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-join IVM correctness, driver-oracled: the
    enriched rollup (events ⋈ customer, summed per market segment)
    advanced through the 3-epoch CDF feed via ``ivm.maintain_join_agg``
    — Δ(fact ⋈ dim) = Δfact ⋈ dim for a static dim, so each refresh
    broadcast-enriches only the CHANGE BATCH and folds signed deltas —
    must equal the full recompute over post-change fact ⋈ dim.
    Change rows whose user misses the dim drop symmetrically on
    insert and delete (inner-view semantics), so state stays
    consistent; the oracle joins the post-change rows the same way."""
    ev = shared(
        _t(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    eid = F.col("event_id")
    updated = (eid % 3 == 0) & (eid % 7 == 0)
    deleted = (eid % 3 == 0) & (eid % 7 != 0) & (eid % 11 == 0)

    def tagged(df: DataFrame, change: str) -> DataFrame:
        return df.select("user_id", "cents", F.lit(change).alias("_change_type"))

    upd_base = ev.where(updated)
    batches = [
        tagged(ev.where(eid % 3 == 0), "insert"),
        tagged(ev.where(eid % 3 == 1), "insert")
        .unionByName(tagged(upd_base, "update_preimage"))
        .unionByName(
            tagged(upd_base.withColumn("cents", F.col("cents") * 2), "update_postimage")
        ),
        tagged(ev.where(eid % 3 == 2), "insert")
        .unionByName(tagged(ev.where(deleted), "delete")),
    ]
    state: DataFrame | None = None
    for batch in batches:
        state = ivm.maintain_join_agg(
            state, batch, dim,
            fact_key="user_id", dim_key="c_custkey",
            group_cols=["c_mktsegment"], sum_cols=["cents"],
        )
    return state.select(
        F.col("c_mktsegment").alias("mktsegment"),
        F.col(ivm.N_COL).alias("n_rows"),
        F.col("cents").cast("long").alias("sum_value_cents"),
    ).orderBy("mktsegment")
