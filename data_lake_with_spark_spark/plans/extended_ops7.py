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


# ---------------------------------------------------------------------------
# Incremental IVF: assigning ARRIVALS to a frozen codebook, with the
# distortion-drift readout that decides when to retrain.
# ---------------------------------------------------------------------------

# Base/arrival split is deterministic (vec_id parity): the even half
# stands in for the corpus the codebook was "trained" on, the odd half
# for vectors ingested after the index build. Landmark cells are the
# portable integer coarse quantizer (vec_ids 26..33, the
# vector_topk_ivfpq_portable idiom) — frozen regardless of the split,
# exactly like a production codebook that does NOT retrain per batch.
IVF_DRIFT_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS x
  FROM e
), coarse AS (
  SELECT vec_id - 26 AS cell, dim, x AS cx FROM comp
  WHERE vec_id >= 26 AND vec_id < 34
), d2c AS (
  SELECT comp.vec_id, coarse.cell,
         SUM((comp.x - coarse.cx) * (comp.x - coarse.cx)) AS d
  FROM comp JOIN coarse ON comp.dim = coarse.dim
  GROUP BY comp.vec_id, coarse.cell
), assign AS (
  SELECT vec_id, cell, d FROM (
    SELECT vec_id, cell, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS crn
    FROM d2c) WHERE crn = 1
)
SELECT cell,
       CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS n_base,
       CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS n_new,
       CAST(CAST(COALESCE(SUM(d) FILTER (WHERE vec_id % 2 = 0), 0) AS BIGINT)
            // GREATEST(COUNT(*) FILTER (WHERE vec_id % 2 = 0), 1) AS BIGINT)
         AS base_mean_d,
       CAST(CAST(COALESCE(SUM(d) FILTER (WHERE vec_id % 2 = 1), 0) AS BIGINT)
            // GREATEST(COUNT(*) FILTER (WHERE vec_id % 2 = 1), 1) AS BIGINT)
         AS new_mean_d
FROM assign
GROUP BY cell
ORDER BY cell
"""
# ^ COALESCE(...,0) on each side's filtered SUM (round-11 ADVICE):
# the Spark plan emits 0 for a cell whose assigned vectors are all one
# parity (sum CASE..ELSE 0 END), while a bare SUM(d) FILTER over zero
# rows is NULL — the oracle must agree on skewed datasets where a cell
# holds only base or only arrival vectors.


@register(
    "ivf_incremental_assign_drift",
    oracle=IVF_DRIFT_ORACLE,
    tags=("vector", "llm", "ivf", "eval"),
)
def ivf_incremental_assign_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF serving, oracled: new vectors are assigned to
    the FROZEN coarse codebook in O(new·cells) — no retrain, the only
    viable ingest path when the index covers 100 TB — and the readout
    compares per-cell mean quantization distortion of the arrivals
    (odd vec_ids) against the base population (even vec_ids). A cell
    whose new_mean_d rises above base_mean_d is drifting away from its
    centroid: the retrain trigger a production vector store watches.
    Exact integer arithmetic end-to-end (quantized components, integer
    L2, DIV means — Spark DIV and DuckDB // both truncate), so the
    readout hash-matches cross-engine at every sf.

    Scale shape: ONE tracked shared() exploded-component scan;
    landmarks broadcast (8 cells × dims); assignment is one keyed agg
    + row_number per vec_id — identical to the
    ann_recall_nprobe_frontier plan, with the split/drift readout
    replacing the truth panel."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = shared(
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        ).select(
            "vec_id",
            "dim",
            (F.floor(F.col("x") * 1000 + 0.5)).cast("bigint").alias("x"),
        )
    )
    coarse = comp.where((F.col("vec_id") >= 26) & (F.col("vec_id") < 34)).select(
        (F.col("vec_id") - 26).alias("cell"), "dim", F.col("x").alias("cx")
    )
    from pyspark.sql import Window as W

    d2c = (
        comp.join(F.broadcast(coarse), "dim")
        .groupBy("vec_id", "cell")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d"))
    )
    assign = (
        d2c.select(
            "vec_id",
            "cell",
            "d",
            F.row_number().over(W.partitionBy("vec_id").orderBy("d", "cell")).alias("crn"),
        )
        .where(F.col("crn") == 1)
        .select("vec_id", "cell", "d")
    )
    is_base = F.col("vec_id") % 2 == 0
    cnt = lambda cond: F.count(F.when(cond, 1))  # noqa: E731
    return (
        assign.groupBy("cell")
        .agg(
            cnt(is_base).alias("n_base"),
            cnt(~is_base).alias("n_new"),
            F.expr(
                "sum(CASE WHEN vec_id % 2 = 0 THEN d ELSE 0 END) DIV "
                "greatest(count(CASE WHEN vec_id % 2 = 0 THEN 1 END), 1)"
            ).alias("base_mean_d"),
            F.expr(
                "sum(CASE WHEN vec_id % 2 = 1 THEN d ELSE 0 END) DIV "
                "greatest(count(CASE WHEN vec_id % 2 = 1 THEN 1 END), 1)"
            ).alias("new_mean_d"),
        )
        .orderBy("cell")
    )
