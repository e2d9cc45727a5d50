"""Round-13 batch: the last maintained-state readouts converted from
pytest-only to driver-oracleable rows — the KMV distinct state in BOTH
regimes (exact while a group holds < k hashes; the (k−1)·2³² div θ
estimator once full, with the portable md5 hash family replicated in
the oracle), the retractable top-k leaderboard (deletes and
value-lowering updates handled by bounded rescan-on-evict instead of
the max-monoid refusal — round-12 verdict directive #3), and the
maintained MinHash band index that absorbs insert batches in O(batch)
and emits exactly the NEW near-dup pairs per batch (directive #7 — the
streaming-ingest dedup story).

Same registry discipline as plans/extended_ops.py..8: integer-exact
outputs, full DuckDB oracles, no cartesian products, no Python in the
hot path. Extensions beyond the reference's own surface (reference
scope: /root/reference/etl.py — no counterpart there). Each entry is
sf0.01-gated at birth via tests/test_oracle_parity_sf01.py
CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators import ingest as ING
from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.operators.plan_cache import shared
from data_lake_with_spark_spark.plans.llm_ops import (
    MINHASH_BANDS,
    MINHASH_PORTABLE_ORACLE,
    MINHASH_ROWS,
    _mh_portable_sigs,
)
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _epoch_insert_batches(ev: DataFrame, cols: list[str], replay: bool) -> list[DataFrame]:
    """The standard 3-epoch insert feed over a shared events
    projection: epoch e inserts event_id % 3 == e; with ``replay``,
    epoch 2 additionally REPLAYS all of epoch 0 (at-least-once
    delivery — a no-op for idempotent states, which is the claim the
    oracles verify)."""
    eid = F.col("event_id")

    def tagged(df: DataFrame) -> DataFrame:
        return df.select(*cols, F.lit("insert").alias("_change_type"))

    b2 = tagged(ev.where(eid % 3 == 2))
    if replay:
        b2 = b2.unionByName(tagged(ev.where(eid % 3 == 0)))
    return [tagged(ev.where(eid % 3 == 0)), tagged(ev.where(eid % 3 == 1)), b2]


# ---------------------------------------------------------------------------
# Maintained KMV state, EXACT regime == COUNT(DISTINCT) recompute.
# ---------------------------------------------------------------------------

# k = 4096 keeps every group below capacity at every committed scale
# (1 500 distinct users per event_type at sf0.1), so the readout's
# kk < k branch — a plain count of retained distinct hashes — is the
# active one and the state is EXACT: count(distinct md5-32 hash) =
# count(distinct user_id) absent 32-bit collisions, verified zero
# among all user_ids at sf0.001/0.01/0.1 (round-13 check).
IVM_KMV_EXACT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_distinct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "ivm_kmv_exact_regime",
    oracle=IVM_KMV_EXACT_ORACLE,
    tags=("ivm", "cdc", "sketch"),
)
def ivm_kmv_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED KMV (theta-sketch) distinct state in its EXACT
    regime, driver-oracled (round-12 verdict directive #2): while a
    group holds fewer than k distinct hashes the state IS the distinct
    set and ``ivm.read_kmv_distinct`` returns a plain count — so with
    k = 4096 (above every group's cardinality at every committed
    scale) the maintained estimate equals DuckDB's COUNT(DISTINCT)
    exactly. The feed is the 3-epoch insert stream WITH a wholesale
    epoch-0 replay: k-minima union is idempotent per id, so
    at-least-once delivery is provably a no-op — the same claim the
    bitmap equivalence pins, now for the bounded-state sketch that
    replaces the bitmap when the id range is unbounded.

    Scale shape: one shared() events projection feeds all four insert
    branches; each fold hashes the batch (JVM md5, no Python),
    distincts, and window-prunes to k per group — O(batch + k·groups)
    per refresh; the readout is one agg over ≤ k·groups state rows."""
    ev = shared(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    )
    state: DataFrame | None = None
    for batch in _epoch_insert_batches(ev, ["event_type", "user_id"], replay=True):
        state = ivm.maintain_kmv(state, batch, ["event_type"], "user_id", k=4096)
    return ivm.read_kmv_distinct(state, ["event_type"], k=4096).orderBy("event_type")


# ---------------------------------------------------------------------------
# Maintained KMV state, ESTIMATOR regime — portable-hash oracle.
# ---------------------------------------------------------------------------

# k = 64 puts sf0.01 (150 distinct per group) and sf0.1 (1 500) in the
# estimator regime while sf0.001 (15) exercises the exact branch — the
# oracle replicates BOTH: the md5-32 hash family (same 'kmv1' salt),
# the k smallest distinct hashes, theta = the 64th, and the integer
# estimator (63·2³²) // theta. This converts the KMV ESTIMATOR itself
# from rows-only/pytest evidence into a full value-hash driver row.
IVM_KMV_ESTIMATE_ORACLE = """
WITH hs AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'kmv1'), 1, 8)
              AS BIGINT) AS h
  FROM events
), r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hs
), s AS (
  SELECT event_type, COUNT(*) AS kk,
         MAX(CASE WHEN rn = 64 THEN h END) AS theta
  FROM r WHERE rn <= 64 GROUP BY event_type
)
SELECT event_type,
       CAST(CASE WHEN kk < 64 THEN kk
                 ELSE (63 * 4294967296) // theta END AS BIGINT) AS est_distinct
FROM s
ORDER BY event_type
"""


@register(
    "ivm_kmv_estimate_portable",
    oracle=IVM_KMV_ESTIMATE_ORACLE,
    tags=("ivm", "cdc", "sketch", "approx"),
)
def ivm_kmv_estimate_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED KMV state in its ESTIMATOR regime, driver-oracled:
    with k = 64 the per-group state saturates (150 distinct users per
    event_type at the driver's sf0.01) and the readout switches to the
    integer theta estimator (k−1)·2³² div θ — which the oracle
    recomputes hash-for-hash, because the portable md5-32 family (salt
    'kmv1', the same family ``operators/sketches.kmv_sketch`` uses) is
    expressible in DuckDB. Bit-identical cross-engine in BOTH regimes
    (sf0.001 stays exact at 15 distinct — the oracle's CASE covers it),
    so the approximation itself is now value-hash-verified, not just
    recall-tested. Same 3-epoch + epoch-0-replay feed as the exact
    regime: replays must not move the k-minima.

    Scale shape: identical to ivm_kmv_exact_regime — the state is 64
    rows per group regardless of id range; each fold is O(batch) hash
    + distinct + window prune."""
    ev = shared(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    )
    state: DataFrame | None = None
    for batch in _epoch_insert_batches(ev, ["event_type", "user_id"], replay=True):
        state = ivm.maintain_kmv(state, batch, ["event_type"], "user_id", k=64)
    return ivm.read_kmv_distinct(state, ["event_type"], k=64).orderBy("event_type")


# ---------------------------------------------------------------------------
# Retractable top-k leaderboard == recompute UNDER DELETES + LOWERING.
# ---------------------------------------------------------------------------

# The histogram feed's retraction shape, pointed at the top-k state:
#   epoch 0  INSERT event_id % 3 == 0
#   epoch 1  INSERT % 3 == 1; UPDATE (HALVING — value-LOWERING, the
#            move the max monoid cannot absorb) for % 3 == 0 ∧ % 7 == 0
#   epoch 2  INSERT % 3 == 2; DELETE % 3 == 0 ∧ % 7 ≠ 0 ∧ % 11 == 0
IVM_TOPK_RETRACT_ORACLE = """
WITH final_rows AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           // (CASE WHEN event_id % 3 = 0 AND event_id % 7 = 0
                    THEN 2 ELSE 1 END) AS val_cents
  FROM events
  WHERE NOT (event_id % 3 = 0 AND event_id % 7 <> 0
             AND event_id % 11 = 0)
), ranked AS (
  SELECT event_type, event_id, val_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY val_cents DESC, event_id) AS rnk
  FROM final_rows
)
SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id, val_cents
FROM ranked
WHERE rnk <= 3
ORDER BY event_type, rnk
"""


@register(
    "ivm_topk_retraction_equivalence",
    oracle=IVM_TOPK_RETRACT_ORACLE,
    tags=("ivm", "cdc"),
)
def ivm_topk_retraction_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTABLE maintained top-k leaderboard, driver-oracled
    (round-12 verdict directive #3): per-group top-3 advanced via
    ``ivm.maintain_topk_retractable`` through a feed carrying inserts,
    value-LOWERING updates (halved cents — the change the plain max
    monoid refuses) and deletes equals the full top-3 recompute over
    the surviving rows. The fold detects eviction-risk groups (any
    delete; any update not provably value-raising) and rescans JUST
    those from the post-change base feed; every other group rides the
    O(batch + k·groups) fast path. Random-feed equivalence (including
    within-batch insert+delete) is hypothesis-pinned in
    tests/test_properties.py::test_maintain_topk_retractable_matches_bruteforce.

    Scale shape: per refresh one risk-stats hash-agg over the batch,
    broadcast anti/semi joins on the bounded risk-group list, and a
    top-k rescan semi-join-pruned to the changed groups — never the
    full base table."""
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
            "event_type",
            "event_id",
            F.col("cents").alias("val_cents"),
            F.lit(change).alias("_change_type"),
        )

    upd_base = ev.where(updated)
    batches = [
        tagged(ev.where(eid % 3 == 0), "insert"),
        tagged(ev.where(eid % 3 == 1), "insert")
        .unionByName(tagged(upd_base, "update_preimage"))
        .unionByName(
            tagged(
                upd_base.withColumn("cents", F.expr("cents div 2")),
                "update_postimage",
            )
        ),
        tagged(ev.where(eid % 3 == 2), "insert")
        .unionByName(tagged(ev.where(deleted), "delete")),
    ]
    # Post-change base feed per epoch (what a lakehouse table would
    # hold after applying the batch — here derived lazily from the
    # same shared projection):
    final_val = F.when(updated, F.expr("cents div 2")).otherwise(F.col("cents"))
    base_all = ev.select(
        "event_id", "event_type", final_val.alias("val_cents"), eid.alias("_eid")
    )
    # bases[0] is the POST-EPOCH-0 truth: the halving update happens in
    # epoch 1, so epoch 0's base carries the UNhalved cents (round-13
    # ADVICE low — final_val here was only harmless because epoch 0 is
    # insert-only and no rescan reads it; don't leave the trap armed)
    bases = [
        ev.where(eid % 3 == 0).select(
            "event_id", "event_type", F.col("cents").alias("val_cents")
        ),
        base_all.where((F.col("_eid") % 3).isin(0, 1)).drop("_eid"),
        base_all.where(
            ~(
                (F.col("_eid") % 3 == 0)
                & (F.col("_eid") % 7 != 0)
                & (F.col("_eid") % 11 == 0)
            )
        ).drop("_eid"),
    ]
    state: DataFrame | None = None
    for batch, base in zip(batches, bases):
        state = ivm.maintain_topk_retractable(
            state, batch, base, ["event_type"], "event_id", "val_cents", k=3
        )
    w = W.partitionBy("event_type").orderBy(F.desc("val_cents"), F.asc("event_id"))
    return (
        state.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("event_type", "rnk", "event_id", "val_cents")
        .orderBy("event_type", "rnk")
    )


# ---------------------------------------------------------------------------
# Maintained MinHash band index: per-batch NEW pairs == one-shot pairs.
# ---------------------------------------------------------------------------


@register(
    "ingest_minhash_newpairs_equivalence",
    # the equivalence target IS the one-shot portable pipeline's
    # oracle: same hash family, banding, verify, threshold
    oracle=MINHASH_PORTABLE_ORACLE,
    tags=("dedup", "llm", "ivm", "minhash"),
)
def ingest_minhash_newpairs_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAINTAINED MinHash-band near-dup index, driver-oracled
    (round-12 verdict directive #7): documents arrive in 3 batches
    (doc_id % 3); each batch's portable signatures are absorbed into
    the index and ``ingest.minhash_index_new_pairs`` emits exactly the
    near-dup pairs that are NEW that batch (≥ one side arriving, band
    collision, exact-Jaccard-verified at 0.5). The union over batches
    must equal the ONE-SHOT portable MinHash pair list over the whole
    corpus — every pair discovered exactly once, in the batch of its
    later-arriving side. This is the streaming-ingest dedup loop every
    training pipeline needs: O(batch·bands) probe work per arrival,
    never a corpus re-pair.

    Scale shape: per batch, signatures are per-row HOF folds over the
    batch only (history never re-tokenizes — the index persists
    signatures+shingles, the ``_shingles`` companion discipline of
    operators/ingest.py); candidates come from the batch-posting ⋈
    index-posting equi-join on (band, key); verify touches collision
    survivors only."""
    docs = shared(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    out: DataFrame | None = None
    state: DataFrame | None = None
    for epoch in range(3):
        batch_sigs = _mh_portable_sigs(docs.where(F.col("doc_id") % 3 == epoch))
        new_pairs = ING.minhash_index_new_pairs(
            state, batch_sigs, MINHASH_BANDS, MINHASH_ROWS, threshold=0.5
        )
        out = new_pairs if out is None else out.unionByName(new_pairs)
        state = batch_sigs if state is None else state.unionByName(batch_sigs)
    return out.orderBy("a_id", "b_id")
