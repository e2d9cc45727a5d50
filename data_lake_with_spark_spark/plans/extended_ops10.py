"""Round-14 batch: epoch-partitioned EXPIRING distinct states — the
windowed-expiry answer to "distinct over a sliding window" for the
three non-retractable sketch states (round-13 verdict directive #5:
bits, k-minima and register maxes are not subtractable, so the signed-
count histogram pattern does not transfer; retiring whole epoch
buckets is the standard alternative). Driver-oracled equivalences for
the bitmap (EXACT — the maintained windowed readout equals
COUNT(DISTINCT) over exactly the rows whose bucket survives the final
watermark) and the KMV estimator (PORTABLE — the md5-32 family, the
per-bucket trim, the live-bucket merge and the (k−1)·2³² div θ readout
replicated hash-for-hash in DuckDB); the HLL windowed variant shares
the merge shape and is property-differentialed in
tests/test_properties.py. Plus the FOURTH distinct regime (directive
#8): exact + unbounded id range + row-level retraction via signed
per-(group, id) multiplicities, oracled under a delete-bearing feed
(ivm_distinct_retractable_equivalence).

Same registry discipline as plans/extended_ops.py..9: integer-exact
outputs, full DuckDB oracles, no cartesian products (the watermark is
a 1-row broadcast), no Python in the hot path. Extensions beyond the
reference's own surface (reference scope: /root/reference/etl.py — no
counterpart there). Each entry is sf0.01-gated at birth via
tests/test_oracle_parity_sf01.py CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators import ivm
from data_lake_with_spark_spark.operators import similarity as SIM
from data_lake_with_spark_spark.operators.plan_cache import shared
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# The windowed feed both equivalences share: bucket = event_id % 10 (a
# stand-in for a day/hour epoch — every residue is populated at every
# committed scale), arriving in FOUR epochs of advancing bucket ranges
# so expiry fires mid-stream, with the final epoch additionally
# delivering (a) a wholesale REPLAY of the bucket-7 rows (at-least-once
# duplicate delivery — must be a no-op for these idempotent merges) and
# (b) a LATE re-delivery of bucket-4 rows, by then beyond the horizon —
# dropped on arrival, exactly the verdict the one-shot live filter
# gives them. horizon = 3 → live buckets {7, 8, 9} at watermark 9.
# ---------------------------------------------------------------------------


def _windowed_feed(ev: DataFrame, cols: list[str]) -> list[DataFrame]:
    b = F.col("bucket")

    def tagged(df: DataFrame) -> DataFrame:
        return df.select(*cols, "bucket", F.lit("insert").alias("_change_type"))

    return [
        tagged(ev.where(b <= 3)),
        tagged(ev.where((b >= 4) & (b <= 6))),
        tagged(ev.where((b >= 7) & (b <= 8))),
        tagged(ev.where(b == 9))
        .unionByName(tagged(ev.where(b == 7)))  # duplicate delivery
        .unionByName(tagged(ev.where(b == 4))),  # late, beyond horizon
    ]


IVM_BITMAP_WINDOWED_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
WHERE event_id % 10 > 6
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "ivm_bitmap_windowed_equivalence",
    oracle=IVM_BITMAP_WINDOWED_ORACLE,
    tags=("ivm", "cdc", "sketch", "window"),
)
def ivm_bitmap_windowed_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-PARTITIONED expiring bitmap state, driver-oracled
    (round-13 verdict directive #5): per-event-type user bitmaps keyed
    by epoch bucket, advanced through the 4-epoch windowed feed with
    horizon 3 — buckets 0-3 retire when the watermark reaches 6,
    4-5 at 8, 6 at 9 — must equal COUNT(DISTINCT) over exactly the
    rows whose bucket survives the final watermark (% 10 > 6). The
    final epoch's duplicate delivery (bucket 7 replayed) is a no-op by
    OR-idempotence, and its late bucket-4 rows are dropped on arrival:
    their bucket is already beyond the horizon, the same verdict the
    oracle's static filter renders. Retirement is bucket deletion — a
    filter against a 1-row broadcast watermark — never a rescan; this
    is the retraction story the insert-only bitmap state supports
    (``operators/ivm.py`` windowed family).

    Scale shape: one shared() events projection feeds all six feed
    branches; each fold is one hash-agg on (group, bucket, chunk) +
    the watermark broadcast; the readout ORs live buckets then
    popcounts. State bounded by horizon · O(id_range/32) per group."""
    ev = shared(
        _t(spark, sf_dir, "events").select(
            "event_type",
            "user_id",
            F.expr("pmod(event_id, 10)").cast("bigint").alias("bucket"),
        )
    )
    state: DataFrame | None = None
    for batch in _windowed_feed(ev, ["event_type", "user_id"]):
        state = ivm.maintain_bitmap_windowed(
            state, batch, ["event_type"], "user_id", "bucket", horizon=3
        )
    return ivm.read_bitmap_windowed_distinct(state, ["event_type"]).orderBy(
        "event_type"
    )


# k = 16 saturates every group's live window at sf0.01+ (the estimator
# regime) while sf0.001 may sit in either regime — the oracle's CASE
# covers both, replicating the md5-32 'kmv1' family, the live-row
# distinct-hash set, the k smallest and the (k−1)·2³² div θ estimator.
# The live-bucket merge of per-bucket k-minima equals the one-shot
# sketch over the live rows exactly (a hash among the union's k
# smallest has < k smaller hashes globally, hence < k smaller in its
# own bucket, hence survived its bucket's trim), so the windowed
# ESTIMATOR itself is value-hash-verified.
IVM_KMV_WINDOWED_ORACLE = """
WITH live AS (
  SELECT event_type, user_id FROM events WHERE event_id % 10 > 6
), hs AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'kmv1'), 1, 8)
              AS BIGINT) AS h
  FROM live
), r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hs
), s AS (
  SELECT event_type, COUNT(*) AS kk,
         MAX(CASE WHEN rn = 16 THEN h END) AS theta
  FROM r WHERE rn <= 16 GROUP BY event_type
)
SELECT event_type,
       CAST(CASE WHEN kk < 16 THEN kk
                 ELSE (15 * 4294967296) // theta END AS BIGINT) AS est_distinct
FROM s
ORDER BY event_type
"""


@register(
    "ivm_kmv_windowed_portable",
    oracle=IVM_KMV_WINDOWED_ORACLE,
    tags=("ivm", "cdc", "sketch", "approx", "window"),
)
def ivm_kmv_windowed_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-PARTITIONED expiring KMV state, driver-oracled (round-13
    verdict directive #5, the bounded-state sibling of the windowed
    bitmap): a k=16 k-minima sketch per (event_type, bucket) advanced
    through the same 4-epoch feed — duplicate delivery and
    beyond-horizon late rows included — read out by merging the live
    buckets' hashes and re-taking the k smallest. The oracle
    recomputes the whole pipeline hash-for-hash in DuckDB over the
    statically-filtered live rows, covering both readout regimes
    (exact below k, the integer theta estimator at capacity). State is
    horizon · k rows per group REGARDLESS of id range — the windowed
    distinct you deploy when user ids are unbounded and the bitmap's
    O(id_range/32) per-bucket cost is not affordable.

    Scale shape: per refresh O(batch) JVM md5 hashing + distinct + a
    per-(group, bucket) window trim; the watermark is a 1-row
    broadcast; readout trims ≤ horizon·k rows per group."""
    ev = shared(
        _t(spark, sf_dir, "events").select(
            "event_type",
            "user_id",
            F.expr("pmod(event_id, 10)").cast("bigint").alias("bucket"),
        )
    )
    state: DataFrame | None = None
    for batch in _windowed_feed(ev, ["event_type", "user_id"]):
        state = ivm.maintain_kmv_windowed(
            state, batch, ["event_type"], "user_id", "bucket", horizon=3, k=16
        )
    return ivm.read_kmv_windowed_distinct(state, ["event_type"], k=16).orderBy(
        "event_type"
    )


# ---------------------------------------------------------------------------
# Exact retractable distinct (signed multiplicities) == COUNT(DISTINCT)
# under a delete-bearing feed — the fourth distinct regime (round-13
# verdict directive #8): exact + unbounded id range + row-level
# retraction, at O(live distinct ids) state.
#   epoch 0  INSERT event_id % 3 == 0
#   epoch 1  INSERT % 3 == 1; plus a same-key UPDATE pre/post pair for
#            % 3 == 0 ∧ % 7 == 0 (a value change that must be a NET
#            NO-OP for multiplicities: −1 then +1 on the same user)
#   epoch 2  INSERT % 3 == 2; DELETE % 3 == 0 ∧ % 11 == 0 (a user's
#            multiplicity decrements; the user stays counted while any
#            other event of theirs survives)
IVM_DISTINCT_RETRACT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
WHERE NOT (event_id % 3 = 0 AND event_id % 11 = 0)
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "ivm_distinct_retractable_equivalence",
    oracle=IVM_DISTINCT_RETRACT_ORACLE,
    tags=("ivm", "cdc"),
)
def ivm_distinct_retractable_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT RETRACTABLE distinct state (signed per-(group, id)
    multiplicities — ``ivm.maintain_distinct_exact``), driver-oracled:
    advanced through a 3-epoch feed carrying inserts, a same-key
    update pre/post pair (net multiplicity no-op) and deletes, the
    readout must equal COUNT(DISTINCT user_id) over the surviving
    rows. Deleting one event of a multi-event user decrements that
    user's multiplicity without uncounting them; the compaction drop
    at multiplicity 0 is what retires fully-deleted users — the
    regime bitmap (no retraction), KMV/HLL (estimates) and the
    windowed family (epoch-grain expiry only) cannot serve.

    Scale shape: one shared() events projection feeds all feed
    branches; each fold is one hash-agg + one outer-merge join
    touching only changed (group, id) rows; the readout is a row
    count per group over O(live distinct) state."""
    ev = shared(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    )
    eid = F.col("event_id")

    def tagged(df: DataFrame, change: str) -> DataFrame:
        return df.select(
            "event_type", "user_id", F.lit(change).alias("_change_type")
        )

    upd = ev.where((eid % 3 == 0) & (eid % 7 == 0))
    batches = [
        tagged(ev.where(eid % 3 == 0), "insert"),
        tagged(ev.where(eid % 3 == 1), "insert")
        .unionByName(tagged(upd, "update_preimage"))
        .unionByName(tagged(upd, "update_postimage")),
        tagged(ev.where(eid % 3 == 2), "insert")
        .unionByName(tagged(ev.where((eid % 3 == 0) & (eid % 11 == 0)), "delete")),
    ]
    state: DataFrame | None = None
    for batch in batches:
        state = ivm.maintain_distinct_exact(state, batch, ["event_type"], "user_id")
    return ivm.read_distinct_exact(state, ["event_type"]).orderBy("event_type")


# ---------------------------------------------------------------------------
# Incrementally maintained connected components (the cluster half of
# the streaming dedup loop): absorbing any batch split of an edge list
# equals the one-shot min-label fixpoint. Two equivalences — the
# kernel alone on the embedding near-dup graph (same graph and oracle
# as graph_connected_components), and the full composed loop where the
# maintained MinHash band index emits the per-batch NEW pairs that
# feed the absorb (cluster maintenance without ever re-pairing or
# re-flooding history).
# ---------------------------------------------------------------------------


def _mh_clusters_oracle(n_iter: int) -> str:
    """Compose the one-shot portable-MinHash pair list (llm_ops.
    MINHASH_PORTABLE_ORACLE, reused verbatim as a CTE chain) with the
    unrolled min-label/pointer-jump CC rounds of lakehouse_ops.
    _cc_oracle — the SQL twin of "cluster the near-dup pair graph"."""
    from data_lake_with_spark_spark.plans.llm_ops import MINHASH_PORTABLE_ORACLE

    head, final = MINHASH_PORTABLE_ORACLE.rsplit("\nSELECT i.a_id", 1)
    pairs_select = "SELECT i.a_id" + final.rsplit("ORDER BY", 1)[0]
    ctes = [
        head
        + ", mh_pairs AS MATERIALIZED (\n"
        + pairs_select
        + """), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM mh_pairs
  UNION ALL SELECT b_id, a_id FROM mh_pairs
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM ed
), l0 AS MATERIALIZED (
  SELECT id, id AS lab FROM nodes
)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", l{i} AS MATERIALIZED (
  SELECT l.id, LEAST(LEAST(l.lab, pj.lab), MIN(n.lab)) AS lab
  FROM l{i - 1} l
  JOIN l{i - 1} pj ON pj.id = l.lab
  JOIN ed ON ed.src = l.id
  JOIN l{i - 1} n ON n.id = ed.dst
  GROUP BY l.id, l.lab, pj.lab
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT lab AS component, CAST(COUNT(*) AS BIGINT) AS n_members"
        f"\nFROM l{n_iter} GROUP BY lab"
        "\nORDER BY n_members DESC, component"
    )


def _cc_incr_oracle() -> str:
    # The incremental absorb converges to the TRUE fixpoint, so its
    # unrolled twin must be at least as deep as the fixpoint at every
    # committed scale — at sf0.1 the vec_id<400 near-dup graph needs 9
    # pointer-jump rounds (8 leaves one long component split in two,
    # which is why graph_connected_components pins BOTH sides at 8);
    # 10 adds a round of margin at trivial oracle cost.
    from data_lake_with_spark_spark.plans.lakehouse_ops import _cc_oracle

    return _cc_oracle(10)


@register(
    "graph_cc_incremental_equivalence",
    oracle=_cc_incr_oracle(),
    tags=("graph", "dedup", "ivm", "iterative"),
)
def graph_cc_incremental_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally MAINTAINED connected components
    (operators/graph.cc_incremental_absorb): the near-dup edge list of
    graph_connected_components arrives in 3 batches (mixed by a
    deterministic hash of the pair) and is folded into a maintained
    (id, lab) assignment — endpoints resolve to current labels via a
    broadcast probe, only the O(batch)-sized CONTRACTED label graph
    iterates, and a broadcast old→new mapping remaps the state. The
    component histogram after the last absorb must equal the one-shot
    min-label/pointer-jump SQL twin, unrolled past the fixpoint at
    every committed scale (10 rounds — see _cc_incr_oracle; the
    absorb converges, so unlike graph_connected_components there is
    no pinned-round escape hatch) — the invariant "lab = component
    min id over the union of edges so far" survives every absorb.
    Random-split equivalence is hypothesis-pinned in
    tests/test_cc_incremental.py.

    Scale shape: per batch the state is broadcast-probed (never
    shuffled, never re-flooded) and the iterative kernel touches only
    the contracted graph; at 100 TB the state is a versioned table
    committing only CHANGED rows per batch
    (streaming/materialized.stream_maintain_cc_view)."""
    from data_lake_with_spark_spark.operators import graph as GR

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = (
        SIM.lsh_near_pairs(emb, threshold=0.35)
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    state: DataFrame | None = None
    for epoch in range(3):
        batch = pairs.where(F.pmod(F.col("a_id") * 7 + F.col("b_id"), F.lit(3)) == epoch)
        state = GR.cc_incremental_absorb(state, batch, id_col="id")
    return (
        state.groupBy(F.col("lab").alias("component"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "component")
    )


@register(
    "ingest_dedup_clusters_maintained",
    oracle=_mh_clusters_oracle(6),
    tags=("dedup", "llm", "ivm", "minhash", "graph", "iterative"),
)
def ingest_dedup_clusters_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED streaming dedup loop, maintained end to end:
    documents arrive in 3 batches (doc_id % 3); each batch is signed
    (llm_ops._mh_portable_sigs), probed against the maintained MinHash
    band index for exactly the near-dup pairs NEW this batch
    (ingest.minhash_index_new_pairs — the round-13 driver-oracled
    equivalence), and those pair deltas fold into the maintained
    cluster assignment (graph.cc_incremental_absorb). The final
    duplicate-cluster histogram must equal the one-shot SQL twin:
    the portable MinHash pair list over the WHOLE corpus
    (MINHASH_PORTABLE_ORACLE's chain, reused verbatim) flooded to
    components by the unrolled min-label/pointer-jump rounds. This is
    the loop a 100 TB training-data pipeline runs on every ingest:
    O(batch·bands) index probe + O(batch) contracted-graph clustering
    per arrival — history is never re-tokenized, re-paired, or
    re-flooded.

    Scale shape: batch signatures are per-row HOF folds; the index
    probe is a posting equi-join on (band, key); the cluster absorb
    broadcast-probes and broadcast-remaps the label state; every
    maintained table commits O(batch) rows."""
    from data_lake_with_spark_spark.operators import graph as GR
    from data_lake_with_spark_spark.operators import ingest as ING
    from data_lake_with_spark_spark.plans.llm_ops import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        _mh_portable_sigs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sig_state: DataFrame | None = None
    labels: DataFrame | None = None
    for epoch in range(3):
        batch_sigs = _mh_portable_sigs(
            docs.where(F.col("doc_id") % 3 == epoch)
        ).localCheckpoint(eager=True)
        new_pairs = ING.minhash_index_new_pairs(
            sig_state, batch_sigs, MINHASH_BANDS, MINHASH_ROWS, threshold=0.5
        ).localCheckpoint(eager=True)
        labels = GR.cc_incremental_absorb(labels, new_pairs.select("a_id", "b_id"))
        sig_state = (
            batch_sigs
            if sig_state is None
            else sig_state.unionByName(batch_sigs)
        )
    return (
        labels.groupBy(F.col("lab").alias("component"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "component")
    )


def _cc_retract_oracle() -> str:
    # One-shot flooding over exactly the SURVIVING edges — the deleted
    # subset (a+b) % 5 == 0 filtered out inside the pairs CTE; unrolled
    # to 10 rounds for the same converging-fixpoint reason as
    # _cc_incr_oracle (deleting edges can only lengthen shortest
    # in-component paths, never past the intact graph's 9-round need).
    from data_lake_with_spark_spark.plans.lakehouse_ops import _cc_oracle

    return _cc_oracle(10, pair_filter="(a.vec_id + b.vec_id) % 5 <> 0")


@register(
    "graph_cc_retraction_equivalence",
    oracle=_cc_retract_oracle(),
    tags=("graph", "ivm", "cdc", "dedup", "iterative"),
)
def graph_cc_retraction_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTABLE maintained connected components
    (operators/graph.cc_incremental_retract): the near-dup edge list
    is absorbed in 2 batches, then every edge with (a_id + b_id) % 5
    == 0 is DELETED — the change the absorb fold cannot express
    (removing an edge can split a component; min labels are not
    subtractable). The retract routes exactly the components the
    deleted edges touch to an induced-subgraph rescan (broadcast
    endpoint→label probe, broadcast membership semi-join, the
    surviving edge list broadcast-probed so it streams) and passes
    every other component through — the same bounded-rescan discipline
    as the retractable top-k. The final histogram must equal one-shot
    flooding over ONLY the surviving edges; endpoints whose last edge
    died drop from the state, exactly the one-shot node universe.
    Random-delete equivalence and the retract→re-absorb round trip are
    pinned in tests/test_cc_incremental.py.

    Scale shape: O(affected members + their edges) rescan per delete
    batch, never a corpus re-flood; the state scans once for the
    pass-through anti join."""
    from data_lake_with_spark_spark.operators import graph as GR

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = (
        SIM.lsh_near_pairs(emb, threshold=0.35)
        .select("a_id", "b_id")
        .localCheckpoint(eager=True)
    )
    state: DataFrame | None = None
    for epoch in range(2):
        batch = pairs.where(
            F.pmod(F.col("a_id") * 7 + F.col("b_id"), F.lit(2)) == epoch
        )
        state = GR.cc_incremental_absorb(state, batch, id_col="id")
    doomed = F.pmod(F.col("a_id") + F.col("b_id"), F.lit(5)) == 0
    state = GR.cc_incremental_retract(
        state, pairs.where(~doomed), pairs.where(doomed)
    )
    return (
        state.groupBy(F.col("lab").alias("component"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "component")
    )
