"""Iterate-to-fixpoint defaults for the iterative graph operators
(round-6 verdict directive #2).

A fixed unroll silently mislabels any graph whose diameter exceeds
the unroll depth, so the operators now default to convergence-stop
(``n_iter=None`` + ``max_iter``) with the pinned ``n_iter`` form kept
as the unrolled-SQL-oracle twin. These tests build graphs DEEPER than
the registered pinned unrolls (8 CC rounds / 6 k-core rounds / 3 LPA
rounds) and assert the converging default still reaches the exact
fixpoint — and exits before ``max_iter`` (via
``LAST_CONVERGENCE_ROUNDS``), i.e. the stop probe actually fires.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import graph as G


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a_id bigint, b_id bigint")


def test_min_label_components_default_fixpoint_on_long_path(spark):
    # Path 0-1-...-39: diameter 39 > any small unroll; pointer jumping
    # converges in ~log2(40) rounds. Every node must flood to label 0.
    pairs = _pairs(spark, [(i, i + 1) for i in range(39)])
    labels = {r["id"]: r["lab"] for r in G.min_label_components(pairs).collect()}
    assert labels == {i: 0 for i in range(40)}
    rounds = G.LAST_CONVERGENCE_ROUNDS["min_label_components"]
    assert rounds < 30  # exited early, not at the max_iter bound
    # The pinned twin with a too-shallow unroll does NOT converge here
    # (the trap the converging default removes): 2 rounds of pointer
    # jumping reach ~4 hops, far short of 39.
    shallow = {
        r["id"]: r["lab"]
        for r in G.min_label_components(pairs, n_iter=2).collect()
    }
    assert shallow != labels


def test_kcore_default_peels_chain_deeper_than_pinned_unroll(spark):
    # Triangle 100-101-102 with a pendant chain 0-1-...-8 hung off
    # node 100. 2-core peeling eats the chain one node per round
    # (9 rounds > the registered pinned unroll of 6); fixpoint = the
    # triangle alone, each surviving node at degree 2.
    chain = [(i, i + 1) for i in range(8)] + [(8, 100)]
    tri = [(100, 101), (101, 102), (102, 100)]
    pairs = _pairs(spark, chain + tri)
    got = {r["id"]: r["degree"] for r in G.kcore(pairs, k=2).collect()}
    assert got == {100: 2, 101: 2, 102: 2}
    assert G.LAST_CONVERGENCE_ROUNDS["kcore"] <= 11
    # Pinned 6 rounds under-peel this graph — chain remnants survive.
    pinned = {
        r["id"]: r["degree"] for r in G.kcore(pairs, k=2, n_iter=6).collect()
    }
    assert pinned != got


def test_label_propagation_default_is_a_fixpoint(spark):
    # Two 4-cliques bridged by one edge. The converging default must
    # return a state one further synchronous round leaves unchanged,
    # and must equal the pinned twin run for the same round count.
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14) if b >= 10]
    pairs = _pairs(spark, k4a + k4b + [(3, 10)])
    labels = {r["id"]: r["lab"] for r in G.label_propagation(pairs).collect()}
    rounds = G.LAST_CONVERGENCE_ROUNDS["label_propagation"]
    assert rounds < 30
    same = {
        r["id"]: r["lab"]
        for r in G.label_propagation(pairs, n_iter=rounds).collect()
    }
    one_more = {
        r["id"]: r["lab"]
        for r in G.label_propagation(pairs, n_iter=rounds + 1).collect()
    }
    assert labels == same == one_more
    # Community structure: each clique's interior agrees on one label.
    assert len({labels[i] for i in (0, 1, 2)}) == 1
    assert len({labels[i] for i in (11, 12, 13)}) == 1


def test_bfs_default_reaches_past_pinned_horizon(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(9)])
    full = {r["id"]: r["hops"] for r in G.bfs_hops(pairs, 0).collect()}
    assert full == {i: i for i in range(10)}
    assert G.LAST_CONVERGENCE_ROUNDS["bfs_hops"] <= 11
    capped = {r["id"]: r["hops"] for r in G.bfs_hops(pairs, 0, n_hops=3).collect()}
    assert capped == {0: 0, 1: 1, 2: 2, 3: 3}


def test_iteration_guards_raise_clear_errors(spark):
    pairs = _pairs(spark, [(0, 1)])
    for fn in (G.min_label_components, G.label_propagation, G.kcore):
        with pytest.raises(ValueError, match="n_iter"):
            fn(pairs, n_iter=0)
        with pytest.raises(ValueError, match="max_iter"):
            fn(pairs, max_iter=0)
    with pytest.raises(ValueError, match="n_hops"):
        G.bfs_hops(pairs, 0, n_hops=0)


def test_pagerank_empty_graph_returns_empty_frame(spark):
    empty = _pairs(spark, [])
    flt = G.pagerank(empty)
    assert flt.columns == ["id", "rank"] and flt.count() == 0
    por = G.pagerank_portable(empty)
    assert por.columns == ["id", "rank_scaled"] and por.count() == 0


def test_sssp_weighted_default_reaches_past_pinned_horizon(spark):
    # Weighted path 0-1-...-14 with cost 5 per hop, plus an expensive
    # shortcut 0-14 at cost 100: true dist(14) = min(70, 100) = 70,
    # which needs 14 relaxation rounds — deeper than the registered
    # pinned unroll of 4. The converging default must find it AND must
    # use the shortcut as an upper bound until relaxation beats it.
    edges = [(i, i + 1, 5) for i in range(14)] + [(0, 14, 100)]
    pairs = spark.createDataFrame(edges, "a_id bigint, b_id bigint, cost bigint")
    dist = {r["id"]: r["dist"] for r in G.sssp_weighted(pairs, 0).collect()}
    assert dist == {i: 5 * i for i in range(14)} | {14: 70}
    assert G.LAST_CONVERGENCE_ROUNDS["sssp_weighted"] < 30
    # The pinned-4 twin caps the frontier: node 14 is reachable only
    # via the costly shortcut inside 4 rounds.
    pinned = {
        r["id"]: r["dist"] for r in G.sssp_weighted(pairs, 0, n_iter=4).collect()
    }
    assert pinned[14] == 100 and pinned[4] == 20 and 10 not in pinned


def test_ktruss_default_peels_cascade_to_fixpoint(spark):
    # K4 {0,1,2,3} (every edge closes 2 triangles — a 4-truss) plus a
    # weakly attached pair {4,5}: triangles (2,3,4) and (2,4,5). Round
    # 1 drops (3,4)/(2,5)/(4,5) (support 1 < 2); that REDUCES (2,4)'s
    # support 2 → 0, so round 2 drops it — a two-round cascade a
    # pinned 1-round peel misses. Fixpoint for k=4 = the K4 alone,
    # every surviving edge reporting support 2.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(2, 4), (3, 4), (2, 5), (4, 5)]
    pairs = _pairs(spark, k4 + tail)
    got = {
        (r["a_id"], r["b_id"]): r["support"]
        for r in G.ktruss(pairs, k=4).collect()
    }
    assert got == {(a, b): 2 for a, b in k4}
    assert G.LAST_CONVERGENCE_ROUNDS["ktruss"] <= 4
    # Pinned 1-round twin under-peels: the cascaded edge (2,4) survives
    # with its (now sub-threshold) support recomputed on the final set.
    pinned = {
        (r["a_id"], r["b_id"]): r["support"]
        for r in G.ktruss(pairs, k=4, n_iter=1).collect()
    }
    assert (2, 4) in pinned and pinned != got


def test_ktruss_k3_keeps_triangles_drops_bridges(spark):
    # Two triangles sharing vertex 2 plus a bridge edge (5, 9): the
    # 3-truss (support >= 1) is exactly the two triangles; the bridge
    # closes no triangle and dies in round 1.
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(2, 3), (3, 4), (2, 4)]
    pairs = _pairs(spark, tri1 + tri2 + [(5, 9)])
    got = {
        (r["a_id"], r["b_id"]): r["support"]
        for r in G.ktruss(pairs, k=3).collect()
    }
    assert got == {(a, b): 1 for a, b in tri1 + tri2}
    assert G.LAST_CONVERGENCE_ROUNDS["ktruss"] <= 3


def test_ktruss_guards(spark):
    pairs = _pairs(spark, [(0, 1)])
    with pytest.raises(ValueError, match="k must be >= 3"):
        G.ktruss(pairs, k=2)
    with pytest.raises(ValueError, match="n_iter"):
        G.ktruss(pairs, n_iter=0)
    with pytest.raises(ValueError, match="max_iter"):
        G.ktruss(pairs, max_iter=0)


def test_converging_kernels_run_no_standalone_probe_actions(spark, monkeypatch):
    """Round-13 verdict directive #2: every converging kernel's stop
    probe rides the round's localCheckpoint job via Observation — no
    kernel may run a standalone count()/collect()/toPandas() action
    per round. Monkeypatch-counted, so the pin is AQE-immune (scheduler
    job counts vary with adaptive stage splitting; driver ACTIONS are
    the contract)."""
    from pyspark.sql import DataFrame

    calls: list[str] = []
    for action in ("count", "collect", "toPandas"):
        orig = getattr(DataFrame, action)

        def spy(self, *a, _orig=orig, _name=action, **kw):
            calls.append(_name)
            return _orig(self, *a, **kw)

        monkeypatch.setattr(DataFrame, action, spy)

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (8, 9)])
    weighted = pairs.withColumn("cost", F.col("a_id").cast("bigint"))
    G.min_label_components(pairs)
    G.label_propagation(pairs)
    G.bfs_hops(pairs, 1)
    G.kcore(pairs, k=2)
    G.sssp_weighted(weighted, 1)
    G.ktruss(_pairs(spark, [(0, 1), (1, 2), (0, 2), (5, 9)]), k=3)
    assert calls == [], f"standalone probe actions ran: {calls}"


def test_lpa_oscillating_input_survives_full_max_iter(spark):
    """Synchronous LPA can oscillate to max_iter — 30 rounds must not
    blow up planning. Regression pin for the LogicalRDD stats
    inheritance bomb (_ckpt_fresh_stats): a round plan that references
    the previous state twice SQUARES the inherited sizeInBytes per
    round — BigInt bit length doubles, and the stats visitor OOMed the
    driver near round 25 before the reset."""
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (5, 6), (7, 8), (8, 9), (9, 1)])
    out = G.label_propagation(pairs, max_iter=30)
    assert out.count() == 9
    assert G.LAST_CONVERGENCE_ROUNDS["label_propagation"] == 30
