"""Incrementally maintained connected components
(operators/graph.cc_incremental_absorb): absorbing any batch split of
an edge list must preserve the invariant "lab = min member id of the
node's component over the union of edges so far", i.e. equal the
one-shot ``min_label_components`` fixpoint after every batch. The
lifecycles here pin the specific hazards of the contract:
cross-batch chain merges, a later-arriving node that becomes the new
component minimum, batches that merge nothing (the contracted graph is
empty and the iterative kernel must be skipped, not run on an empty
frame), and duplicate / reversed re-deliveries of known edges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import graph as G


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a_id bigint, b_id bigint")


def _labels(df):
    return {r["id"]: r["lab"] for r in df.collect()}


def _oneshot(spark, edges):
    return _labels(G.min_label_components(_pairs(spark, edges)))


def test_first_batch_equals_oneshot(spark):
    edges = [(1, 2), (3, 4), (2, 3)]
    got = _labels(G.cc_incremental_absorb(None, _pairs(spark, edges)))
    assert got == _oneshot(spark, edges)


def test_cross_batch_chain_merge(spark):
    # Batch 1 makes {1,2} and {3,4}; batch 2's single edge (2,3) must
    # merge them transitively into min-label 1.
    s1 = G.cc_incremental_absorb(None, _pairs(spark, [(1, 2), (3, 4)]))
    assert _labels(s1) == {1: 1, 2: 1, 3: 3, 4: 3}
    s2 = G.cc_incremental_absorb(s1, _pairs(spark, [(2, 3)]))
    assert _labels(s2) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_late_arriving_new_minimum_relabels_whole_component(spark):
    # Component {5,6,7} labeled 5; node 0 arrives later attached to 7:
    # the maintained label must drop to 0 for every member.
    s1 = G.cc_incremental_absorb(None, _pairs(spark, [(5, 6), (6, 7)]))
    s2 = G.cc_incremental_absorb(s1, _pairs(spark, [(0, 7)]))
    assert _labels(s2) == {0: 0, 5: 0, 6: 0, 7: 0}


def test_batch_that_merges_nothing_skips_the_kernel(spark):
    # Batch 2 re-delivers a known edge (reversed) and adds a fresh
    # disjoint pair: no existing labels merge, the contracted graph is
    # empty for the re-delivery and trivial for the new pair.
    s1 = G.cc_incremental_absorb(None, _pairs(spark, [(1, 2)]))
    s2 = G.cc_incremental_absorb(s1, _pairs(spark, [(2, 1), (8, 9)]))
    assert _labels(s2) == {1: 1, 2: 1, 8: 8, 9: 8}


def test_duplicate_redelivery_is_a_noop(spark):
    edges = [(1, 2), (2, 3)]
    s1 = G.cc_incremental_absorb(None, _pairs(spark, edges))
    s2 = G.cc_incremental_absorb(s1, _pairs(spark, edges))
    assert _labels(s2) == _labels(s1) == _oneshot(spark, edges)


def test_multiway_merge_across_three_prior_components(spark):
    # Three components from batch 1; one batch-2 star merges all of
    # them plus two new nodes through a single new hub.
    s1 = G.cc_incremental_absorb(
        None, _pairs(spark, [(10, 11), (20, 21), (30, 31)])
    )
    s2 = G.cc_incremental_absorb(
        s1, _pairs(spark, [(50, 11), (50, 21), (50, 31), (50, 51)])
    )
    want = _oneshot(
        spark,
        [(10, 11), (20, 21), (30, 31), (50, 11), (50, 21), (50, 31), (50, 51)],
    )
    assert _labels(s2) == want == {k: 10 for k in [10, 11, 20, 21, 30, 31, 50, 51]}


def test_three_batch_split_equals_oneshot_on_deep_path(spark):
    # Path 0..29 split by edge index residue: the per-batch contracted
    # graphs are themselves chains, exercising the inner kernel's
    # pointer jumping across batches.
    edges = [(i, i + 1) for i in range(29)]
    state = None
    for r in range(3):
        batch = [e for j, e in enumerate(edges) if j % 3 == r]
        state = G.cc_incremental_absorb(state, _pairs(spark, batch))
    assert _labels(state) == _oneshot(spark, edges) == {i: 0 for i in range(30)}


# ---------------------------------------------------------------------------
# Hypothesis differential: random edge lists, random batch splits —
# incremental absorb over the batches == one-shot fixpoint. Each
# iterative absorb is a Spark-job cascade, so examples stay small.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_cc_incremental_matches_oneshot_on_random_splits(spark, data):
    n_edges = data.draw(st.integers(min_value=1, max_value=14), label="n_edges")
    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=11),
                st.integers(min_value=0, max_value=11),
            ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
            min_size=n_edges,
            max_size=n_edges,
        ),
        label="edges",
    )
    n_batches = data.draw(st.integers(min_value=1, max_value=3), label="n_batches")
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=len(edges),
            max_size=len(edges),
        ),
        label="assign",
    )
    state = None
    for b in range(n_batches):
        batch = [e for e, a in zip(edges, assign) if a == b]
        if not batch:
            continue
        state = G.cc_incremental_absorb(state, _pairs(spark, batch))
    want = _oneshot(spark, edges)
    got = {} if state is None else _labels(state)
    assert got == want


# ---------------------------------------------------------------------------
# Edge retraction (cc_incremental_retract): affected components rescan
# from their induced surviving subgraph; everything else passes through.
# ---------------------------------------------------------------------------


def _retract(spark, state, surviving, deleted):
    return G.cc_incremental_retract(
        state, _pairs(spark, surviving), _pairs(spark, deleted)
    )


def test_retract_splits_a_path_component(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    s = G.cc_incremental_absorb(None, _pairs(spark, edges))
    got = _labels(_retract(spark, s, [(1, 2), (3, 4)], [(2, 3)]))
    assert got == {1: 1, 2: 1, 3: 3, 4: 3} == _oneshot(spark, [(1, 2), (3, 4)])


def test_retract_that_keeps_connectivity_is_label_stable(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    s = G.cc_incremental_absorb(None, _pairs(spark, tri))
    got = _labels(_retract(spark, s, [(1, 2), (2, 3)], [(1, 3)]))
    assert got == {1: 1, 2: 1, 3: 1}


def test_retract_last_edge_drops_both_endpoints(spark):
    edges = [(1, 2), (8, 9)]
    s = G.cc_incremental_absorb(None, _pairs(spark, edges))
    got = _labels(_retract(spark, s, [(1, 2)], [(8, 9)]))
    assert got == {1: 1, 2: 1} == _oneshot(spark, [(1, 2)])


def test_retract_leaves_untouched_components_alone(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21)]
    s = G.cc_incremental_absorb(None, _pairs(spark, edges))
    surviving = [(1, 2), (10, 11), (20, 21)]
    got = _labels(_retract(spark, s, surviving, [(2, 3)]))
    assert got == _oneshot(spark, surviving)
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_retract_then_reabsorb_round_trips(spark):
    edges = [(1, 2), (2, 3)]
    s = G.cc_incremental_absorb(None, _pairs(spark, edges))
    before = _labels(s)
    s2 = _retract(spark, s, [(1, 2)], [(2, 3)])
    s3 = G.cc_incremental_absorb(s2, _pairs(spark, [(2, 3)]))
    assert _labels(s3) == before == {1: 1, 2: 1, 3: 1}


def test_retract_isolating_a_mid_component_node(spark):
    # star around 5: deleting one spoke drops only that leaf
    edges = [(5, 6), (5, 7), (5, 8)]
    s = G.cc_incremental_absorb(None, _pairs(spark, edges))
    got = _labels(_retract(spark, s, [(5, 6), (5, 7)], [(5, 8)]))
    assert got == {5: 5, 6: 5, 7: 5}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_cc_retract_matches_oneshot_on_random_deletes(spark, data):
    n_edges = data.draw(st.integers(min_value=2, max_value=12), label="n_edges")
    edges = list(
        dict.fromkeys(
            data.draw(
                st.lists(
                    st.tuples(
                        st.integers(min_value=0, max_value=9),
                        st.integers(min_value=0, max_value=9),
                    ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
                    min_size=n_edges,
                    max_size=n_edges,
                ),
                label="edges",
            )
        )
    )
    kill = data.draw(
        st.lists(st.booleans(), min_size=len(edges), max_size=len(edges)),
        label="kill",
    )
    deleted = [e for e, k in zip(edges, kill) if k]
    surviving = [e for e, k in zip(edges, kill) if not k]
    state = G.cc_incremental_absorb(None, _pairs(spark, edges))
    if deleted:
        state = _retract(spark, state, surviving, deleted)
    got = _labels(state)
    want = _oneshot(spark, surviving) if surviving else {}
    assert got == want


def test_many_batch_absorb_endurance_and_compaction(spark, tmp_path):
    # 14 single-edge absorbs building one long path: pins that the
    # per-absorb stats-reset checkpoint keeps plan growth bounded (a
    # lazy-return implementation re-plans 2^batches trees and dies
    # long before 14), and that compacting the streaming view's
    # merge-on-read label table preserves the resolved assignment.
    from data_lake_with_spark_spark.sources import versioned as V
    from data_lake_with_spark_spark.streaming import materialized as MV

    edges = [(i, i + 1) for i in range(14)]
    state = None
    for e in edges:
        state = G.cc_incremental_absorb(state, _pairs(spark, [e]))
    assert _labels(state) == {i: 0 for i in range(15)}

    # persist the same history through the streaming sink's table
    # shape (append deltas keyed on id), then compact and re-resolve
    labels_path = str(tmp_path / "cc_endurance_labels")
    prev = None
    for e in edges[:6]:
        cur = G.cc_incremental_absorb(
            prev if prev is None else V.versioned_read_merged(
                spark, labels_path, ["id"]
            ),
            _pairs(spark, [e]),
        )
        old = (
            None
            if prev is None
            else V.versioned_read_merged(spark, labels_path, ["id"])
        )
        delta = cur if old is None else cur.join(old, ["id", "lab"], "left_anti")
        V.versioned_append(delta, labels_path)
        prev = cur
    before = {
        (r["id"], r["lab"])
        for r in MV.read_cc_labels(spark, labels_path).collect()
    }
    assert before == {(i, 0) for i in range(7)}
    V.compact(spark, labels_path, keys=["id"])
    after = {
        (r["id"], r["lab"])
        for r in MV.read_cc_labels(spark, labels_path).collect()
    }
    assert after == before


def test_absorb_state_probe_is_broadcast_never_shuffled(spark):
    # The 100 TB posture of the fold: the state side of every join in
    # an absorb must stream against a BROADCAST batch-derived side —
    # a shuffle of the state would make the refresh O(corpus). Build
    # one absorb plan over an existing state and assert every join is
    # broadcast-hash (no SortMergeJoin, no cartesian); same for the
    # retract's membership/remap joins.
    s1 = G.cc_incremental_absorb(None, _pairs(spark, [(1, 2), (3, 4)]))
    batch = _pairs(spark, [(2, 3), (8, 9)])
    edges = G.undirected_edges(batch).localCheckpoint(eager=True)
    endpoints = edges.select(F.col("src").alias("id")).distinct()
    probe = s1.join(F.broadcast(endpoints), "id")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # full operator output plans (absorb + retract): broadcast-only
    out = G.cc_incremental_absorb(s1, batch)
    ret = G.cc_incremental_retract(
        out, _pairs(spark, [(1, 2), (8, 9)]), _pairs(spark, [(2, 3), (3, 4)])
    )
    for frame in (out, ret):
        fplan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in fplan, fplan
        assert "SortMergeJoin" not in fplan, fplan
