"""Second-scale oracle gate: the driver verifies at sf0.01 while the
default local gate (conftest SF_DIR) runs sf0.001 — data-dependent
failures can hide at the small scale (observed: a DuckDB `1 << 63`
overflow only reachable once user_id ≥ 63). This file re-runs, at the
DRIVER'S scale:

- a ROTATING THIRD of every oracled query (sorted-name index mod 3 ==
  ROUND mod 3 — bump ROUND each round so three rounds cover the whole
  registry),
- every query touched this round (CHANGED_THIS_ROUND),
- and (round-7 verdict directive #4) EVERY oracled query that has never
  held a green row in any driver CORRECTNESS_r*.json — computed from
  the committed files themselves, so as the driver window drains the
  evidence backlog this set shrinks automatically. Until a query holds
  a driver row, the only evidence gap left is which harness ran it,
  never which scale.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from data_lake_with_spark_spark.plans import REGISTRY
from tests.oracle_harness import duckdb_connection, run_one

SF01 = "/root/testdata/sf0.01"

# Bump per round to rotate the third. r13 -> 1.
ROUND = 14

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROTATION = [n for i, n in enumerate(ORACLED) if i % 3 == ROUND % 3]

# Queries whose engine or oracle changed THIS round (always re-gated
# at driver scale regardless of where the rotation sits).
CHANGED_THIS_ROUND = [
    # round-14 births (plans/extended_ops10.py, sf0.01-gated at birth):
    "ivm_bitmap_windowed_equivalence",
    "ivm_kmv_windowed_portable",
    "ivm_distinct_retractable_equivalence",
    "graph_cc_incremental_equivalence",
    "graph_cc_retraction_equivalence",
    "ingest_dedup_clusters_maintained",
    # round-14 engine change: Observation-fused stop probes +
    # _ckpt_fresh_stats (LogicalRDD stats-inheritance reset) across the
    # iterative graph kernels (label_propagation / bfs_hops / kcore /
    # sssp_weighted / min_label_components / ktruss) — every oracled
    # user of those kernels re-gates:
    "graph_bfs_reachability",
    "graph_community_modularity",
    "graph_connected_components",
    "graph_kcore_membership",
    "graph_ktruss_edges",
    "graph_label_propagation",
    "graph_sssp_weighted",
    "spatial_dbscan_grid",
    # round-14 engine change (round-13 ADVICE medium): NULL
    # _change_type counts as unknown in maintain_topk_retractable, and
    # the epoch-0 base feed is built from unhalved cents — the
    # registered user re-gates:
    "ivm_topk_retraction_equivalence",
    # round-14 engine change: band-join __rjb_m_ collision guard is an
    # explicit raise (assert stripped under -O) — registered users of
    # range_join_bucketed_outer re-gate:
    "join_click_purchase_outer",
    "join_range_outer_5min",
]


def _never_driver_verified() -> set[str]:
    """Oracled queries with no green (rows+schema, no err) row in any
    committed driver CORRECTNESS file — the evidence backlog the
    round-7 verdict directed this gate to cover in full."""
    verified: set[str] = set()
    for f in sorted(Path(__file__).resolve().parents[1].glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and not row.get("err")
            ):
                verified.add(name)
    return set(ORACLED) - verified


NEVER_DRIVER_VERIFIED = _never_driver_verified()

NAMES = sorted(set(ROTATION) | set(CHANGED_THIS_ROUND) | NEVER_DRIVER_VERIFIED)



@pytest.fixture(scope="module")
def con01():
    c = duckdb_connection(SF01)
    yield c
    c.close()


def test_gate_width():
    """The judge's round-5 directive: ≥70 oracled queries re-verified
    at the driver's scale each round."""
    assert len(NAMES) >= 70, len(NAMES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle_at_driver_scale(spark, con01, name):
    result = run_one(spark, con01, name, SF01)
    assert result.ok, f"{name}@sf0.01: {result.detail}"
