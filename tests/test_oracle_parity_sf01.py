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
ROUND = 13

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROTATION = [n for i, n in enumerate(ORACLED) if i % 3 == ROUND % 3]

# Queries whose engine or oracle changed THIS round (always re-gated
# at driver scale regardless of where the rotation sits).
CHANGED_THIS_ROUND = [
    # round-13 births (plans/extended_ops9.py, sf0.01-gated at birth):
    "ivm_kmv_exact_regime",
    "ivm_kmv_estimate_portable",
    "ivm_topk_retraction_equivalence",
    "ingest_minhash_newpairs_equivalence",
    # round-13 engine change: insert-only guards moved from guarded
    # PROJECTIONS into raise-in-FILTER predicates (pruning-proof —
    # round-12 ADVICE) in maintain_bitmap/kmv/hll/extrema — the
    # registered users of those folds re-gate:
    "ivm_bitmap_distinct_equivalence",
    "ivm_extrema_equivalence",
    # round-13 engine change: range_join_bucketed_outer's matched-side
    # alias prefix hardened (_m_ -> __rjb_m_ + collision assert) —
    # both registered users re-gate:
    "join_click_purchase_outer",
    "join_range_outer_5min",
    # round-13 engine change: min_label_components rounds restructured
    # from 3 joins to 1 unified-lookup join — both oracled users of
    # the CC kernel re-gate:
    "graph_connected_components",
    "spatial_dbscan_grid",
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
