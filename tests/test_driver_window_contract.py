"""Meta-guards for the driver-window mechanics: the CORRECTNESS file
records exactly the FIRST 50 entries of queries() in insertion order,
so window mistakes (wrong size, unregistered name, non-oracled entry,
ordering drift) silently burn a round of evidence. Pure-Python — no
Spark session."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _entry():
    sys.path.insert(0, str(REPO))
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_window_is_50_registered_oracled_and_leads_queries():
    E = _entry()
    from data_lake_with_spark_spark.plans import REGISTRY

    assert len(E.DRIVER_WINDOW) == 50
    assert len(set(E.DRIVER_WINDOW)) == 50, "duplicate window entries"
    missing = [n for n in E.DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    unoracled = [n for n in E.DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert not unoracled, f"window entries without oracles: {unoracled}"
    names = list(E.queries())
    assert names[:50] == E.DRIVER_WINDOW, "window must lead queries() order"
    # every oracle key exists and every oracled name has SQL text
    osql = E.oracle_sql()
    assert set(osql) == {n for n, q in REGISTRY.items() if q.oracle is not None}
    assert all(isinstance(s, str) and s.strip() for s in osql.values())


# The rows-only set is FROZEN (round-13 verdict directive #7): every
# entry is either the fast path of an oracled _portable twin or pinned
# by recall/property pytests, and the set has held at these 14 names
# since round 11. A new registration without an oracle would silently
# ship with only the weaker rows-only driver check — fail loudly
# instead, naming the offender; shipping a new rows-only query is a
# deliberate act that edits this frozenset WITH its documented
# necessity, never a default.
ROWS_ONLY_FROZEN = frozenset(
    {
        "agg_approx_count_distinct",
        "agg_approx_percentile",
        "dedup_minhash_lsh",
        "dedup_minhash_signatures",
        "dedup_simhash",
        "scan_tablesample",
        "sketch_hll_daily_union",
        "surrogate_keys",
        "text_bpe_tokenize",
        "vector_pca_project",
        "vector_topk_ivf",
        "vector_topk_lsh",
        "vector_topk_pca",
        "vector_topk_pq",
    }
)


def test_rows_only_set_is_frozen():
    from data_lake_with_spark_spark.plans import REGISTRY

    live = {n for n, q in REGISTRY.items() if q.oracle is None}
    new = sorted(live - ROWS_ONLY_FROZEN)
    gone = sorted(ROWS_ONLY_FROZEN - live)
    assert not new, (
        f"new rows-only (oracle-less) registrations: {new} — give each an "
        "oracle or an oracled _portable twin, document the necessity, and "
        "only then extend ROWS_ONLY_FROZEN"
    )
    assert not gone, (
        f"frozen rows-only names missing from the registry: {gone} — if one "
        "gained an oracle or was renamed, shrink ROWS_ONLY_FROZEN to match"
    )


def test_changed_this_round_is_sf01_gated():
    """Every name the sf0.01 gate declares changed must exist and be
    oracled — a typo here silently drops the birth-gate."""
    sys.path.insert(0, str(REPO))
    from data_lake_with_spark_spark.plans import REGISTRY
    from tests.test_oracle_parity_sf01 import CHANGED_THIS_ROUND

    for name in CHANGED_THIS_ROUND:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is not None, name
