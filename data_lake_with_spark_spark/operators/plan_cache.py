"""Shared-subtree cache tracking.

A lazily-built plan that references the same expensive subtree N
times re-derives it N times — Catalyst reuses *exchanges* only when
the physical subtrees are byte-identical AND in the same stage, so a
candidate-generator (LSH near-pairs, co-occurrence edges) referenced
from both sides of a join tree re-runs per reference. Measured before
the round-8/9 fixes: the pinned k-truss unroll re-ran the near-dup
generator 864x, ``graph_local_clustering`` re-derived its
co-visitation edge list 94x (scripts/plan_scan_audit.py).

``shared(df)`` is the fix: a LAZY ``.cache()`` (no Spark job at plan
construction — the lazy-construction gate still holds) that collapses
every reference to one materialization plus InMemoryTableScans. At
cluster scale this is the difference between O(arity) and
O(references) input scans.

Every frame cached through ``shared`` is TRACKED so long-lived
sessions (streaming drivers, notebook servers) can release executor
storage once results are materialized: ``release_shared_caches()``
unpersists everything tracked so far. Unpersisting is always safe for
correctness — a still-referenced plan silently recomputes — so the
caller needs no liveness analysis; call it between queries, not
between construction and collection of the same query.

THREADING CONTRACT — single-threaded by design. ``_TRACKED`` is a
process-global list with no locking or per-query scoping: a
``release_shared_caches()`` issued from one thread unpersists the
caches of a query concurrently executing on another thread. That is
still correctness-safe (Spark recomputes evicted blocks), but it
silently restores the N-times-scan blowup the cache exists to
prevent. Every harness in this repo (driver verify, bench.py, the
sf0.1 sweep, pytest) runs queries sequentially on one thread, which
is the supported mode. A concurrent session must either skip
releasing (storage then bounded by ContextCleaner GC) or serialize
construct→collect→release per query; per-query scoped tracking
(a token/context-manager API) is the upgrade path if concurrent
multi-query drivers ever become a real deployment shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def shared(df: DataFrame) -> DataFrame:
    """Mark ``df`` as a shared subtree: lazy-cache it and track the
    handle for later :func:`release_shared_caches`. Returns the
    cached frame; build every downstream reference from the return
    value."""
    out = df.cache()
    _TRACKED.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Track an ALREADY-cached/persisted frame (e.g. a per-round
    iterative intermediate) for cleanup without re-calling cache()."""
    _TRACKED.append(df)
    return df


def release_shared_caches() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Blocking=False: executors free the blocks asynchronously."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # Session already stopped — nothing to free.
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED)
