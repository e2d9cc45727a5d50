"""Shared-subtree cache tracker (operators/plan_cache.py): lazy
caching semantics, cleanup accounting, and the correctness-safety of
releasing caches that a live plan still references."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import plan_cache as PC
from data_lake_with_spark_spark.plans import REGISTRY


def test_shared_is_lazy_and_tracked(spark):
    PC.release_shared_caches()  # clean slate for the counter
    before = PC.tracked_count()
    # lazy: shared() must fire ZERO Spark jobs (the job-group idiom
    # from test_lazy_construction — an eager persist would run one)
    sc = spark.sparkContext
    sc.setJobGroup("plan-cache-lazy-gate", "shared() construction")
    try:
        df = PC.shared(spark.range(100).select((F.col("id") * 2).alias("v")))
    finally:
        sc.setJobGroup("plan-cache-idle", "idle")
    assert sc.statusTracker().getJobIdsForGroup("plan-cache-lazy-gate") == []
    assert PC.tracked_count() == before + 1
    assert df.storageLevel.useMemory  # cache level registered immediately
    assert df.count() == 100  # first action materializes
    assert df.storageLevel.useMemory


def test_release_unpersists_everything(spark):
    PC.release_shared_caches()
    a = PC.shared(spark.range(10))
    b = PC.shared(spark.range(20))
    a.count(), b.count()
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    released = PC.release_shared_caches()
    assert released >= 2
    assert PC.tracked_count() == 0
    assert not a.storageLevel.useMemory
    assert not b.storageLevel.useMemory


def test_release_is_correctness_safe_for_live_plans(spark, sf_dir):
    """Unpersisting under a still-referenced plan must only force
    recomputation, never change results: run a shared()-using
    registry query, release every cache, run it again — identical."""
    name = "graph_local_clustering"
    want = [tuple(r) for r in REGISTRY[name].spark(spark, sf_dir).collect()]
    n = PC.release_shared_caches()
    assert n >= 1  # the query's shared frames were tracked
    got = [tuple(r) for r in REGISTRY[name].spark(spark, sf_dir).collect()]
    assert got == want
    PC.release_shared_caches()


def test_long_lived_session_storage_is_bounded(spark):
    """The round-8 ADVICE scenario: repeated invocations in one
    session must not accumulate executor storage indefinitely —
    release between queries drains the tracker to zero each time."""
    PC.release_shared_caches()
    for _ in range(3):
        df = PC.shared(spark.range(50))
        df.count()
        assert PC.release_shared_caches() == 1
        assert PC.tracked_count() == 0


def test_no_untracked_bare_caches_in_source():
    """Grep gate for the cache-release protocol (round-9 VERDICT
    directive #2): every module that calls ``.cache()``/``.persist(``
    must either be plan_cache.py itself or pair the cache with an
    explicit ``unpersist`` (the ingest/writers/versioned discipline).
    A bare cache anywhere else accumulates executor storage across a
    long-lived session until ContextCleaner GC happens to run — route
    new shared subtrees through plan_cache.shared() instead."""
    import re
    from pathlib import Path

    # The ONLY modules allowed to call .cache()/.persist( directly:
    # each pairs every cache with an explicit unpersist after the
    # consuming action. A new module must be reviewed and added here
    # (not whitelisted by a stray "unpersist" in a docstring).
    allowed = {
        "operators/ingest.py",
        "sources/writers.py",
        "sources/versioned.py",
        "plans/relational2.py",
    }
    import io
    import tokenize

    def strip_comments(source: str) -> str:
        """Drop COMMENT tokens only — naive '#'-splitting would also
        truncate lines at a '#' inside a string literal (a regex or
        format string), silently hiding a real .cache() call after
        it (round-10 ADVICE)."""
        toks = tokenize.generate_tokens(io.StringIO(source).readline)
        return "".join(t.string for t in toks if t.type != tokenize.COMMENT)

    pkg = Path(__file__).resolve().parents[1] / "data_lake_with_spark_spark"
    pat = re.compile(r"\.cache\(\)|\.persist\(")
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        if py.name == "plan_cache.py":
            continue
        rel = str(py.relative_to(pkg))
        text = py.read_text()
        code = strip_comments(text)
        if pat.search(code):
            if rel not in allowed:
                offenders.append(rel)
            else:
                assert re.search(r"\.unpersist\(", text), (
                    f"{rel} is on the explicit-unpersist allowlist but "
                    "contains no unpersist call"
                )
    assert offenders == [], (
        f"bare .cache()/.persist() outside the allowlist in {offenders}; "
        "use plan_cache.shared() or the explicit-unpersist pattern "
        "(and add the module to the reviewed allowlist)"
    )
