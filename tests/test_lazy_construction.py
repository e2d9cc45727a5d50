"""Lazy-construction gate (round-6 verdict directive #5).

``queries()[name]`` is contractually a PLAN BUILDER: a caller that
constructs many frames (the driver enumerates all of them; notebooks
compose them) must not pay cluster time until it runs an action. The
deviations — iterative kernels that checkpoint per round, two-phase
operators that collect bounded driver artifacts — are declared in
``plans.EAGER_QUERIES``. This test warms the catalog's schema cache
(schema inference is scan setup, not query work) and then asserts that
constructing EVERY non-eager query fires ZERO Spark jobs.
"""

from __future__ import annotations

from data_lake_with_spark_spark.catalog import TABLES, load_table
from data_lake_with_spark_spark.plans import EAGER_QUERIES, REGISTRY


def test_eager_set_names_are_registered():
    assert EAGER_QUERIES <= set(REGISTRY), sorted(EAGER_QUERIES - set(REGISTRY))


def test_every_declared_eager_query_is_genuinely_eager(spark, sf_dir):
    """The other direction of the lazy gate (round-12 verdict
    directive #8): every query LISTED in EAGER_QUERIES must actually
    run ≥1 Spark job at plan construction. Without this, a refactor
    that makes an operator lazy (or a copy-paste into the eager set)
    silently grows the declared deviation surface — the frozenset must
    stay the exact set of construction-time-job queries, both ways."""
    for t in TABLES:
        load_table(spark, sf_dir, t)  # populate the schema cache
    sc = spark.sparkContext
    not_eager: list[str] = []
    for name in sorted(EAGER_QUERIES):
        group = f"eager-gate-{name}"
        sc.setJobGroup(group, name)
        try:
            REGISTRY[name].spark(spark, sf_dir)
        finally:
            sc.setJobGroup("eager-gate-idle", "idle")
        if not sc.statusTracker().getJobIdsForGroup(group):
            not_eager.append(name)
    assert not not_eager, (
        f"{len(not_eager)} queries declared in plans.EAGER_QUERIES ran "
        f"ZERO jobs at construction: {not_eager} — remove them from the "
        "eager set (they are lazy now) so the declared deviation surface "
        "stays exact"
    )


def test_non_eager_queries_construct_with_zero_jobs(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t)  # populate the schema cache
    sc = spark.sparkContext
    offenders: dict[str, int] = {}
    for name in sorted(set(REGISTRY) - EAGER_QUERIES):
        group = f"lazy-gate-{name}"
        sc.setJobGroup(group, name)
        try:
            REGISTRY[name].spark(spark, sf_dir)
        finally:
            sc.setJobGroup("lazy-gate-idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        if jobs:
            offenders[name] = len(jobs)
    assert not offenders, (
        f"{len(offenders)} undeclared-eager queries ran jobs at plan "
        f"construction: {offenders} — either make construction lazy or "
        "add them to plans.EAGER_QUERIES"
    )
