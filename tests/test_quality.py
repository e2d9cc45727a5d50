"""Data-quality expectation suite: violation counting on crafted dirty
data, and the one-scan-per-table plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators.quality import (
    cnt_dup,
    cnt_null,
    cnt_where,
    fk_expectation,
    table_expectations,
    union_report,
)


def test_expectations_count_violations(spark):
    dirty = spark.createDataFrame(
        [
            (1, 10.0),
            (1, -5.0),   # dup key + negative value
            (2, 3.0),
            (None, 7.0),  # null key
        ],
        "k long, v double",
    )
    report = {
        r["check_name"]: r["n_violations"]
        for r in table_expectations(
            dirty,
            [
                ("k not null", cnt_null("k")),
                ("k unique", cnt_dup("k")),
                ("v > 0", cnt_where(F.col("v") <= 0)),
            ],
        ).collect()
    }
    # count_distinct ignores the null key row: 4 rows, 2 distinct
    # non-null keys -> 2 in excess (the dup AND the null-key row).
    assert report == {"k not null": 1, "k unique": 2, "v > 0": 1}


def test_fk_expectation_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = fk_expectation(
        child, parent, ["fk"], "child.fk", parent_keys=["pk"]
    ).collect()[0]
    assert (row["check_name"], row["n_violations"]) == ("child.fk", 1)


def test_union_report_and_empty_suite(spark):
    a = spark.createDataFrame([(1, 1.0)], "k long, v double")
    r = union_report(
        [
            table_expectations(a, [("a", cnt_null("k"))]),
            table_expectations(a, [("b", cnt_where(F.col("v") < 0))]),
        ]
    ).collect()
    assert [(x["check_name"], x["n_violations"]) for x in r] == [("a", 0), ("b", 0)]
    with pytest.raises(ValueError):
        union_report([])
    with pytest.raises(ValueError):
        table_expectations(a, [])


def test_dq_suite_scans_each_table_once(spark, sf_dir):
    from data_lake_with_spark_spark.plans import REGISTRY

    df = REGISTRY["dq_expectations"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # orders appears in its folded check scan + the FK's parent side;
    # lineitem in its folded scan + the FK child side. A per-check
    # scan would show 3 orders / 3 lineitem scans.
    assert plan.count("orders.parquet") <= 2
    assert plan.count("lineitem.parquet") <= 2


def test_quarantine_split_partitions_exactly(spark):
    """good ∪ bad == input, disjoint; violations name every broken
    rule; clean frames quarantine nothing."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.operators.quality import quarantine_split

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 500.0), (4, "d", 10.0)],
        "id long, tag string, v double",
    )
    rules = [
        ("neg_v", F.col("v") < 0),
        ("null_tag", F.col("tag").isNull()),
        ("huge_v", F.col("v") > 400),
    ]
    good, bad = quarantine_split(df, rules)
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    got = {r["id"]: sorted(r["_violations"]) for r in bad.collect()}
    assert got == {2: ["neg_v"], 3: ["huge_v", "null_tag"]}
    assert good.count() + bad.count() == df.count()
    g2, b2 = quarantine_split(df.where(F.col("id") == 1), rules)
    assert g2.count() == 1 and b2.count() == 0


def test_dedup_threshold_frontier_monotone(spark, sf_dir):
    """Raising the Jaccard threshold never drops MORE documents, and
    dropped + survivors always reconstitute the corpus."""
    from data_lake_with_spark_spark.plans import REGISTRY

    rows = REGISTRY["dedup_threshold_frontier"].spark(spark, sf_dir).collect()
    by_t = {r["threshold_milli"]: r for r in rows}
    ts = sorted(by_t)
    assert ts == [500, 600, 700, 800]
    for a, b in zip(ts, ts[1:]):
        assert by_t[a]["n_dropped"] >= by_t[b]["n_dropped"]
        assert by_t[a]["n_pairs"] >= by_t[b]["n_pairs"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert all(
        r["n_dropped"] + r["n_survivors"] == n_docs for r in rows
    )
