"""SCD2 merge emulation, salted aggregation, and bucketed co-located
joins (the scale patterns Delta/bucketing would give a real lake)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators.cdc import salted_sum, scd2_apply


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def history(spark):
    return spark.createDataFrame(
        [
            ("u1", "free", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
            ("u1", "paid", ts("2024-02-01 00:00:00"), None),
            ("u2", "free", ts("2024-01-15 00:00:00"), None),
        ],
        "userId string, level string, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_closes_and_inserts(spark, history):
    updates = spark.createDataFrame(
        [
            ("u2", "paid", ts("2024-03-01 00:00:00")),  # change → close + insert
            ("u1", "paid", ts("2024-03-01 00:00:00")),  # same attrs → no-op
            ("u3", "free", ts("2024-03-02 00:00:00")),  # new key → insert
        ],
        "userId string, level string, ts timestamp",
    )
    out = scd2_apply(history, updates, key="userId", attrs=["level"])
    rows = {(r["userId"], r["level"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert ("u2", "free", ts("2024-01-15 00:00:00"), ts("2024-03-01 00:00:00")) in rows
    assert ("u2", "paid", ts("2024-03-01 00:00:00"), None) in rows
    assert ("u1", "paid", ts("2024-02-01 00:00:00"), None) in rows  # untouched
    assert ("u3", "free", ts("2024-03-02 00:00:00"), None) in rows
    # u1: 2 (history untouched), u2: closed + new open, u3: 1 new
    assert len(rows) == 5


def test_scd2_idempotent(spark, history):
    updates = spark.createDataFrame(
        [("u2", "paid", ts("2024-03-01 00:00:00"))],
        "userId string, level string, ts timestamp",
    )
    once = scd2_apply(history, updates, key="userId", attrs=["level"])
    twice = scd2_apply(once, updates, key="userId", attrs=["level"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_latest_update_in_batch_wins(spark, history):
    updates = spark.createDataFrame(
        [
            ("u2", "paid", ts("2024-03-01 00:00:00")),
            ("u2", "gold", ts("2024-04-01 00:00:00")),
        ],
        "userId string, level string, ts timestamp",
    )
    out = scd2_apply(history, updates, key="userId", attrs=["level"])
    open_u2 = out.where((F.col("userId") == "u2") & F.col("valid_to").isNull()).collect()
    assert len(open_u2) == 1 and open_u2[0]["level"] == "gold"


def test_salted_sum_equals_plain_sum(spark, sf_dir):
    from data_lake_with_spark_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: round(r["s"], 2)
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    salted = {
        r["l_returnflag"]: round(r["sum_l_quantity"], 2)
        for r in salted_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-location: joining two tables bucketed on the key
    must plan a sort-merge join with NO Exchange on either side."""
    from data_lake_with_spark_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning" not in plan
        n = j.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")
