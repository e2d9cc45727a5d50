"""Bucketed-table layout: same-bucketed equi-joins and groupBys must
plan with zero exchanges (the write-once / join-forever contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.sources import bucketed as B


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    B.write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    B.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    try:
        joined = B.bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # and it's not just an empty plan: the join really happened
        n = joined.count()
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert n == plain and n > 0

        # groupBy on the bucket key rides the same layout: no exchange
        agg = (
            spark.table("b_lineitem")
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in _plan(agg), _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_registry_bucketed_join_query_shuffle_free(spark, sf_dir):
    """The registered join_bucketed_colocated query: join + same-key
    aggregate with zero Exchange nodes end-to-end."""
    from data_lake_with_spark_spark.plans import REGISTRY

    try:
        df = REGISTRY["join_bucketed_colocated"].spark(spark, sf_dir)
        assert "Exchange" not in _plan(df), _plan(df)
        assert df.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS dlws_bjoin_orders")
        spark.sql("DROP TABLE IF EXISTS dlws_bjoin_lineitem")
