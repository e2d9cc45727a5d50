"""Data-quality expectation queries (constraint checking as a lake
query — see operators/quality.py for the scale shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators.quality import (
    cnt_dup,
    cnt_null,
    cnt_where,
    fk_expectation,
    table_expectations,
    union_report,
)
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


DQ_ORACLE = """
SELECT 'customer.c_custkey unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_violations
FROM customer
UNION ALL
SELECT 'lineitem.fk_orders', CAST(COUNT(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem.l_quantity in (0,60]', CAST(COUNT_IF(l_quantity <= 0 OR l_quantity > 60) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.l_discount in [0,0.5]', CAST(COUNT_IF(l_discount < 0 OR l_discount > 0.5) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.o_orderkey not null', CAST(COUNT_IF(o_orderkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.o_orderkey unique', CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.o_totalprice > 0', CAST(COUNT_IF(o_totalprice <= 0) AS BIGINT)
FROM orders
ORDER BY check_name
"""


@register("dq_expectations", oracle=DQ_ORACLE, tags=("quality", "agg", "join"))
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-check suite over the TPC-H-ish core: key nullability
    and uniqueness, quantity and discount ranges, and
    the lineitem→orders foreign key. All orders checks share one scan
    (single agg + stack unpivot), lineitem's row-local checks share
    another; only the FK adds a join."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    report = union_report(
        [
            table_expectations(
                orders,
                [
                    ("orders.o_orderkey not null", cnt_null("o_orderkey")),
                    ("orders.o_orderkey unique", cnt_dup("o_orderkey")),
                    ("orders.o_totalprice > 0", cnt_where(F.col("o_totalprice") <= 0)),
                ],
            ),
            table_expectations(
                lineitem,
                [
                    (
                        "lineitem.l_quantity in (0,60]",
                        cnt_where(
                            (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)
                        ),
                    ),
                    (
                        "lineitem.l_discount in [0,0.5]",
                        cnt_where(
                            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
                        ),
                    ),
                ],
            ),
            table_expectations(
                customer, [("customer.c_custkey unique", cnt_dup("c_custkey"))]
            ),
            fk_expectation(
                lineitem,
                orders,
                ["l_orderkey"],
                "lineitem.fk_orders",
                parent_keys=["o_orderkey"],
            ),
        ]
    )
    return report.orderBy("check_name")
