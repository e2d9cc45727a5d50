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


QUARANTINE_ORACLE = """
WITH tagged AS (
  SELECT event_id, event_type, value,
         list_filter([
           CASE WHEN event_type = 'purchase' AND value < 50.0
                THEN 'purchase_value_low' END,
           CASE WHEN event_type = 'error' THEN 'error_event' END,
           CASE WHEN value < 0.0 OR value > 400.0
                THEN 'value_out_of_range' END
         ], x -> x IS NOT NULL) AS v
  FROM events
)
SELECT event_id, event_type, value,
       array_to_string(v, ',') AS violations
FROM tagged
WHERE len(v) > 0
ORDER BY event_id
"""


@register(
    "dq_quarantine_rows",
    oracle=QUARANTINE_ORACLE,
    tags=("quality", "filter"),
)
def dq_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine (operators/quality.py:quarantine_split):
    one map-only pass tags each row with every business rule it broke
    and splits good from quarantined — the write-path complement of
    the aggregate dq_expectations report. Returned: the quarantined
    rows with their violation list (joined to CSV so the cross-engine
    hash compare sees a plain string)."""
    from data_lake_with_spark_spark.operators.quality import quarantine_split

    ev = _t(spark, sf_dir, "events")
    rules = [
        (
            "purchase_value_low",
            (F.col("event_type") == "purchase") & (F.col("value") < 50.0),
        ),
        ("error_event", F.col("event_type") == "error"),
        ("value_out_of_range", (F.col("value") < 0.0) | (F.col("value") > 400.0)),
    ]
    _good, bad = quarantine_split(
        ev.select("event_id", "event_type", "value"), rules
    )
    return (
        bad.select(
            "event_id",
            "event_type",
            "value",
            F.array_join("_violations", ",").alias("violations"),
        )
        .orderBy("event_id")
    )
