"""Deeper TPC-H-shaped coverage (E7), adapted to the testdata's
columns: multi-fact joins, disjunctive predicates, IN/EXISTS/NOT-EXISTS
subqueries, conditional classification aggregates, top-k over joins.
These stress the join-order/strategy and subquery-decorrelation parts
of Catalyst the first relational batch doesn't reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import davg, davg_sql, dsum, dsum_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS INTEGER) AS ship_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, CAST(YEAR(l.l_shipdate) AS INTEGER)
ORDER BY supp_nation, cust_nation, ship_year
"""


@register("q7_nation_volume", oracle=Q7_ORACLE, tags=("join", "agg", "tpch"))
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: cross-nation shipping volume — six-way join
    with the nation dim joined twice under different roles."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sn = _t(spark, sf_dir, "nation").alias("sn")
    cn = _t(spark, sf_dir, "nation").alias("cn")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .where(F.col("sn.n_name") != F.col("cn.n_name"))
        .groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity')} AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INTEGER)
ORDER BY nation, order_year DESC
"""


@register("q9_product_profit", oracle=Q9_ORACLE, tags=("join", "agg", "tpch"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit per supplier nation and year for a
    product family (cost modeled as 0.5·retailprice — the testdata has
    no partsupp supplycost)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year")
        )
        .agg(dsum(profit).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("order_year"))
    )


Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       ROUND(c.c_acctbal, 2) AS c_acctbal,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("q10_returned_revenue", oracle=Q10_ORACLE, tags=("join", "agg", "topk", "tpch"))
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by returned-item revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q12_ORACLE = """
SELECT o.o_orderpriority,
       CAST(SUM(CASE WHEN l.l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS bulk_count,
       CAST(SUM(CASE WHEN l.l_quantity <  25 THEN 1 ELSE 0 END) AS BIGINT) AS small_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q12_priority_classes", oracle=Q12_ORACLE, tags=("join", "agg", "tpch"))
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: two-way CASE classification per priority over
    a date-bounded join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("l_quantity") >= 25).alias("bulk_count"),
            F.count_if(F.col("l_quantity") < 25).alias("small_count"),
        )
        .orderBy("o_orderpriority")
    )


Q14_ORACLE = """
SELECT FLOOR((100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS promo_share_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""


@register("q14_promo_share", oracle=Q14_ORACLE, tags=("join", "agg", "tpch"))
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share (conditional / ratio aggregate)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    ratio = (
        100.0 * F.sum(dec(promo)).cast("double") / F.sum(dec(rev)).cast("double")
    )
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (F.floor(ratio * 1e4 + 0.5) / 1e4).alias("promo_share_pct")
    )


Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_counts", oracle=Q16_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct suppliers per part class, excluding a
    brand and a NOT-IN supplier set (anti join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#13")
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       {dsum_sql('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
"""


@register("q18_large_orders", oracle=Q18_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-quantity orders via IN-subquery over a grouped
    HAVING (left-semi join after decorrelation)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(big, "o_orderkey", "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
    )


Q19_ORACLE = f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45 AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_predicates", oracle=Q19_ORACLE, tags=("join", "agg", "tpch"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides —
    exercises predicate normalization and join-condition pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 45) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q22_ORACLE = f"""
WITH rich AS (
  SELECT * FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
)
SELECT n.n_name,
       COUNT(*) AS numcust,
       {dsum_sql('r.c_acctbal')} AS totacctbal
FROM rich r
JOIN nation n ON r.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey)
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("q22_idle_rich_customers", oracle=Q22_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: above-average-balance customers with no orders
    (scalar subquery + NOT EXISTS → anti join), grouped by nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    # scalar subquery as a lazy broadcast cross-join of the 1-row
    # aggregate: no separate driver round-trip job, the whole plan
    # stays composable/lazy
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
    )
    idle = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q4_priority_exists", oracle=Q4_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS-filtered order counts per priority
    (semi join after decorrelation)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q8_ORACLE = f"""
WITH volumes AS (
  SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
         n.n_name,
         l.l_extendedprice * (1 - l.l_discount) AS vol
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
)
SELECT order_year,
       FLOOR((CAST(SUM(CAST(CASE WHEN n_name = 'CHINA' THEN vol ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) / CAST(SUM(CAST(vol AS DECIMAL(18,6))) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS china_share
FROM volumes
GROUP BY order_year
ORDER BY order_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("join", "agg", "tpch"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one nation's share of supplier volume per year
    (ratio of conditional aggregates, decimal-exact on both sides)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.floor(
                    F.sum(dec(F.when(F.col("n_name") == "CHINA", vol).otherwise(0.0)))
                    .cast("double")
                    / F.sum(dec(vol)).cast("double")
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("china_share")
        )
        .orderBy("order_year")
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", oracle=Q13_ORACLE, tags=("join", "agg", "tpch"))
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer-order-count distribution including
    zero-order customers (left outer + count of non-null keys,
    then a second aggregation over the counts)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("q15_top_supplier", oracle=Q15_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — aggregate,
    then a scalar-max filter over the aggregate (view-style reuse)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    # scalar max as a lazy broadcast cross-join (no driver round-trip);
    # the doubled revenue subplan canonicalizes identically, so
    # ReuseExchange shares the shuffle
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("q21_waiting_supplier", oracle=Q21_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: the only supplier at fault — an EXISTS and a
    NOT EXISTS over the same fact (semi + anti join on derived keys)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi")
    )
    # EXISTS: another supplier on the same order
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") > 1)
        .select("l_orderkey")
    )
    # NOT EXISTS: no OTHER supplier with a returned item on that order
    other_returned = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("nr"))
        .where(F.col("nr") > 1)
        .select("l_orderkey")
    )
    fault = (
        l1.join(multi_supp, "l_orderkey", "left_semi")
        .join(other_returned, "l_orderkey", "left_anti")
    )
    return (
        fault.join(F.broadcast(supp), fault.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


Q2_ORACLE = """
WITH part_supp AS (
  SELECT l.l_partkey, l.l_suppkey,
         FLOOR((CAST(SUM(CAST(l.l_extendedprice / l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) * 1e4 + 0.5) / 1e4 AS avg_unit_price
  FROM lineitem l
  GROUP BY l.l_partkey, l.l_suppkey
), min_cost AS (
  SELECT l_partkey, MIN(avg_unit_price) AS min_price FROM part_supp GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, ps.avg_unit_price
FROM part_supp ps
JOIN min_cost mc ON ps.l_partkey = mc.l_partkey AND ps.avg_unit_price = mc.min_price
JOIN part p     ON ps.l_partkey = p.p_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_size <= 20
ORDER BY p.p_partkey, s.s_name
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: the cheapest supplier per part (correlated MIN
    over a derived part-supplier cost table; no partsupp in the
    testdata, so unit cost derives from lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 20)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(18,6)")
    part_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.floor(F.sum(unit).cast("double") / F.count(F.lit(1)) * 1e4 + 0.5) / 1e4).alias("avg_unit_price")
    )
    # rename the grouping key on the self-joined side — both frames
    # derive from the same lineitem plan and Spark can't disambiguate
    min_cost = part_supp.groupBy("l_partkey").agg(
        F.min("avg_unit_price").alias("min_price")
    ).select(F.col("l_partkey").alias("mc_partkey"), "min_price")
    cheapest = part_supp.join(
        min_cost,
        (part_supp.l_partkey == min_cost.mc_partkey)
        & (part_supp.avg_unit_price == min_cost.min_price),
    ).select("l_partkey", "l_suppkey", "avg_unit_price")
    return (
        cheapest.join(F.broadcast(part), cheapest.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), cheapest.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "avg_unit_price")
        .orderBy("p_partkey", "s_name")
    )


Q20_ORACLE = f"""
WITH shipped AS (
  SELECT l_suppkey, l_partkey, {dsum_sql('l_quantity')} AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM shipped sh
JOIN part p ON sh.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON sh.l_suppkey = s.s_suppkey
WHERE sh.qty > 50
ORDER BY s.s_suppkey
"""


@register("q20_heavy_promo_suppliers", oracle=Q20_ORACLE, tags=("join", "agg", "tpch"))
def q20_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers who shipped substantial volume of a
    product family in a year (aggregate threshold + semi-style
    distinct projection)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        dsum(F.col("l_quantity")).alias("qty")
    )
    return (
        shipped.where(F.col("qty") > 50)
        .join(F.broadcast(part), shipped.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )

