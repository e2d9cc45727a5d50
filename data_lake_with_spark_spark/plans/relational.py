"""Relational query layer (SURVEY §2 E7) over the TPC-H-ish testdata.

The reference has no query language — its entire analytical surface is
projections/joins/distinct (reference ``etl.py``, SURVEY §2.2-2.4). This
module is the idiomatic query layer the reference's star schema implies:
group-by aggregation, window functions, sort/limit, set ops, rollup/
cube/grouping sets, pivot — each with a DuckDB oracle.

Parity notes (learned traps, see registry docstring):
- DuckDB ``SUM(BIGINT)`` returns HUGEINT and ``year()`` returns BIGINT;
  oracle SQL casts them to match Spark's LONG/INT output types.
- Double aggregates are rounded on both sides (sum order is not
  deterministic across engines).
- Every ranking/limit has a total-order tie-break so top-k sets are
  well-defined.

Scale notes (100 TB posture):
- ``region``/``nation`` are scale-invariant small dims → explicit
  ``F.broadcast``. ``customer``/``orders``/``lineitem`` grow with SF →
  leave strategy to Catalyst/AQE (sort-merge with skew handling).
- Aggregations are expressed as single ``groupBy.agg`` so Catalyst
  plans partial (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import (
    davg,
    davg_expr,
    davg_sql,
    dsum,
    dsum_expr,
    dsum_sql,
)
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity')}                                       AS sum_qty,
  {dsum_sql('l_extendedprice')}                                  AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)')}               AS sum_disc_price,
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {davg_sql('l_quantity')}                                       AS avg_qty,
  {davg_sql('l_extendedprice')}                                  AS avg_price,
  {davg_sql('l_discount')}                                       AS avg_disc,
  COUNT(*)                                                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "tpch"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: wide multi-aggregate scan with pushed filter.
    Float sums/avgs use decimal-exact accumulation (plans/parity.py)
    so results are independent of summation order. The scan is widened
    when narrow (catalog.widen_if_narrow) so the 8-way partial
    aggregation parallelizes even over a single-row-group file."""
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    li = widen_if_narrow(_t(spark, sf_dir, "lineitem"), spark)
    # expr-string aggregates (round-15 construction-chatter cut): the
    # Column-built dsum/davg chain was ~60 py4j round trips per
    # construction; these parse to the identical aggregate trees
    disc = "l_extendedprice * (1 - l_discount)"
    return (
        li.where("l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_expr("l_quantity").alias("sum_qty"),
            dsum_expr("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc).alias("sum_disc_price"),
            dsum_expr(f"({disc}) * (1 + l_tax)").alias("sum_charge"),
            davg_expr("l_quantity").alias("avg_qty"),
            davg_expr("l_extendedprice").alias("avg_price"),
            davg_expr("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q5_ORACLE = f"""
SELECT
  r.r_name                                              AS region_name,
  CAST(YEAR(o.o_orderdate) AS INTEGER)                  AS order_year,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  COUNT(*)                                              AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, CAST(YEAR(o.o_orderdate) AS INTEGER)
ORDER BY region_name, order_year
"""


@register("q5_region_year_revenue", oracle=Q5_ORACLE, tags=("join", "agg", "tpch", "flagship"))
def q5_region_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + calendar derivation + aggregate.

    Generalizes the reference's fact pipeline (log⋈songs enrichment at
    reference ``etl.py:244-247`` + year/month derivation at
    ``etl.py:246-247``). Scale: region/nation broadcast (scale-invariant
    dims); lineitem⋈orders⋈customer shuffle on their keys with AQE.
    """
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    # fact side widened when narrow (round-14 optimization): all four
    # dims broadcast, so the single-row-group lineitem scan otherwise
    # runs the whole join+partial-agg pipeline in one task; dsum's
    # decimal accumulation is order-independent, so values are
    # partitioning-proof. Width is ESTIMATE-derived (round-15, the
    # verdict's row-aware directive): q5's per-row work is
    # byte-proportional, and the quiet-box A/B read width 8/16 ≈
    # 0.95-0.99s vs 32 ≈ 1.09s vs unwidened ≈ 1.23s at sf0.1 — 1 MB
    # of scan per partition lands ~11 here and clamps to cores on any
    # real table.
    li = widen_if_narrow(
        _t(spark, sf_dir, "lineitem"), spark, target_bytes=1 << 20
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            dsum_expr("l_extendedprice * (1 - l_discount)").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("region_name", "order_year")
    )


Q3_ORACLE = f"""
SELECT
  o.o_orderkey,
  {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("q3_top_unshipped_orders", oracle=Q3_ORACLE, tags=("join", "agg", "topk", "tpch"))
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective dim filter + join + top-k by revenue."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


COUNT_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  COUNT(*)                  AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_count_distinct", oracle=COUNT_DISTINCT_ORACLE, tags=("agg",))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregation (expand-based in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_approx_count_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (sketch differs from DuckDB's
    → rows-only check). The 100 TB path for cardinality estimation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"))
        .orderBy("l_returnflag")
    )


HAVING_ORACLE = f"""
SELECT c.c_custkey, COUNT(*) AS n_orders, {dsum_sql('o.o_totalprice')} AS total_spent
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
HAVING COUNT(*) >= 12
ORDER BY n_orders DESC, c_custkey ASC
"""


@register("agg_having", oracle=HAVING_ORACLE, tags=("agg", "join"))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with post-aggregation filter (HAVING)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spent"),
        )
        .where(F.col("n_orders") >= 12)
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
    )


MINMAX_ORACLE = """
SELECT
  p_brand,
  CAST(MIN(p_size) AS INTEGER)  AS min_size,
  CAST(MAX(p_size) AS INTEGER)  AS max_size,
  ROUND(MIN(p_retailprice), 2)  AS min_price,
  ROUND(MAX(p_retailprice), 2)  AS max_price,
  FLOOR((STDDEV_SAMP(p_retailprice)) * 1e4 + 0.5) / 1e4 AS sd_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


@register("agg_min_max_stddev", oracle=MINMAX_ORACLE, tags=("agg",))
def agg_min_max_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max/stddev aggregate family."""
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
            (F.floor(F.stddev_samp("p_retailprice") * 1e4 + 0.5) / 1e4).alias("sd_price"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

TOPK_PER_GROUP_ORACLE = """
SELECT n_name, c_custkey, c_acctbal, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT n.n_name, c.c_custkey, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rnk
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
WHERE rnk <= 3
ORDER BY n_name, rnk
"""


@register("window_topk_per_group", oracle=TOPK_PER_GROUP_ORACLE, tags=("window", "topk"))
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance (row_number window)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )


RUNNING_ORACLE = """
SELECT
  o_custkey, o_orderkey, o_orderdate,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey <= 20
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("window_running_total", oracle=RUNNING_ORACLE, tags=("window",))
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (frame-spec window)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w), 2).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
  CAST(DATEDIFF('day',
       LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       o_orderdate) AS INTEGER) AS days_since_prev
FROM orders
WHERE o_custkey <= 20
ORDER BY o_custkey, o_orderkey
"""


@register("window_lag_gaps", oracle=LAG_ORACLE, tags=("window",))
def window_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days between consecutive orders per customer."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
                "days_since_prev"
            ),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


RANK_ORACLE = """
SELECT
  p_type, p_partkey,
  CAST(RANK()       OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS price_rank,
  CAST(DENSE_RANK() OVER (PARTITION BY p_type ORDER BY p_size DESC) AS INTEGER)       AS size_drank,
  FLOOR((PERCENT_RANK() OVER (PARTITION BY p_type ORDER BY p_retailprice, p_partkey)) * 1e6 + 0.5) / 1e6 AS price_prank
FROM part
ORDER BY p_type, p_partkey
"""


@register("window_rank_family", oracle=RANK_ORACLE, tags=("window",))
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank in one pass."""
    part = _t(spark, sf_dir, "part")
    by_price = W.partitionBy("p_type").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    by_size = W.partitionBy("p_type").orderBy(F.desc("p_size"))
    by_price_asc = W.partitionBy("p_type").orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_type",
            "p_partkey",
            F.rank().over(by_price).alias("price_rank"),
            F.dense_rank().over(by_size).alias("size_drank"),
            (F.floor(F.percent_rank().over(by_price_asc) * 1e6 + 0.5) / 1e6).alias("price_prank"),
        )
        .orderBy("p_type", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

SORT_LIMIT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
"""


@register("sort_limit_topk", oracle=SORT_LIMIT_ORACLE, tags=("sort",))
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (Spark plans TakeOrderedAndProject — no full sort)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
    )


UNION_ORACLE = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
UNION
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


@register("setop_union", oracle=UNION_ORACLE, tags=("setop",))
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer vs supplier nations."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


@register("setop_intersect", oracle=INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer vs supplier nations."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


@register("setop_except", oracle=EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.
    ``subtract`` is SQL EXCEPT; ``exceptAll`` would be multiset
    subtraction (removes one occurrence per match) — not the same op."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets / pivot
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = f"""
SELECT
  CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
  o_orderpriority,
  COUNT(*) AS n_orders,
  {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (CAST(YEAR(o_orderdate) AS INTEGER), o_orderpriority)
ORDER BY order_year NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("rollup_orders", oracle=ROLLUP_ORACLE, tags=("agg", "rollup"))
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (year, priority) → (year) → ()."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").alias("order_year"), F.col("o_orderpriority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {dsum_sql('l_quantity')} AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("cube_lineitem", oracle=CUBE_ORACLE, tags=("agg", "rollup"))
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity")).alias("qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("grouping_sets_orders", oracle=GROUPING_SETS_ORACLE, tags=("agg", "rollup"))
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst plan)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0), 2) AS DOUBLE) AS F,
  CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0), 2) AS DOUBLE) AS O,
  CAST(ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0), 2) AS DOUBLE) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("pivot_status_price", oracle=PIVOT_ORACLE, tags=("agg", "pivot"))
def pivot_status_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns (explicit value list → no extra
    distinct-scan job, and stable output schema at any SF)."""
    orders = _t(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
    )
    return pivoted.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("F"), F.lit(0).cast("decimal(18,6)")), 2).cast("double").alias("F"),
        F.round(F.coalesce(F.col("O"), F.lit(0).cast("decimal(18,6)")), 2).cast("double").alias("O"),
        F.round(F.coalesce(F.col("P"), F.lit(0).cast("decimal(18,6)")), 2).cast("double").alias("P"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Scalar expression surface
# ---------------------------------------------------------------------------

SCALAR_STRING_ORACLE = """
SELECT
  p_partkey,
  UPPER(p_brand)                       AS brand_upper,
  LOWER(p_type)                        AS type_lower,
  CAST(LENGTH(p_name) AS INTEGER)      AS name_len,
  SUBSTR(p_name, 1, 5)                 AS name_prefix,
  CONCAT(p_brand, ':', p_type)         AS brand_type,
  REPLACE(p_type, ' ', '_')            AS type_snake,
  CAST(p_name LIKE '%a%' AS BOOLEAN)   AS has_a
FROM part
ORDER BY p_partkey
"""


@register("scalar_string_funcs", oracle=SCALAR_STRING_ORACLE, tags=("scalar",))
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (all JVM-side, codegen'd)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_type", " ", "_").alias("type_snake"),
            F.col("p_name").contains("a").alias("has_a"),
        )
        .orderBy("p_partkey")
    )


CASE_WHEN_ORACLE = """
SELECT
  c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       WHEN c_acctbal < 8000 THEN 'mid'
       ELSE 'high' END AS bal_bucket,
  ROUND(ABS(c_acctbal), 2)    AS abs_bal,
  ROUND(GREATEST(c_acctbal, 0.0), 2) AS pos_bal
FROM customer
ORDER BY c_custkey
"""


@register("scalar_case_when", oracle=CASE_WHEN_ORACLE, tags=("scalar",))
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + abs/greatest."""
    cust = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
    )
    return (
        cust.select(
            "c_custkey",
            bucket.alias("bal_bucket"),
            F.round(F.abs("c_acctbal"), 2).alias("abs_bal"),
            F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("pos_bal"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Subquery shapes (correlated → join rewrites are Catalyst-native)
# ---------------------------------------------------------------------------

SCALAR_SUBQ_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
ORDER BY c_custkey
"""


@register("subquery_above_avg", oracle=SCALAR_SUBQ_ORACLE, tags=("subquery",))
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the mean balance."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        ORDER BY c_custkey
        """
    )


CROSS_ORACLE = """
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
ORDER BY r_name, n_name
"""


@register("join_cross", oracle=CROSS_ORACLE, tags=("join",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (a join type absent from the
    reference; bounded to the two scale-invariant dims)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


FULL_OUTER_ORACLE = """
SELECT n.n_nationkey AS nationkey, cn.n_cust, sn.n_supp
FROM nation n
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
  ON n.n_nationkey = cn.c_nationkey
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
  ON n.n_nationkey = sn.s_nationkey
ORDER BY nationkey NULLS FIRST
"""


@register("join_full_outer", oracle=FULL_OUTER_ORACLE, tags=("join",))
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join: per-nation customer vs supplier counts with
    either side possibly missing."""
    nation = _t(spark, sf_dir, "nation")
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_outer")
        .join(supp, nation.n_nationkey == supp.s_nationkey, "full_outer")
        .select(F.col("n_nationkey").alias("nationkey"), "n_cust", "n_supp")
        .orderBy(F.col("nationkey").asc_nulls_first())
    )


SEMI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
ORDER BY c_custkey
"""


@register("join_left_semi", oracle=SEMI_ORACLE, tags=("join",))
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS analog): customers with at least one
    high-value order, emitting each at most once without a distinct —
    the semi join stops probing a key after the first match, so it
    shuffles no duplicate matches and needs no post-dedup. Filter on
    the build side is pushed before the exchange."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


EXISTS_ORACLE = """
SELECT p_partkey, p_name
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
ORDER BY p_partkey
"""


@register("subquery_exists", oracle=EXISTS_ORACLE, tags=("subquery", "join"))
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (what the planner rewrites it to)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )
