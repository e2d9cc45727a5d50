"""TPC-H analogs q2/q6/q11/q17/q20 — the five classic queries the first
deep batch skipped. The testdata has no ``partsupp``, so the
partsupp-dependent ones (q2, q11, q17, q20) are re-keyed onto
``lineitem``/``part`` while keeping each query's *signature operator*:

- q2: correlated scalar MIN subquery selecting extreme rows per group
- q6: tight scan-dominant filter + single aggregate (pushdown showcase)
- q11: HAVING against a global-total scalar subquery (revenue share)
- q17: per-group average threshold via correlated subquery (0.2·avg)
- q20: nested semi-join driven by a grouped HAVING subquery

Parity notes: every threshold comparison is computed from EXACT decimal
sums (see plans/parity.py) so Spark and DuckDB agree on boundary rows;
double equality against a MIN of stored values is exact (no arithmetic
on the compared value).

Reference tie-in: these extend SURVEY §2.4/§2.10 E7 (the reference has
no query layer at all — ``/root/reference/etl.py`` is pure ETL; the
relational surface is the harness-mandated extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import dsum, dsum_sql, pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q6 — forecasting revenue change: the canonical scan+filter+agg query.
# --------------------------------------------------------------------------

Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=Q6_ORACLE, tags=("agg", "tpch", "pushdown"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from discount-band lineitems in one ship-year.
    Scan-bound: every predicate is pushable to the parquet reader
    (range on timestamp + two doubles), and the result is a single row
    — at 100 TB this runs at I/O speed with zero shuffle beyond the
    final 1-row reduce."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# q2 — minimum-cost supplier (re-keyed: min retailprice part per type).
# --------------------------------------------------------------------------

Q2_ORACLE = """
SELECT DISTINCT p.p_type, p.p_partkey, p.p_name,
       ROUND(p.p_retailprice, 2) AS p_retailprice,
       s.s_name, n.n_name AS supp_nation
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
  AND p.p_retailprice = (
      SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
  )
ORDER BY p.p_type, p.p_partkey, s.s_name
"""


@register("q2_min_cost_part", oracle=Q2_ORACLE, tags=("join", "subquery", "tpch"))
def q2_min_cost_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: per part-type, the cheapest part(s) and the
    suppliers who actually shipped them into ASIA/EUROPE-based supplier
    nations. The correlated scalar-MIN subquery decorrelates to a
    broadcast join against a 6-row aggregate; double equality against
    the stored MIN is exact (no arithmetic on the compared value).
    Scale: part-side aggregates are tiny (|p_type| groups) → broadcast;
    the lineitem probe is the only large scan."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    min_by_type = part.groupBy("p_type").agg(F.min("p_retailprice").alias("min_price"))
    cheapest = part.join(F.broadcast(min_by_type), "p_type").where(
        F.col("p_retailprice") == F.col("min_price")
    )
    return (
        li.join(F.broadcast(cheapest), li.l_partkey == cheapest.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            "s_name",
            F.col("n_name").alias("supp_nation"),
        )
        .distinct()
        .orderBy("p_type", "p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# q11 — important stock (re-keyed: parts with outsized revenue share).
# --------------------------------------------------------------------------

_REV_DEC = "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))"

Q11_ORACLE = f"""
SELECT l_partkey,
       CAST(ROUND({_REV_DEC}, 2) AS DOUBLE) AS part_revenue
FROM lineitem
GROUP BY l_partkey
HAVING CAST({_REV_DEC} AS DOUBLE) >
       1.5 * (SELECT CAST({_REV_DEC} AS DOUBLE) / COUNT(DISTINCT l_partkey)
              FROM lineitem)
ORDER BY part_revenue DESC, l_partkey
"""


@register("q11_important_parts", oracle=Q11_ORACLE, tags=("agg", "subquery", "tpch"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose revenue exceeds 1.5× the average
    per-part revenue (scale-free threshold — a fixed share of total
    would degenerate to zero rows as |parts| grows). The global
    average is a 1-row aggregate cross-joined (broadcast) into the
    HAVING predicate — Spark's scalar-subquery decorrelation done by
    hand. Both sides of the comparison come from exact decimal sums,
    so the threshold is engine-independent. Scale: two scans of
    lineitem; the per-part aggregate is the only shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev.cast("decimal(18,6)")).alias("rev_dec")
    )
    total = li.agg(
        (
            F.sum(rev.cast("decimal(18,6)")).cast("double")
            / F.count_distinct(F.col("l_partkey"))
            * F.lit(1.5)
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("rev_dec").cast("double") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round(F.col("rev_dec"), 2).cast("double").alias("part_revenue"),
        )
        .orderBy(F.desc("part_revenue"), F.asc("l_partkey"))
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated avg threshold).
# --------------------------------------------------------------------------

_QTY_AVG = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"

Q17_ORACLE = f"""
WITH part_avg AS (
  SELECT l_partkey, {_QTY_AVG} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {pround_sql('CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0', 2)} AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN part_avg a ON l.l_partkey = a.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < 0.2 * a.avg_qty
"""


@register("q17_small_quantity", oracle=Q17_ORACLE, tags=("agg", "subquery", "tpch"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue lost if small-quantity orders (below
    20% of the part's average order size) stopped. The correlated AVG
    is a grouped aggregate joined back to the fact — the avg is
    computed as exact-decimal-sum / count so the 0.2·avg threshold is
    bit-identical across engines. Scale: the per-part average is a
    shuffle on l_partkey; the self-join reuses that partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            pround(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# q20 — suppliers with excess shipped volume of a part family.
# --------------------------------------------------------------------------

_WQTY = "SUM(CAST(l.l_quantity AS DECIMAL(18,6)))"

Q20_ORACLE = f"""
SELECT s.s_name, n.n_name AS supp_nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget%'
  GROUP BY l.l_suppkey
  HAVING CAST({_WQTY} AS DOUBLE) >
         1.2 * (SELECT CAST({_WQTY} AS DOUBLE) / COUNT(DISTINCT l.l_suppkey)
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_name LIKE '%widget%')
)
ORDER BY s.s_name
"""


@register("q20_excess_suppliers", oracle=Q20_ORACLE, tags=("join", "subquery", "tpch"))
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers who shipped more than 1.2× the
    average per-supplier 'widget' volume (scale-free threshold) — a
    grouped-HAVING subquery feeding a semi-join. The widget
    intermediate is computed once and reused for both the per-supplier
    sums and the global average. Exact decimal sums make the threshold
    engine-independent."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    widget = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_suppkey", F.col("l_quantity").cast("decimal(18,6)").alias("qty_dec")
    )
    per_supp = widget.groupBy("l_suppkey").agg(F.sum("qty_dec").alias("supp_qty"))
    total = widget.agg(
        (
            F.sum("qty_dec").cast("double")
            / F.count_distinct(F.col("l_suppkey"))
            * F.lit(1.2)
        ).alias("threshold")
    )
    excess = (
        per_supp.join(F.broadcast(total))
        .where(F.col("supp_qty").cast("double") > F.col("threshold"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("supp_nation"))
        .orderBy("s_name")
    )
