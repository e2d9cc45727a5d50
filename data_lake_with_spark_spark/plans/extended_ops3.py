"""Round-7 third-session batch: data-driven attribution, interval
estimation, schema profiling, and the remaining analytics families.

Same registry discipline as plans/extended_ops.py / extended_ops2.py:
integer-exact or deterministically-rounded outputs, full DuckDB
oracles, no cartesian products, no Python in the hot path. These are
training-pipeline / product-analytics extensions beyond the
reference's own surface (reference scope: /root/reference/etl.py — no
counterpart there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution (4-channel coalition game)
# ---------------------------------------------------------------------------

# The four touch channels and their journey-set bits. The game has
# n = 4 players, so the Shapley weight of a coalition S not containing
# the player is |S|!·(n−1−|S|)!  (denominator n! = 24 applied once at
# the end): |S|=0 → 6, 1 → 2, 2 → 2, 3 → 6.
_SHAPLEY_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}
# Static coalition lattice: for every channel, every coalition S with
# the channel absent — (channel, S, S∪{channel}, weight). 4×8 = 32
# rows, enumerated once at module load and shared verbatim by the
# Spark literal frame and the generated oracle VALUES list.
_SHAPLEY_LATTICE = [
    (name, mask, mask | bit, _SHAPLEY_W[bin(mask).count("1")])
    for name, bit in _SHAPLEY_CHANNELS
    for mask in range(16)
    if mask & bit == 0
]

_SHAPLEY_VALUES = ", ".join(
    f"('{c}', {ms}, {msb}, {w})" for c, ms, msb, w in _SHAPLEY_LATTICE
)

_SHAPLEY_BITS_SQL = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
)

ATTRIBUTION_SHAPLEY_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS widx,
         {_SHAPLEY_BITS_SQL} AS bit,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), j AS (
  SELECT user_id, widx, bit_or(bit) AS mask, MAX(conv) AS converted
  FROM ev GROUP BY user_id, widx
), v AS (
  SELECT mask,
         CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS v_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_j
  FROM j GROUP BY mask
), lat(channel, mask_s, mask_sb, w) AS (
  VALUES {_SHAPLEY_VALUES}
)
SELECT lat.channel,
       CAST(SUM(lat.w * (COALESCE(vb.v_ppm, 0) - COALESCE(vs.v_ppm, 0)))
            AS BIGINT) AS shapley_num,
       CAST(SUM(lat.w * (COALESCE(vb.v_ppm, 0) - COALESCE(vs.v_ppm, 0)))
            // 24 AS BIGINT) AS shapley_ppm
FROM lat
LEFT JOIN v vs ON lat.mask_s = vs.mask
LEFT JOIN v vb ON lat.mask_sb = vb.mask
GROUP BY lat.channel
ORDER BY lat.channel
"""


@register(
    "attribution_shapley",
    oracle=ATTRIBUTION_SHAPLEY_ORACLE,
    tags=("analytics", "attribution", "shapley"),
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Shapley-value channel attribution (Zhao et al.
    2018 shape): journeys are (user, epoch-week) pairs, a journey's
    coalition is the set of non-purchase channels touched that week,
    and the characteristic function v(S) is the empirical conversion
    rate (exact ppm, truncating div) of journeys whose coalition is
    EXACTLY S — unobserved coalitions contribute v = 0. With 4
    channels the 2⁴ lattice is fully enumerable, so the Shapley value
    is computed EXACTLY (no permutation sampling): for each channel,
    Σ over the 8 coalitions without it of |S|!·(3−|S|)!·(v(S∪{c})−v(S)),
    divided once by 4! = 24 (truncation toward zero — Spark `div` and
    DuckDB `//` agree on negative marginals). Unlike last-touch /
    U-shaped (attribution_last_touch, attribution_position_based) this
    credits channels by their marginal lift over every coalition, the
    fairness-axiom answer to cross-channel synergy.

    Scale shape: ONE keyed shuffle — the (user, week) journey
    aggregate with map-side bit_or/max combine; the conversion-rate
    table is ≤16 rows and the coalition lattice is a 32-row literal,
    so both Shapley joins are broadcast hash joins over static frames.
    At 100 TB the only data-sized stage is the journey agg, which
    partitions on user and combines before the exchange.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7").alias("widx"),
        F.expr(_SHAPLEY_BITS_SQL).alias("bit"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    journeys = ev.groupBy("user_id", "widx").agg(
        F.bit_or("bit").alias("mask"), F.max("conv").alias("converted")
    )
    v = journeys.groupBy("mask").agg(
        (F.sum("converted") * F.lit(1000000)).alias("knum"),
        F.count(F.lit(1)).alias("n_j"),
    ).select("mask", F.expr("knum div n_j").cast("bigint").alias("v_ppm"))

    lat = spark.createDataFrame(
        _SHAPLEY_LATTICE, "channel string, mask_s bigint, mask_sb bigint, w bigint"
    )
    vs = v.select(F.col("mask").alias("mask_s"), F.col("v_ppm").alias("v_s"))
    vb = v.select(F.col("mask").alias("mask_sb"), F.col("v_ppm").alias("v_b"))
    marg = (
        lat.join(F.broadcast(vs), "mask_s", "left")
        .join(F.broadcast(vb), "mask_sb", "left")
        .select(
            "channel",
            (
                F.col("w")
                * (F.coalesce("v_b", F.lit(0)) - F.coalesce("v_s", F.lit(0)))
            ).alias("contrib"),
        )
    )
    return (
        marg.groupBy("channel")
        .agg(F.sum("contrib").cast("bigint").alias("shapley_num"))
        .select(
            "channel",
            "shapley_num",
            F.expr("shapley_num div 24").cast("bigint").alias("shapley_ppm"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Wilson score confidence intervals for segment conversion rates
# ---------------------------------------------------------------------------

WILSON_CI_ORACLE = f"""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_active
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
    ON c.c_custkey = o.o_custkey
  GROUP BY c_mktsegment
), w AS (
  SELECT c_mktsegment, n_customers, n_active,
         CAST(n_active AS DOUBLE) / CAST(n_customers AS DOUBLE) AS p,
         CAST(n_customers AS DOUBLE) AS nn
  FROM seg
)
SELECT c_mktsegment AS mktsegment, n_customers, n_active,
       CAST(n_active * 1000000 // n_customers AS BIGINT) AS p_ppm,
       {pround_sql(
           "((p + 3.8416 / (2.0 * nn)) - 1.96 * sqrt((p * (1.0 - p)"
           " + 3.8416 / (4.0 * nn)) / nn)) / (1.0 + 3.8416 / nn)", 6)}
         AS wilson_lo,
       {pround_sql(
           "((p + 3.8416 / (2.0 * nn)) + 1.96 * sqrt((p * (1.0 - p)"
           " + 3.8416 / (4.0 * nn)) / nn)) / (1.0 + 3.8416 / nn)", 6)}
         AS wilson_hi
FROM w
ORDER BY mktsegment
"""


@register(
    "stats_wilson_ci",
    oracle=WILSON_CI_ORACLE,
    tags=("stats", "interval", "binomial"),
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the per-segment
    customer activation rate (share of customers with ≥1 order). The
    Wilson interval is the standard fix for the Wald interval's
    misbehavior at small n / extreme p (never leaves [0,1], no zero
    width at p̂ ∈ {0,1}). The rate itself is exact integer ppm; the
    bounds use the float path deliberately — every operation in the
    formula (+ − × ÷ sqrt) is IEEE-correctly-rounded and therefore
    bit-identical across engines given the identical expression tree
    (the sqrt-only portability rule from timeseries_cross_correlation),
    then portable-rounded to 6 dp.

    Scale shape: one distinct-projection shuffle on o_custkey (map-side
    combine), one left-semi-shaped join on the customer key, one
    5-group agg; the interval math is per-group scalar arithmetic.
    """
    cust = _t(spark, sf_dir, "customer")
    active = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    seg = (
        cust.join(active, cust.c_custkey == active.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("o_custkey").isNotNull().cast("bigint")).alias("n_active"),
        )
    )
    p = F.col("n_active").cast("double") / F.col("n_customers").cast("double")
    nn = F.col("n_customers").cast("double")
    z2 = F.lit(3.8416)
    center = p + z2 / (F.lit(2.0) * nn)
    margin = F.lit(1.96) * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nn)) / nn)
    denom = F.lit(1.0) + z2 / nn
    return seg.select(
        F.col("c_mktsegment").alias("mktsegment"),
        "n_customers",
        "n_active",
        F.expr("n_active * 1000000 div n_customers").cast("bigint").alias("p_ppm"),
        pround((center - margin) / denom, 6).alias("wilson_lo"),
        pround((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("mktsegment")


# ---------------------------------------------------------------------------
# Functional-dependency discovery (schema profiling)
# ---------------------------------------------------------------------------

# Candidate FDs to grade: (table, lhs, rhs). A fixed candidate set —
# production FD miners (TANE/HyFD) prune a lattice, but the per-
# candidate measurement below IS their inner loop.
_FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_brand"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"),
]


def _fd_oracle_one(tbl: str, lhs: str, rhs: str) -> str:
    return f"""
  SELECT '{tbl}' AS tbl, '{lhs}->{rhs}' AS fd,
         CAST(COUNT(*) AS BIGINT) AS lhs_card,
         CAST(SUM(tot) AS BIGINT) AS n_rows,
         CAST(SUM(mx) * 1000000 // SUM(tot) AS BIGINT) AS conf_ppm
  FROM (
    SELECT {lhs} AS x, MAX(c) AS mx, SUM(c) AS tot
    FROM (SELECT {lhs}, {rhs}, COUNT(*) AS c FROM {tbl} GROUP BY {lhs}, {rhs})
    GROUP BY {lhs}
  )"""


DQ_FD_DISCOVERY_ORACLE = (
    "\nUNION ALL\n".join(_fd_oracle_one(t, l, r) for t, l, r in _FD_CANDIDATES)
    + "\nORDER BY tbl, fd"
)


@register(
    "dq_fd_discovery",
    oracle=DQ_FD_DISCOVERY_ORACLE,
    tags=("dq", "profiling", "fd"),
)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery over a fixed
    candidate set: for each X→Y candidate, confidence = the fraction
    of rows kept by the best Y per X group (Σₓ maxᵧ count(x,y) / N,
    exact ppm) — 1.0 iff the FD holds exactly (g₃-error complement,
    the measure TANE/HyFD-style profilers compute per lattice node).
    Reports the LHS cardinality alongside so a user can spot
    key-like columns vs genuine dependencies.

    Scale shape: per candidate, two hash-agg shuffles with map-side
    combine — (x, y) counts, then per-x max/sum — followed by a
    scalar fold; candidates touch different tables and union into one
    result. Nothing is ever joined row-to-row, so the profile cost is
    a handful of independent aggregations regardless of table width.
    """
    parts = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        pair = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(lhs).alias("x"), F.col(rhs).alias("y"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        perx = pair.groupBy("x").agg(
            F.max("c").alias("mx"), F.sum("c").alias("tot")
        )
        parts.append(
            perx.agg(
                F.count(F.lit(1)).cast("bigint").alias("lhs_card"),
                F.sum("tot").cast("bigint").alias("n_rows"),
                F.sum("mx").cast("bigint").alias("keep"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                "lhs_card",
                "n_rows",
                F.expr("keep * 1000000 div n_rows").cast("bigint").alias("conf_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "fd")
