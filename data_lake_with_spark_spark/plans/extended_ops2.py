"""Round-7 continuation batch: cohort analytics, interval coalescing,
ranking-quality metrics, and the remaining pipeline-adjacent families.

Same registry discipline as plans/extended_ops.py: integer-exact or
deterministically-rounded outputs, full DuckDB oracles, no cartesian
products, no Python in the hot path. These are training-pipeline /
product-analytics extensions beyond the reference's own surface
(reference scope: /root/reference/etl.py — no counterpart there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions.time import epoch_ms
from data_lake_with_spark_spark.plans.parity import pround
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------

COHORT_RETENTION_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS midx
  FROM orders
), first AS (
  SELECT o_custkey, MIN(midx) AS cidx FROM o GROUP BY o_custkey
), j AS (
  SELECT o.o_custkey, first.cidx, o.midx - first.cidx AS months_since
  FROM o JOIN first ON o.o_custkey = first.o_custkey
  WHERE o.midx - first.cidx <= 23
), m AS (
  SELECT cidx, months_since,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active
  FROM j GROUP BY cidx, months_since
), sized AS (
  SELECT *,
         SUM(CASE WHEN months_since = 0 THEN active ELSE 0 END)
           OVER (PARTITION BY cidx) AS cohort_size
  FROM m
)
SELECT printf('%04d-%02d', CAST(cidx // 12 AS INTEGER),
              CAST(cidx % 12 + 1 AS INTEGER)) AS cohort_month,
       CAST(months_since AS BIGINT) AS months_since,
       active,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       CAST(active * 1000000 // cohort_size AS BIGINT) AS retention_ppm
FROM sized
ORDER BY cohort_month, months_since
"""


@register(
    "cohort_retention_matrix",
    oracle=COHORT_RETENTION_ORACLE,
    tags=("analytics", "cohort", "retention"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: customers cohorted by
    first-order month, then for every (cohort, months-since) cell the
    distinct customers still ordering, plus retention as exact ppm
    against the cohort's month-0 size. All arithmetic on an integer
    month index (year*12+month-1), so the matrix is bit-exact.

    Scale shape: two keyed shuffles — a min-agg per customer (map-side
    combine collapses each partition to one row per customer before
    the exchange) and a distinct-count per (cohort, month) cell; the
    customer→cohort join is a co-partitioned shuffle join on the same
    key the min-agg just produced, so AQE reuses the exchange. Cohort
    sizing is a window over the tiny cell matrix (#months²), not the
    fact table. No per-row state, no sort of the fact table — the
    shape survives 100 TB of orders unchanged.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("midx"),
    )
    first = o.groupBy("o_custkey").agg(F.min("midx").alias("cidx"))
    j = (
        o.join(first, "o_custkey")
        .select("o_custkey", "cidx", (F.col("midx") - F.col("cidx")).alias("months_since"))
        .where(F.col("months_since") <= 23)
    )
    m = j.groupBy("cidx", "months_since").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("active")
    )
    sized = m.withColumn(
        "cohort_size",
        F.sum(F.when(F.col("months_since") == 0, F.col("active")).otherwise(0)).over(
            W.partitionBy("cidx")
        ),
    )
    return sized.select(
        F.format_string(
            "%04d-%02d",
            (F.col("cidx") / 12).cast("int"),
            (F.col("cidx") % 12 + 1).cast("int"),
        ).alias("cohort_month"),
        F.col("months_since").cast("bigint").alias("months_since"),
        "active",
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.expr("CAST(active * 1000000 DIV cohort_size AS BIGINT)").alias(
            "retention_ppm"
        ),
    ).orderBy("cohort_month", "months_since")


# ---------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands merge)
# ---------------------------------------------------------------------------

INTERVAL_COALESCE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + 1800 AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM flagged
), spans AS (
  SELECT user_id, island_id,
         MIN(s) AS span_start, MAX(e) AS span_end
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(span_end - span_start) AS BIGINT) AS coverage_sec,
       CAST(MAX(span_end - span_start) AS BIGINT) AS longest_sec
FROM spans GROUP BY user_id
ORDER BY user_id
"""


@register(
    "interval_coalesce_spans",
    oracle=INTERVAL_COALESCE_ORACLE,
    tags=("analytics", "interval", "window"),
)
def interval_coalesce_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user activity intervals (each event opens
    a 30-minute window) into maximal disjoint spans — the
    gaps-and-islands coalesce every sessionization/SLA/billing system
    needs. Island boundaries come from the running-max-of-end trick:
    an interval starts a new island iff its start exceeds the max end
    of ALL preceding intervals (not just the previous one — that
    classic bug splits an island when a long interval spans a short
    one). Output per user: span count, total covered seconds, longest
    span. Integer epoch-second arithmetic throughout.

    Scale shape: ONE shuffle on user_id; both windows and the island
    group-by are partition-local after it (Catalyst collapses the two
    same-key windows and the final agg into one exchange). The
    running max is O(1) state per row — no self-join, no O(n²)
    interval intersection. Skewed users are bounded by their own event
    count, and AQE skew-split handles a pathological single user.
    """
    iv = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 1800).alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(w_cum).alias("island_id")
    )
    spans = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("span_start"), F.max("e").alias("span_end")
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("coverage_sec"),
            F.max(F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("longest_sec"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Average precision (tie-aware, exact)
# ---------------------------------------------------------------------------

AVG_PRECISION_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(pos) AS BIGINT) AS p
  FROM s GROUP BY score
), r AS (
  SELECT p,
         CAST(SUM(p)   OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tp,
         CAST(SUM(cnt) OVER (ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
  FROM g
)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(MAX(cum_n) AS BIGINT) AS n_total,
       FLOOR(CAST(SUM(p * (cum_tp * 1000000000000 // cum_n)) AS HUGEINT)
             / (1000000000000.0 * SUM(p)) * 1000000.0 + 0.5) / 1000000.0
         AS average_precision
FROM r
"""


@register(
    "ml_average_precision",
    oracle=AVG_PRECISION_ORACLE,
    tags=("training", "stats", "llm", "ranking"),
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware average precision (the PR-AUC variant
    scikit-learn computes): AP = Σ_k ΔTP_k · precision@k over the
    DISTINCT-score spine descending, where precision@k = cumTP/cumN at
    each threshold. Ties collapse into one spine row, so the metric is
    well-defined regardless of how a sort would break them. Each
    precision term is quantized to an exact integer (cumTP·10¹² div
    cumN — truncating div matches between engines), summed as integers
    weighted by ΔTP, divided once at readout — no float accumulation
    order in the aggregate.

    Same 100 TB shape as ml_auc_rank_sum: one hash-agg to the distinct
    score spine (map-side combine), one ordered window over the spine
    (thousands of rows, not the corpus), one 1-row readout. Companion
    metric: AUC ranks all pairs; AP weights early precision — training
    pipelines report both.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, 0)
    r = g.select(
        "p",
        F.sum("p").over(w).cast("bigint").alias("cum_tp"),
        F.sum("cnt").over(w).cast("bigint").alias("cum_n"),
    )
    term = F.col("p") * F.expr("cum_tp * 1000000000000 DIV cum_n")
    return r.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.max("cum_n").cast("bigint").alias("n_total"),
        pround(
            F.sum(term.cast("decimal(38,0)")) / (F.lit(1e12) * F.sum("p")), 6
        ).alias("average_precision"),
    )


# ---------------------------------------------------------------------------
# Gain / lift deciles
# ---------------------------------------------------------------------------

GAIN_LIFT_ORACLE = """
WITH s AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), d AS (
  SELECT pos,
         NTILE(10) OVER (ORDER BY score DESC, vec_id ASC) AS decile
  FROM s
), m AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM d GROUP BY decile
), c AS (
  SELECT decile, n, n_pos,
         CAST(SUM(n)     OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
         CAST(SUM(n)     OVER () AS BIGINT) AS tot_n,
         CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
  FROM m
)
SELECT CAST(decile AS INTEGER) AS decile, n, n_pos,
       CAST(cum_pos * 1000000 // tot_pos AS BIGINT) AS capture_ppm,
       CAST(cum_pos * tot_n * 1000000 // (cum_n * tot_pos) AS BIGINT) AS lift_ppm
FROM c ORDER BY decile
"""


@register(
    "ml_gain_lift_deciles",
    oracle=GAIN_LIFT_ORACLE,
    tags=("training", "stats", "ranking"),
)
def ml_gain_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain/lift table by score decile — the campaign-targeting /
    model-triage readout: rank by score, cut into 10 equal-count
    deciles (total order via (score DESC, vec_id) so ties are
    deterministic), report per-decile positives, cumulative capture
    (ppm of all positives reached) and cumulative lift vs the random
    baseline — all integer until the two exact ppm divisions.

    The registered form uses a global NTILE (one total-order sort) —
    correct and fine to the low-billions. The distributed twin for
    true 100 TB is the segment_abc_distributed pattern already in this
    repo: two-phase exact NTILE reconstruction via a monotone band
    carry + within-band windows, bit-identical to this oracle. The
    downstream math (cumulatives over 10 rows) is scale-free.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    d = s.select(
        "pos",
        F.ntile(10)
        .over(W.orderBy(F.desc("score"), F.asc("vec_id")))
        .alias("decile"),
    )
    m = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = m.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(w_cum).cast("bigint").alias("cum_pos"),
        F.sum("n").over(w_all).cast("bigint").alias("tot_n"),
        F.sum("n_pos").over(w_all).cast("bigint").alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "n_pos",
        F.expr("CAST(cum_pos * 1000000 DIV tot_pos AS BIGINT)").alias("capture_ppm"),
        F.expr(
            "CAST(cum_pos * tot_n * 1000000 DIV (cum_n * tot_pos) AS BIGINT)"
        ).alias("lift_ppm"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds scaled to 2**32 (driver-quantized constants
# embedded identically in the Spark plan and the oracle SQL — the
# quantized-transcendental pattern): P(X<=k) for k = 0..5.
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)
_POIS_B = 40  # bootstrap replicas

def _pois_case_sql(hexpr: str) -> str:
    branches = " ".join(
        f"WHEN {hexpr} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 6 END"


POISSON_BOOTSTRAP_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), reps AS (
  SELECT UNNEST(range({_POIS_B})) AS b
), weighted AS (
  SELECT r.b,
         {_pois_case_sql(
             "CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) "
             "|| '#pb' || CAST(r.b AS VARCHAR)), 1, 8) AS BIGINT)"
         )} AS w,
         cents
  FROM base, reps r
), means AS (
  SELECT b,
         CAST(SUM(w * cents) * 1000000 // SUM(w) AS BIGINT) AS mean_micro
  FROM weighted GROUP BY b
), ranked AS (
  SELECT mean_micro,
         ROW_NUMBER() OVER (ORDER BY mean_micro, b) AS rn
  FROM means
), point AS (
  SELECT CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS point_micro,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM base
)
SELECT p.point_micro,
       (SELECT mean_micro FROM ranked WHERE rn = 2) AS ci_lo_micro,
       (SELECT mean_micro FROM ranked WHERE rn = {_POIS_B - 1}) AS ci_hi_micro,
       CAST({_POIS_B} AS INTEGER) AS n_replicas,
       p.n_rows
FROM point p
"""


@register(
    "stats_poisson_bootstrap_ci",
    oracle=POISSON_BOOTSTRAP_ORACLE,
    tags=("stats", "bootstrap", "sampling"),
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean order value — THE distributed
    bootstrap (Chamandy et al., Google 2012): instead of resampling n
    rows with replacement (impossible without global coordination),
    each row enters replica b with weight ~ Poisson(1), independently
    and statelessly. Weights here are DETERMINISTIC — inverse-CDF over
    a 32-bit md5 hash of (row, replica) against driver-quantized
    Poisson(1) CDF thresholds — so the whole sketch is reproducible
    and fully oracled. 40 replicas; CI = 2nd / 39th order statistic of
    the replica means (~95%); means in exact integer micro-cents
    (truncating div matches engines).

    Scale shape: one map-side ×40 fan-out (a literal range join, no
    data shuffle grows with B), one hash-agg to 40 rows with map-side
    combine — each executor contributes 40 partial (Σwx, Σw) pairs, so
    shuffle bytes are O(B·partitions), independent of row count. The
    order statistics run on a 40-row frame. At 100 TB the cents sums
    exceed BIGINT around 10¹⁸·micro — swap the two products to
    DECIMAL(38,0) (the dsum pattern in plans/parity.py) with no shape
    change.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    reps = spark.range(_POIS_B).select(F.col("id").cast("int").alias("b"))
    h = (
        "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '#pb', "
        "CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )
    branches = " ".join(f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    weighted = o.crossJoin(F.broadcast(reps)).select(
        "b", F.expr(f"CASE {branches} ELSE 6 END").alias("w"), "cents"
    )
    means = weighted.groupBy("b").agg(
        F.expr("CAST(SUM(w * cents) * 1000000 DIV SUM(w) AS BIGINT)").alias(
            "mean_micro"
        )
    )
    ranked = means.select(
        "mean_micro",
        F.row_number().over(W.orderBy("mean_micro", "b")).alias("rn"),
    )
    point = o.agg(
        F.expr("CAST(SUM(cents) * 1000000 DIV COUNT(*) AS BIGINT)").alias(
            "point_micro"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    lo = ranked.where(F.col("rn") == 2).select(
        F.col("mean_micro").alias("ci_lo_micro")
    )
    hi = ranked.where(F.col("rn") == _POIS_B - 1).select(
        F.col("mean_micro").alias("ci_hi_micro")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "point_micro",
            "ci_lo_micro",
            "ci_hi_micro",
            F.lit(_POIS_B).cast("int").alias("n_replicas"),
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (co-purchase cosine top-k)
# ---------------------------------------------------------------------------

ITEM_ITEM_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM op GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS i, b.l_partkey AS j,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
), sym AS (
  SELECT i AS part_id, j AS neighbor_id, co FROM pairs
  UNION ALL
  SELECT j AS part_id, i AS neighbor_id, co FROM pairs
), scored AS (
  SELECT s.part_id, s.neighbor_id, s.co,
         ni.n_orders AS n_i, nj.n_orders AS n_j,
         FLOOR(s.co / sqrt(ni.n_orders * nj.n_orders) * 1e6 + 0.5) / 1e6
           AS cosine
  FROM sym s
  JOIN n ni ON ni.l_partkey = s.part_id
  JOIN n nj ON nj.l_partkey = s.neighbor_id
  WHERE s.co >= 2
)
SELECT part_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, co, cosine
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY part_id
        ORDER BY co * co * 1000000000000 // (n_i * n_j) DESC,
                 neighbor_id ASC) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY part_id, rank
"""


@register(
    "recsys_item_item_topk",
    oracle=ITEM_ITEM_ORACLE,
    tags=("analytics", "recsys", "join", "topk"),
)
def recsys_item_item_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-5 co-purchase neighbors
    per part by cosine over the order-incidence vectors — cos(i,j) =
    co(i,j)/√(nᵢ·nⱼ), the classic Amazon item-to-item recommender.
    Ranking is INTEGER-exact: cosine is monotone in co²·10¹² div
    (nᵢ·nⱼ) for non-negative co-counts, so the top-k order never
    depends on float precision; the reported cosine rounds a single
    deterministic sqrt on integer inputs. Pairs need co ≥ 2 (singleton
    co-occurrence is noise).

    Scale shape: pair generation is a SELF-JOIN ON THE ORDER KEY — the
    per-order basket bounds the blow-up (Σ basket², never n²), which
    is exactly how co-occurrence is mined at 100 TB; a pathological
    mega-basket is capped upstream in real pipelines (and AQE
    skew-splits the join here). Then one hash-agg per (i,j), a ×2
    mirror, two broadcast-sized joins against the part-frequency
    frame, and a per-item top-k window partitioned by item. No
    all-pairs product anywhere.
    """
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("i"), F.col("b.l_partkey").alias("j")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    # Mirror via explode, not UNION: a union of two renamed projections
    # re-executes the whole pair-mining subtree (renamed projections
    # defeat ReuseExchange — ARCHITECTURE.md lesson); exploding each
    # pair into its two directions computes the pairs ONCE.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("part_id"),
                    F.col("j").alias("neighbor_id"),
                    F.col("co").alias("co"),
                ),
                F.struct(
                    F.col("j").alias("part_id"),
                    F.col("i").alias("neighbor_id"),
                    F.col("co").alias("co"),
                ),
            )
        ).alias("e")
    ).select("e.part_id", "e.neighbor_id", "e.co")
    ni = n.select(
        F.col("l_partkey").alias("part_id"), F.col("n_orders").alias("n_i")
    )
    nj = n.select(
        F.col("l_partkey").alias("neighbor_id"), F.col("n_orders").alias("n_j")
    )
    scored = (
        sym.where(F.col("co") >= 2)
        .join(ni, "part_id")
        .join(nj, "neighbor_id")
        .select(
            "part_id",
            "neighbor_id",
            "co",
            "n_i",
            "n_j",
            pround(F.col("co") / F.sqrt(F.col("n_i") * F.col("n_j")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("part_id").orderBy(
        F.expr("co * co * 1000000000000 DIV (n_i * n_j)").desc(),
        F.asc("neighbor_id"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
        .select("part_id", "neighbor_id", "rank", "co", "cosine")
        .orderBy("part_id", "rank")
    )


# ---------------------------------------------------------------------------
# Moving-average crossover signals
# ---------------------------------------------------------------------------

SMA_CROSSOVER_ORACLE = """
WITH daily AS (
  SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), win AS (
  SELECT day, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         CAST(SUM(cents) OVER (ORDER BY day
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum5,
         CAST(SUM(cents) OVER (ORDER BY day
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum20
  FROM daily
), sig AS (
  SELECT day, rn, sum5, sum20,
         CASE WHEN sum5 * 4 > sum20 THEN 1
              WHEN sum5 * 4 < sum20 THEN -1 ELSE 0 END AS signal
  FROM win WHERE rn >= 20
), flips AS (
  SELECT day, sum5, sum20, signal,
         LAG(signal) OVER (ORDER BY day) AS prev
  FROM sig
)
SELECT day,
       CASE WHEN signal = 1 THEN 'golden' ELSE 'death' END AS direction,
       CAST(sum5 // 5 AS BIGINT) AS sma5_cents,
       CAST(sum20 // 20 AS BIGINT) AS sma20_cents
FROM flips
WHERE prev IS NOT NULL AND signal * prev = -1
ORDER BY day
"""


@register(
    "finance_sma_crossover",
    oracle=SMA_CROSSOVER_ORACLE,
    tags=("finance", "timeseries", "window"),
)
def finance_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden/death-cross detector on the daily revenue series: SMA-5
    vs SMA-20, emitting the days where the fast average strictly
    crosses the slow one. The comparison is CROSS-MULTIPLIED
    (sum5·4 vs sum20) so the signal is pure BIGINT — no division, no
    float averages, no epsilon; the reported SMAs divide once with
    engine-matching truncation. A 20-day warmup (rn ≥ 20) excludes
    partially-filled windows, and only strict sign flips
    (signal·prev = −1) fire — a flat day parks the state rather than
    double-firing.

    Scale shape: one hash-agg collapses the fact table to the daily
    spine (map-side combine; cents summed as BIGINT so the result is
    order-independent), then three windows over the CALENDAR-BOUNDED
    spine (~2.5k rows for 7 years — constant in data volume, only the
    first agg sees the 100 TB). The unpartitioned window is fine
    precisely because its input is calendar-sized, not data-sized.
    """
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format(F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w5 = W.orderBy("day").rowsBetween(-4, 0)
    w20 = W.orderBy("day").rowsBetween(-19, 0)
    win = daily.select(
        "day",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.sum("cents").over(w5).cast("bigint").alias("sum5"),
        F.sum("cents").over(w20).cast("bigint").alias("sum20"),
    )
    sig = win.where(F.col("rn") >= 20).select(
        "day",
        "sum5",
        "sum20",
        F.when(F.col("sum5") * 4 > F.col("sum20"), 1)
        .when(F.col("sum5") * 4 < F.col("sum20"), -1)
        .otherwise(0)
        .alias("signal"),
    )
    flips = sig.select(
        "day",
        "sum5",
        "sum20",
        "signal",
        F.lag("signal").over(W.orderBy("day")).alias("prev"),
    )
    return (
        flips.where(
            F.col("prev").isNotNull() & (F.col("signal") * F.col("prev") == -1)
        )
        .select(
            "day",
            F.when(F.col("signal") == 1, "golden")
            .otherwise("death")
            .alias("direction"),
            F.expr("CAST(sum5 DIV 5 AS BIGINT)").alias("sma5_cents"),
            F.expr("CAST(sum20 DIV 20 AS BIGINT)").alias("sma20_cents"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Columnar-encoding advisor (lakehouse layout)
# ---------------------------------------------------------------------------

ENCODING_ADVISOR_ORACLE = """
WITH vals AS (
  SELECT 'l_returnflag' AS col_name, l_returnflag AS val FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', l_linestatus FROM lineitem
  UNION ALL
  SELECT 'l_shipdate', strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_orderkey', CAST(l_orderkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
), per_val AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(len(val) AS BIGINT) AS vlen
  FROM vals GROUP BY col_name, val
), per_col AS (
  SELECT col_name,
         CAST(COUNT(*) AS BIGINT) AS ndv,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(vlen * cnt) AS BIGINT) AS plain_bytes,
         CAST(SUM(vlen) + 2 * SUM(cnt) AS BIGINT) AS dict_bytes
  FROM per_val GROUP BY col_name
)
SELECT col_name, n, ndv,
       CAST(ndv * 1000000 // n AS BIGINT) AS distinct_ppm,
       plain_bytes, dict_bytes,
       CASE WHEN dict_bytes < plain_bytes THEN 'DICTIONARY'
            ELSE 'PLAIN' END AS recommendation
FROM per_col
ORDER BY col_name
"""


@register(
    "layout_encoding_advisor",
    oracle=ENCODING_ADVISOR_ORACLE,
    tags=("layout", "lakehouse", "stats"),
)
def layout_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor: per column, exact NDV, the distinct
    ratio, and a byte model comparing PLAIN (Σ value lengths) against
    DICTIONARY (Σ distinct-value lengths + 2-byte codes) — the
    decision a parquet writer's encoding chooser makes, surfaced as a
    table-maintenance audit. Needing Σ length over DISTINCT values
    (not just an NDV count) forces the two-level agg: collapse to
    (col, value, count) first, then fold per column — the same
    two-phase shape as two_phase_count_distinct, so no
    distinct-within-agg blowup.

    Scale shape: a 6-way map-side unpivot (stack — column count, not
    row count, multiplies), one hash-agg keyed (col, value) with
    map-side combine, then a 6-group fold. Per-(col,value) cardinality
    is the dictionary-page size a writer would build anyway; a
    high-NDV column's first agg is the honest cost of asking for exact
    NDV — swap in HLL (operators/sketches.py) when approximate is
    acceptable.
    """
    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.expr(
            "stack(6, "
            "'l_returnflag', l_returnflag, "
            "'l_linestatus', l_linestatus, "
            "'l_shipdate', date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss'), "
            "'l_partkey', CAST(l_partkey AS STRING), "
            "'l_orderkey', CAST(l_orderkey AS STRING), "
            "'l_linenumber', CAST(l_linenumber AS STRING)"
            ") AS (col_name, val)"
        )
    )
    per_val = vals.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).withColumn("vlen", F.length("val").cast("bigint"))
    per_col = per_val.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("vlen") * F.col("cnt")).cast("bigint").alias("plain_bytes"),
        (F.sum("vlen") + 2 * F.sum("cnt")).cast("bigint").alias("dict_bytes"),
    )
    return per_col.select(
        "col_name",
        "n",
        "ndv",
        F.expr("CAST(ndv * 1000000 DIV n AS BIGINT)").alias("distinct_ppm"),
        "plain_bytes",
        "dict_bytes",
        F.when(F.col("dict_bytes") < F.col("plain_bytes"), "DICTIONARY")
        .otherwise("PLAIN")
        .alias("recommendation"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Grid-blocked k-nearest-neighbors (spatial)
# ---------------------------------------------------------------------------

KNN_GRID_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS id,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8)
              AS BIGINT) % 180000000 AS x,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8)
              AS BIGINT) % 360000000 AS y
  FROM customer WHERE c_custkey < 1500
), q AS (
  SELECT id, x, y FROM pts WHERE id < 20
), offs AS (
  SELECT dx.dx, dy.dy
  FROM (SELECT UNNEST([-1, 0, 1]) AS dx) dx,
       (SELECT UNNEST([-1, 0, 1]) AS dy) dy
), qcells AS (
  SELECT q.id AS query_id, q.x AS qx, q.y AS qy,
         q.x // 20000000 + o.dx AS cx,
         q.y // 20000000 + o.dy AS cy
  FROM q, offs o
), cand AS (
  SELECT qc.query_id, qc.qx, qc.qy, p.id AS neighbor_id, p.x, p.y
  FROM qcells qc
  JOIN pts p ON p.x // 20000000 = qc.cx AND p.y // 20000000 = qc.cy
  WHERE p.id <> qc.query_id
), scored AS (
  SELECT query_id, neighbor_id,
         CAST((qx - x) * (qx - x) + (qy - y) * (qy - y) AS BIGINT) AS dist2
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist2 ASC, neighbor_id ASC) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "spatial_knn_grid",
    oracle=KNN_GRID_ORACLE,
    tags=("spatial", "join", "topk"),
)
def spatial_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked k-nearest-neighbors: each query point's 3×3 cell
    neighborhood (cell edge 20M micro-degrees) supplies candidates via
    a plain hash join on the cell key, then exact integer squared
    distance ranks the top-5 — the S2/H3-cell kNN shape production geo
    systems run. Shortlist semantics are explicit: neighbors beyond
    the 3×3 ring are out of scope by contract (a sparse cell would
    trigger ring expansion in a production variant), and the oracle
    applies the identical ring, so the check is exact, not
    approximate. Coordinates are the same portable md5 micro-degree
    points as spatial_grid_near_pairs.

    Scale shape: queries fan out ×9 map-side (cell offsets are a
    literal array explode, no shuffle), the candidate join is an
    equi-join on (cx, cy) — O(q·9·density), never q·n — and the
    per-query top-k window partitions on query_id. The corpus is
    never shuffled; only cell-matched candidates move.
    """
    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 1500)

    def coord(salt: str, mod: int):
        return F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(c_custkey AS STRING),"
            f" '{salt}')), 1, 8), 16, 10) AS BIGINT), {mod})"
        )

    pts = cust.select(
        F.col("c_custkey").alias("id"),
        coord("lat", 180000000).alias("x"),
        coord("lon", 360000000).alias("y"),
    )
    cell = 20000000
    home = pts.select(
        F.col("id").alias("neighbor_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x DIV {cell}").alias("cx"),
        F.expr(f"y DIV {cell}").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    qcells = (
        pts.where(F.col("id") < 20)
        .select(
            F.col("id").alias("query_id"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.expr(f"x DIV {cell}") + F.lit(dx)).alias("cx"),
                            (F.expr(f"y DIV {cell}") + F.lit(dy)).alias("cy"),
                        )
                        for dx, dy in offsets
                    ]
                )
            ).alias("c"),
        )
        .select("query_id", "qx", "qy", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    )
    cand = qcells.join(home, ["cx", "cy"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            (F.col("qx") - F.col("bx")) * (F.col("qx") - F.col("bx"))
            + (F.col("qy") - F.col("by")) * (F.col("qy") - F.col("by"))
        )
        .cast("bigint")
        .alias("dist2"),
    )
    w = W.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "dist2")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Event-sequence pattern matching (MATCH_RECOGNIZE analog)
# ---------------------------------------------------------------------------

PATTERN_REGEX_ORACLE = """
WITH coded AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'C' WHEN 'signup' THEN 'S'
              WHEN 'error' THEN 'E' WHEN 'view' THEN 'V'
              WHEN 'purchase' THEN 'P' ELSE 'X' END AS ch
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(ch, '' ORDER BY ts, event_id) AS path,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM coded GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(path, 'V[CE]*P')) AS BIGINT) AS n_matches
FROM paths
WHERE len(regexp_extract_all(path, 'V[CE]*P')) >= 1
ORDER BY user_id
"""


@register(
    "events_pattern_regex",
    oracle=PATTERN_REGEX_ORACLE,
    tags=("analytics", "sequence", "events"),
)
def events_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: each user's
    event history becomes a single-character-per-event string in exact
    (ts, event_id) order, and a regex counts occurrences of
    view→(clicks|errors)*→purchase ('V[CE]*P') — the
    funnel-with-wildcards query SQL's MATCH_RECOGNIZE exists for,
    expressed with two engine-portable primitives (ordered string
    aggregation + regexp_extract_all). The character class [CE]
    excludes both anchors, so greedy-vs-longest regex semantics
    coincide and Java regex (Spark) and RE2 (DuckDB) count
    identically — the determinism condition for cross-engine pattern
    queries.

    Scale shape: one shuffle on user_id; the ordered path build is
    array_sort(collect_list(struct)) inside the hash-agg (no window
    pass), and the regex runs once per USER, not per event. Per-user
    path length is bounded by that user's event count — the same skew
    bound as any per-user sessionization, AQE-splittable.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "signup", "S")
        .when(F.col("event_type") == "error", "E")
        .when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "purchase", "P")
        .otherwise("X")
        .alias("ch"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("ch")))
    )
    paths = ev.groupBy("user_id").agg(
        F.array_join(F.transform(ordered, lambda x: x["ch"]), "").alias("path"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    n_matches = F.size(F.regexp_extract_all("path", F.lit("V[CE]*P"), F.lit(0))).cast(
        "bigint"
    )
    return (
        paths.select("user_id", "n_events", n_matches.alias("n_matches"))
        .where(F.col("n_matches") >= 1)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Mutual information (event_type × weekday)
# ---------------------------------------------------------------------------

MUTUAL_INFO_ORACLE = """
WITH e AS (
  SELECT ((dayofweek(ts) + 6) % 7) AS dow, event_type FROM events
), cell AS (
  SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM e GROUP BY dow, event_type
), nd AS (
  SELECT dow, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY dow
), gl AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS gc FROM cell GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS gn FROM cell
), scored AS (
  SELECT cell.c,
         CAST(FLOOR(ln(CAST(cell.c AS DOUBLE)) * 1e6) AS BIGINT)
         + CAST(FLOOR(ln(CAST(tot.gn AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(FLOOR(ln(CAST(nd.n AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(FLOOR(ln(CAST(gl.gc AS DOUBLE)) * 1e6) AS BIGINT) AS dlp,
         CAST(FLOOR(ln(CAST(gl.gc AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(FLOOR(ln(CAST(tot.gn AS DOUBLE)) * 1e6) AS BIGINT) AS lpx,
         CAST(FLOOR(ln(CAST(nd.n AS DOUBLE)) * 1e6) AS BIGINT)
         - CAST(FLOOR(ln(CAST(tot.gn AS DOUBLE)) * 1e6) AS BIGINT) AS lpy,
         gl.gc, nd.n, tot.gn
  FROM cell
  JOIN nd USING (dow)
  JOIN gl USING (event_type)
  CROSS JOIN tot
)
SELECT CAST(MAX(gn) AS BIGINT) AS n_events,
       FLOOR(CAST(SUM(c * dlp) AS BIGINT) * 1.0 / MAX(gn) / 1e6 * 1e6 + 0.5)
         / 1e6 AS mutual_information,
       FLOOR(-CAST(SUM(c * lpx) AS BIGINT) * 1.0 / MAX(gn) / 1e6 * 1e6 + 0.5)
         / 1e6 AS h_x,
       FLOOR(-CAST(SUM(c * lpy) AS BIGINT) * 1.0 / MAX(gn) / 1e6 * 1e6 + 0.5)
         / 1e6 AS h_y
FROM scored
"""


@register(
    "stats_mutual_information",
    oracle=MUTUAL_INFO_ORACLE,
    tags=("stats", "quality"),
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and weekday, with the two
    marginal entropies — the dependence screen feature-selection
    pipelines run over every (feature, target) pair. Transcendentals
    use the repo's quantized-log discipline (stats_kl_weekday,
    stats_cramers_v precedent): every ln(count) quantizes to an exact
    BIGINT micro-nat FIRST, cell contributions sum as integers
    (order-independent), and the single float division happens at the
    1-row readout — so the metric is bit-stable across engines and
    partitionings. MI here is computed from the same quantized terms
    as the entropies, so MI ≤ min(H_X, H_Y) holds in the quantized
    arithmetic too.

    Scale shape: one hash-agg to the (type × dow) cell table (35
    cells — map-side combine does all the work), marginals and total
    derive from the CELL table (no second scan of the fact table),
    then broadcast joins among frames of ≤35 rows. Only the first agg
    touches the 100 TB.
    """
    ev = _t(spark, sf_dir, "events").select(
        ((F.dayofweek("ts") + 5) % 7).alias("dow"), "event_type"
    )
    cell = ev.groupBy("dow", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nd = cell.groupBy("dow").agg(F.sum("c").cast("bigint").alias("n"))
    gl = cell.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("gc"))
    tot = cell.agg(F.sum("c").cast("bigint").alias("gn"))

    def qln(col):
        return F.floor(F.log(col.cast("double")) * 1e6).cast("bigint")

    scored = (
        cell.join(nd, "dow")
        .join(gl, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "c",
            "gn",
            (
                qln(F.col("c")) + qln(F.col("gn")) - qln(F.col("n")) - qln(F.col("gc"))
            ).alias("dlp"),
            (qln(F.col("gc")) - qln(F.col("gn"))).alias("lpx"),
            (qln(F.col("n")) - qln(F.col("gn"))).alias("lpy"),
        )
    )
    return scored.agg(
        F.max("gn").cast("bigint").alias("n_events"),
        pround(
            F.sum(F.col("c") * F.col("dlp")).cast("bigint") / F.max("gn") / 1e6, 6
        ).alias("mutual_information"),
        pround(
            -F.sum(F.col("c") * F.col("lpx")).cast("bigint") / F.max("gn") / 1e6, 6
        ).alias("h_x"),
        pround(
            -F.sum(F.col("c") * F.col("lpy")).cast("bigint") / F.max("gn") / 1e6, 6
        ).alias("h_y"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

RAKE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, u.tok, u.pos
  FROM (
    SELECT doc_id,
           UNNEST(string_split_regex(trim(text), '\s+')) AS tok,
           UNNEST(range(len(string_split_regex(trim(text), '\s+')))) AS pos
    FROM documents
  ) u
  WHERE u.tok <> ''
), flagged AS (
  SELECT doc_id, tok, pos,
         CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END AS is_stop
  FROM toks
), islanded AS (
  SELECT doc_id, tok, pos, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), islands AS (
  SELECT doc_id, tok, pos, island FROM islanded WHERE is_stop = 0
), sized AS (
  SELECT doc_id, island, tok, pos,
         CAST(COUNT(*) OVER (PARTITION BY doc_id, island) AS BIGINT) AS plen
  FROM islands
), wstats AS (
  SELECT tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM sized GROUP BY tok
), wscore AS (
  SELECT tok, CAST(degree * 1000000 // freq AS BIGINT) AS wsc FROM wstats
), phrases AS (
  SELECT s.doc_id, s.island,
         string_agg(s.tok, ' ' ORDER BY s.pos) AS phrase,
         CAST(SUM(w.wsc) AS BIGINT) AS score_micro,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM sized s JOIN wscore w ON w.tok = s.tok
  GROUP BY s.doc_id, s.island
), agg AS (
  SELECT phrase, MAX(n_words) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(score_micro) AS score_micro
  FROM phrases GROUP BY phrase
)
SELECT phrase, CAST(n_words AS BIGINT) AS n_words, n_occurrences, score_micro
FROM (SELECT *, ROW_NUMBER() OVER (
        ORDER BY score_micro DESC, phrase ASC) AS rn FROM agg)
WHERE rn <= 20
ORDER BY score_micro DESC, phrase ASC
"""


@register(
    "text_rake_keywords",
    oracle=RAKE_ORACLE,
    tags=("text", "llm", "keywords"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency over the WHOLE corpus (degree = Σ length of the
    phrases it appears in — co-occurrence reach; frequency = raw
    count), and a phrase scores the sum of its words' scores. Word
    scores quantize to exact micro units (degree·10⁶ div freq), so
    phrase scores are BIGINT sums — the global top-20 is bit-stable.
    Identical phrase strings share identical token multisets, hence
    identical scores, so the cross-doc phrase collapse is exact.

    Scale shape: tokenization is a map-side explode; island ids come
    from one window keyed (doc, pos) — the same single-shuffle
    gaps-and-islands kernel as interval_coalesce_spans; word stats are
    one hash-agg over tokens; the word-score join back onto phrase
    members broadcasts the vocabulary (corpus vocab ≪ corpus); the
    final top-20 windows over DISTINCT phrases. No step carries
    per-document state beyond the phrase run itself.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )
    flagged = toks.withColumn(
        "is_stop", F.when(F.col("tok").isin("a", "the"), 1).otherwise(0)
    )
    w_isl = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("is_stop").over(w_isl)).where(
        F.col("is_stop") == 0
    )
    sized = islands.withColumn(
        "plen",
        F.count(F.lit(1)).over(W.partitionBy("doc_id", "island")).cast("bigint"),
    )
    wstats = sized.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    wscore = wstats.select(
        "tok", F.expr("CAST(degree * 1000000 DIV freq AS BIGINT)").alias("wsc")
    )
    joined = sized.join(F.broadcast(wscore), "tok")
    ordered = F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("tok"))))
    phrases = joined.groupBy("doc_id", "island").agg(
        F.array_join(F.transform(ordered, lambda x: x["tok"]), " ").alias("phrase"),
        F.sum("wsc").cast("bigint").alias("score_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
    agg = phrases.groupBy("phrase").agg(
        F.max("n_words").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("score_micro").alias("score_micro"),
    )
    w_top = W.orderBy(F.desc("score_micro"), F.asc("phrase"))
    return (
        agg.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= 20)
        .select("phrase", "n_words", "n_occurrences", "score_micro")
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
    )


# ---------------------------------------------------------------------------
# One-way ANOVA (exact integer moments)
# ---------------------------------------------------------------------------

ANOVA_ORACLE = """
WITH x AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS q FROM lineitem
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(q) AS BIGINT) AS s_g,
         CAST(SUM(q * q) AS BIGINT) AS ss_g
  FROM x GROUP BY grp
), terms AS (
  SELECT grp, n_g, s_g, ss_g,
         CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g
                    * 1000000.0) AS BIGINT) AS term_micro
  FROM g
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(ss_g) AS BIGINT) AS ssq,
         CAST(SUM(term_micro) AS BIGINT) AS sum_terms,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM terms
)
SELECT n, k,
       CAST(sum_terms
            - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                         * 1000000.0) AS BIGINT) AS BIGINT) AS ssb_micro,
       CAST(ssq * 1000000 - sum_terms AS BIGINT) AS ssw_micro,
       FLOOR((CAST(sum_terms - FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                                     * 1000000.0) AS DOUBLE) / (k - 1))
             / (CAST(ssq * 1000000 - sum_terms AS DOUBLE) / (n - k))
             * 1000000.0 + 0.5) / 1000000.0 AS f_stat
FROM tot
"""


@register(
    "stats_anova_oneway",
    oracle=ANOVA_ORACLE,
    tags=("stats",),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of line-item quantity across return-flag groups:
    between/within sums of squares from EXACT integer group moments
    (n, Σx, Σx² as BIGINT — quantity is integral, so the moments are
    order-independent), each group's Σ²/n quantized to micro units
    with an identical double expression shape on both engines
    (correctly-rounded IEEE division is deterministic; the floor
    boundary is the same everywhere), then F = (SSB/df₁)/(SSW/df₂)
    with one rounded readout. Completes the parametric-test family
    next to stats_welch_ttest (two groups, unequal variance) with the
    k-group equal-variance omnibus.

    Scale shape: ONE hash-agg with map-side combine produces the
    k-row moment table (k = 3); everything after is arithmetic on k
    rows. The moment sums exceed BIGINT only past ~10¹⁵ rows — swap
    to DECIMAL(38,0) (dsum) at that point, same plan.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    g = li.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("q").cast("bigint").alias("s_g"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss_g"),
    )
    terms = g.select(
        "n_g",
        "s_g",
        "ss_g",
        F.floor(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g")
            * 1000000.0
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    tot = terms.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("ss_g").cast("bigint").alias("ssq"),
        F.sum("term_micro").cast("bigint").alias("sum_terms"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    grand_micro = F.floor(
        F.col("s").cast("double") * F.col("s").cast("double") / F.col("n") * 1000000.0
    ).cast("bigint")
    ssb = (F.col("sum_terms") - grand_micro).cast("bigint")
    ssw = (F.col("ssq") * 1000000 - F.col("sum_terms")).cast("bigint")
    return tot.select(
        "n",
        "k",
        ssb.alias("ssb_micro"),
        ssw.alias("ssw_micro"),
        pround(
            (ssb.cast("double") / (F.col("k") - 1))
            / (ssw.cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Decision-stump best split by Gini impurity
# ---------------------------------------------------------------------------

BEST_SPLIT_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(pos) AS BIGINT) AS p
  FROM s GROUP BY score
), cum AS (
  SELECT score,
         CAST(SUM(cnt) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
         CAST(SUM(p) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n,
         CAST(SUM(p) OVER () AS BIGINT) AS ptot
  FROM g
), scored AS (
  SELECT score AS split_at, nl, n - nl AS nr,
         (pl * pl + (nl - pl) * (nl - pl)) * 1000000 // nl
         + ((ptot - pl) * (ptot - pl)
            + ((n - nl) - (ptot - pl)) * ((n - nl) - (ptot - pl)))
           * 1000000 // (n - nl) AS goodness_micro,
         n, ptot
  FROM cum WHERE nl < n
)
SELECT split_at, nl AS n_left, nr AS n_right, goodness_micro,
       FLOOR((CAST(n AS DOUBLE) - CAST(goodness_micro AS DOUBLE) / 1000000.0)
             / n * 1000000.0 + 0.5) / 1000000.0 AS weighted_gini
FROM (SELECT *, ROW_NUMBER() OVER (
        ORDER BY goodness_micro DESC, split_at ASC) AS rn FROM scored)
WHERE rn = 1
"""


@register(
    "ml_best_split_gini",
    oracle=BEST_SPLIT_ORACLE,
    tags=("training", "stats", "ml"),
)
def ml_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump learner: the exact best binary split of a
    numeric feature by weighted Gini impurity — the inner loop of
    every tree ensemble, run once, distributed. Over the
    distinct-score spine ascending, cumulative (n, positives) give
    each candidate split's left/right class counts; minimizing
    weighted impurity equals maximizing Σ_side (pos² + neg²)/n_side,
    which quantizes to exact BIGINT micro units (truncating div) — so
    the argmax split is bit-deterministic, no float impurity
    comparisons. Readout reports the winning threshold, both side
    sizes, and the achieved weighted Gini.

    Scale shape: identical to ml_auc_rank_sum — one hash-agg to the
    distinct-value spine, one ordered window over the spine (not the
    corpus), one top-1 selection. A tree trainer evaluating f features
    runs f of these in one pass by unpivoting features first; the
    per-feature math is this exact kernel.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w_cum = W.orderBy("score").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("score").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = g.select(
        "score",
        F.sum("cnt").over(w_cum).cast("bigint").alias("nl"),
        F.sum("p").over(w_cum).cast("bigint").alias("pl"),
        F.sum("cnt").over(w_all).cast("bigint").alias("n"),
        F.sum("p").over(w_all).cast("bigint").alias("ptot"),
    )
    scored = cum.where(F.col("nl") < F.col("n")).select(
        F.col("score").alias("split_at"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("nr"),
        F.expr(
            "(pl * pl + (nl - pl) * (nl - pl)) * 1000000 DIV nl"
            " + ((ptot - pl) * (ptot - pl)"
            "    + ((n - nl) - (ptot - pl)) * ((n - nl) - (ptot - pl)))"
            "   * 1000000 DIV (n - nl)"
        ).alias("goodness_micro"),
        "n",
    )
    w_top = W.orderBy(F.desc("goodness_micro"), F.asc("split_at"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") == 1)
        .select(
            "split_at",
            "n_left",
            F.col("nr").alias("n_right"),
            "goodness_micro",
            pround(
                (
                    F.col("n").cast("double")
                    - F.col("goodness_micro").cast("double") / 1000000.0
                )
                / F.col("n"),
                6,
            ).alias("weighted_gini"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-column advisor (lakehouse layout)
# ---------------------------------------------------------------------------

PARTITION_ADVISOR_ORACLE = """
WITH vals AS (
  SELECT 'l_returnflag' AS col_name, l_returnflag AS val FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', l_linestatus FROM lineitem
  UNION ALL
  SELECT 'ship_month', strftime(l_shipdate, '%Y-%m') FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
), per_val AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY col_name, val
), per_col AS (
  SELECT col_name,
         CAST(COUNT(*) AS BIGINT) AS ndv,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(MAX(cnt) AS BIGINT) AS max_part_rows
  FROM per_val GROUP BY col_name
)
SELECT col_name, n, ndv, max_part_rows,
       CAST(max_part_rows * ndv * 1000000 // n AS BIGINT) AS skew_ppm,
       CASE WHEN ndv < 3 THEN 'TOO_FEW_PARTITIONS'
            WHEN ndv > 1000 THEN 'TOO_MANY_PARTITIONS'
            WHEN max_part_rows * ndv * 1000000 // n > 3000000 THEN 'SKEWED'
            ELSE 'OK' END AS verdict
FROM per_col
ORDER BY col_name
"""


@register(
    "layout_partition_advisor",
    oracle=PARTITION_ADVISOR_ORACLE,
    tags=("layout", "lakehouse", "stats"),
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column advisor: for each candidate partition key,
    exact cardinality, the largest partition's row count, and skew as
    max/avg in ppm — then the verdict a table-layout reviewer gives
    (too few partitions to prune, too many files, skewed, or OK), on
    integer thresholds so the audit is deterministic. Month-derived
    keys are evaluated as their own candidate (ship_month), the usual
    fix for a too-granular timestamp key.

    Scale shape: map-side 4-way unpivot, one (col, value) hash-agg
    with map-side combine — per-value counts ARE the partition sizes
    a writer would produce — then a 4-group fold. The same two-level
    shape as layout_encoding_advisor; both are one-scan table audits.
    """
    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.expr(
            "stack(4, "
            "'l_returnflag', l_returnflag, "
            "'l_linestatus', l_linestatus, "
            "'ship_month', date_format(l_shipdate, 'yyyy-MM'), "
            "'l_suppkey', CAST(l_suppkey AS STRING)"
            ") AS (col_name, val)"
        )
    )
    per_val = vals.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per_col = per_val.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum("cnt").cast("bigint").alias("n"),
        F.max("cnt").cast("bigint").alias("max_part_rows"),
    )
    skew = F.expr("CAST(max_part_rows * ndv * 1000000 DIV n AS BIGINT)")
    return per_col.select(
        "col_name",
        "n",
        "ndv",
        "max_part_rows",
        skew.alias("skew_ppm"),
        F.when(F.col("ndv") < 3, "TOO_FEW_PARTITIONS")
        .when(F.col("ndv") > 1000, "TOO_MANY_PARTITIONS")
        .when(skew > 3000000, "SKEWED")
        .otherwise("OK")
        .alias("verdict"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Population stability index (score drift)
# ---------------------------------------------------------------------------

PSI_ORACLE = """
WITH s AS (
  SELECT CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || 'psi'), 1, 8)
              AS BIGINT) % 2 AS side,
         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS sc
  FROM embeddings
), binned AS (
  SELECT side,
         CASE WHEN sc < -200000 THEN 0 WHEN sc < -100000 THEN 1
              WHEN sc < 0 THEN 2 WHEN sc < 100000 THEN 3
              WHEN sc < 200000 THEN 4 ELSE 5 END AS bin
  FROM s
), cell AS (
  SELECT bin,
         CAST(COUNT_IF(side = 0) AS BIGINT) AS n_expected,
         CAST(COUNT_IF(side = 1) AS BIGINT) AS n_actual
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(n_expected) AS BIGINT) AS ne,
         CAST(SUM(n_actual) AS BIGINT) AS na
  FROM cell
), ppm AS (
  SELECT bin, n_expected, n_actual,
         CAST(n_expected * 1000000 // GREATEST(ne, 1) AS BIGINT) AS expected_ppm,
         CAST(n_actual * 1000000 // GREATEST(na, 1) AS BIGINT) AS actual_ppm
  FROM cell CROSS JOIN tot
)
SELECT CAST(bin AS INTEGER) AS bin, n_expected, n_actual,
       expected_ppm, actual_ppm,
       FLOOR(CAST((expected_ppm - actual_ppm)
                  * (CAST(FLOOR(ln(CAST(GREATEST(expected_ppm, 1) AS DOUBLE)) * 1e6)
                          AS BIGINT)
                     - CAST(FLOOR(ln(CAST(GREATEST(actual_ppm, 1) AS DOUBLE)) * 1e6)
                            AS BIGINT))
                  AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS contribution
FROM ppm ORDER BY bin
"""


@register(
    "ml_psi_score_drift",
    oracle=PSI_ORACLE,
    tags=("training", "stats", "drift", "ml"),
)
def ml_psi_score_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between an 'expected' and an 'actual'
    score population (portable md5 split stands in for
    train-time-vs-serving-time) over 6 FIXED score bins: per bin,
    PSI contribution = (p−q)·ln(p/q) with probabilities as exact
    integer ppm and logs quantized to micro-nats (the shared 10⁶
    ppm factor cancels inside the log difference, so ln(p_ppm) −
    ln(q_ppm) IS ln(p/q)). The model-monitoring drift metric every
    deployed scorer tracks; >0.2 total conventionally triggers
    retraining. Fixed bin edges (not quantiles) keep a bin's identity
    stable as the corpus grows — the same stability argument as
    training_quality_mixture. Zero-count protection: ppm values are
    clamped to ≥1 inside the log (standard epsilon smoothing) and the
    side totals to ≥1 under the division, so an empty bin or a
    vanished population yields a LARGE FINITE contribution instead of
    silently going NULL exactly when drift is most extreme.

    Scale shape: one scan, one 12-cell hash-agg (6 bins × 2 sides
    folded map-side), then arithmetic on ≤6 rows. The split hash and
    binning are per-row column math — nothing shuffles but the tiny
    cell table.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), 'psi')),"
            " 1, 8), 16, 10) AS BIGINT), 2)"
        ).alias("side"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("sc"),
    )
    binned = s.select(
        "side",
        F.when(F.col("sc") < -200000, 0)
        .when(F.col("sc") < -100000, 1)
        .when(F.col("sc") < 0, 2)
        .when(F.col("sc") < 100000, 3)
        .when(F.col("sc") < 200000, 4)
        .otherwise(5)
        .alias("bin"),
    )
    cell = binned.groupBy("bin").agg(
        F.count_if(F.col("side") == 0).cast("bigint").alias("n_expected"),
        F.count_if(F.col("side") == 1).cast("bigint").alias("n_actual"),
    )
    tot = cell.agg(
        F.sum("n_expected").cast("bigint").alias("ne"),
        F.sum("n_actual").cast("bigint").alias("na"),
    )
    ppm = cell.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_expected",
        "n_actual",
        F.expr(
            "CAST(n_expected * 1000000 DIV GREATEST(ne, 1) AS BIGINT)"
        ).alias("expected_ppm"),
        F.expr(
            "CAST(n_actual * 1000000 DIV GREATEST(na, 1) AS BIGINT)"
        ).alias("actual_ppm"),
    )

    def qln(col):
        # clamp to >= 1 ppm before the log: ln(1) = 0, never NULL
        return F.floor(
            F.log(F.greatest(col, F.lit(1)).cast("double")) * 1e6
        ).cast("bigint")

    term = (F.col("expected_ppm") - F.col("actual_ppm")) * (
        qln(F.col("expected_ppm")) - qln(F.col("actual_ppm"))
    )
    return ppm.select(
        F.col("bin").cast("int").alias("bin"),
        "n_expected",
        "n_actual",
        "expected_ppm",
        "actual_ppm",
        pround(term.cast("double") / 1e12, 6).alias("contribution"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# STL-style seasonal decomposition (trend + dow seasonal + residual)
# ---------------------------------------------------------------------------

STL_DOW_ORACLE = """
WITH daily AS (
  SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
         ((dayofweek(o_orderdate) + 6) % 7) AS dow,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), win AS (
  SELECT day, dow, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS n_days,
         CAST(SUM(cents) OVER (ORDER BY day
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sum7
  FROM daily
), trended AS (
  SELECT day, dow, cents,
         CAST(sum7 * 1000000 // 7 AS BIGINT) AS trend_micro,
         CAST(cents * 1000000 - sum7 * 1000000 // 7 AS BIGINT) AS detr_micro
  FROM win WHERE rn >= 4 AND rn <= n_days - 3
), seasonal AS (
  SELECT dow,
         CAST(SUM(detr_micro) // COUNT(*) AS BIGINT) AS seasonal_micro
  FROM trended GROUP BY dow
)
SELECT t.day, CAST(t.dow AS INTEGER) AS dow, t.cents,
       t.trend_micro, s.seasonal_micro,
       CAST(t.detr_micro - s.seasonal_micro AS BIGINT) AS residual_micro
FROM trended t JOIN seasonal s ON s.dow = t.dow
ORDER BY t.day
"""


@register(
    "timeseries_stl_dow",
    oracle=STL_DOW_ORACLE,
    tags=("timeseries", "stats", "window"),
)
def timeseries_stl_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily revenue series:
    trend = centered 7-day moving average (full windows only — the
    3-day edges are excluded, not padded), seasonal = per-weekday mean
    of the detrended series, residual = the rest. Every component
    lives in exact micro-cents (trend is sum7·10⁶ div 7 — truncating
    div matches engines), so decompose-then-recompose is bit-exact:
    cents·10⁶ = trend + seasonal + residual + the seasonal-mean
    truncation remainder, all BIGINT. The additive-decomposition
    X-11/STL shape with integer arithmetic in place of loess.

    Scale shape: one hash-agg collapses orders to the calendar-bounded
    daily spine; the centered window, the 7-row seasonal agg, and the
    broadcast seasonal join all run on spine-sized data (~2.5k rows,
    constant in data volume). Only the first agg sees the fact table.
    """
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("day"),
        ((F.dayofweek("o_orderdate") + 5) % 7).alias("dow"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    w_all = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    win = daily.select(
        "day",
        "dow",
        "cents",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
        F.sum("cents").over(w7).cast("bigint").alias("sum7"),
    )
    trended = win.where(
        (F.col("rn") >= 4) & (F.col("rn") <= F.col("n_days") - 3)
    ).select(
        "day",
        "dow",
        "cents",
        F.expr("CAST(sum7 * 1000000 DIV 7 AS BIGINT)").alias("trend_micro"),
        F.expr("CAST(cents * 1000000 - sum7 * 1000000 DIV 7 AS BIGINT)").alias(
            "detr_micro"
        ),
    )
    seasonal = trended.groupBy("dow").agg(
        F.expr("CAST(SUM(detr_micro) DIV COUNT(*) AS BIGINT)").alias(
            "seasonal_micro"
        )
    )
    return (
        trended.join(F.broadcast(seasonal), "dow")
        .select(
            "day",
            F.col("dow").cast("int").alias("dow"),
            "cents",
            "trend_micro",
            "seasonal_micro",
            (F.col("detr_micro") - F.col("seasonal_micro"))
            .cast("bigint")
            .alias("residual_micro"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit
# ---------------------------------------------------------------------------

HEAPS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), doc_tokens AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks FROM toks GROUP BY doc_id
), first_seen AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
), new_types AS (
  SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM first_seen GROUP BY first_doc
), curve AS (
  SELECT d.doc_id,
         CAST(SUM(d.n_toks) OVER (ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         CAST(SUM(COALESCE(nt.n_new, 0)) OVER (ORDER BY d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_v
  FROM doc_tokens d LEFT JOIN new_types nt ON nt.doc_id = d.doc_id
), logs AS (
  SELECT CAST(FLOOR(ln(CAST(cum_n AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(cum_v AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM curve
), moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(MAX(x) AS BIGINT) AS max_x, CAST(MAX(y) AS BIGINT) AS max_y
  FROM logs
)
SELECT m AS n_points,
       FLOOR((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS beta,
       max_x AS log_tokens_micro, max_y AS log_vocab_micro
FROM moments
"""


@register(
    "text_heaps_law",
    oracle=HEAPS_ORACLE,
    tags=("text", "llm", "stats"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law exponent for the corpus: vocabulary grows as
    V(n) ≈ K·n^β, and β comes from an OLS fit of ln V against ln n
    over the cumulative (tokens-seen, types-seen) curve — the
    vocabulary-growth diagnostic that tells a tokenizer/dedup pipeline
    whether a corpus is saturating (β falling) or still yielding new
    types. The curve needs distinct-so-far at every prefix — computed
    WITHOUT any per-prefix distinct: each type's first-occurrence doc
    (one min-agg) turns into new-types-per-doc, and two cumulative
    sums over the doc spine reconstruct the exact curve. Log moments
    quantize to micro-nats (BIGINT products, DECIMAL(38,0)
    accumulation) so the regression inputs are order-independent;
    the one float slope division uses identical expression shape on
    both engines.

    Scale shape: token explode (map-side), two hash-aggs (per-doc
    counts, per-type min), then windows over the DOC spine — at 100 TB
    the spine is millions of rows against billions of tokens, and the
    checkpointed curve could be further decimated (every k-th doc)
    without changing the estimator.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    doc_tokens = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks")
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    new_types = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w_cum = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    curve = (
        doc_tokens.join(new_types, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_toks").over(w_cum).cast("bigint").alias("cum_n"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w_cum)
            .cast("bigint")
            .alias("cum_v"),
        )
    )
    logs = curve.select(
        F.floor(F.log(F.col("cum_n").cast("double")) * 1e6).cast("bigint").alias("x"),
        F.floor(F.log(F.col("cum_v").cast("double")) * 1e6).cast("bigint").alias("y"),
    )
    moments = logs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.max("x").cast("bigint").alias("max_x"),
        F.max("y").cast("bigint").alias("max_y"),
    )
    beta = (
        F.col("m").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("m").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return moments.select(
        F.col("m").alias("n_points"),
        pround(beta, 6).alias("beta"),
        F.col("max_x").alias("log_tokens_micro"),
        F.col("max_y").alias("log_vocab_micro"),
    )


@register(
    "ml_gain_lift_distributed",
    oracle=GAIN_LIFT_ORACLE,
    tags=("training", "stats", "ranking", "scale-twin"),
)
def ml_gain_lift_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml_gain_lift_deciles' SCALE twin, pinned to the IDENTICAL
    oracle: the global NTILE(10) reconstructed with NO global sort —
    distinct scores form the band frame, strictly-better bands cumsum
    their counts into a broadcast carry (and the full-frame band sum
    supplies N, so construction stays lazy — no driver count), each
    row's exact global rank = carry + within-band row_number
    (hash-partitioned by score, tie-broken by vec_id exactly like the
    oracle's ORDER BY), and the decile comes from NTILE's
    first-N%10-buckets-take-ceil arithmetic. The per-row work shuffles
    once on the score key; nothing ever sorts in a single task. This
    is the segment_rfm_distributed two-level pattern applied to model
    evaluation — the form you run when the scored population is 10¹¹
    rows.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    band_cnt = s.groupBy("score").agg(F.count(F.lit(1)).alias("_bn"))
    w_before = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy(F.desc("score")).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    carry = band_cnt.select(
        "score",
        F.coalesce(F.sum("_bn").over(w_before), F.lit(0)).alias("_carry"),
        F.sum("_bn").over(w_all).cast("bigint").alias("_n"),
    )
    w_in = W.partitionBy("score").orderBy(F.asc("vec_id"))
    ranked = s.join(F.broadcast(carry), "score").select(
        "pos",
        "_n",
        (F.col("_carry") + F.row_number().over(w_in)).alias("_rank"),
    )
    n_tiles = 10
    size_small = F.expr(f"_n div {n_tiles}")
    n_big = F.col("_n") % n_tiles
    size_big = size_small + 1
    cutoff = n_big * size_big
    decile = (
        F.when(
            F.col("_rank") <= cutoff,
            ((F.col("_rank") - 1) / size_big).cast("int") + 1,
        ).otherwise(
            (n_big + (F.col("_rank") - cutoff - 1) / size_small).cast("int") + 1
        )
    ).alias("decile")
    m = ranked.select(decile, "pos").groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_tot = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = m.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(w_cum).cast("bigint").alias("cum_pos"),
        F.sum("n").over(w_tot).cast("bigint").alias("tot_n"),
        F.sum("n_pos").over(w_tot).cast("bigint").alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "n_pos",
        F.expr("CAST(cum_pos * 1000000 DIV tot_pos AS BIGINT)").alias("capture_ppm"),
        F.expr(
            "CAST(cum_pos * tot_n * 1000000 DIV (cum_n * tot_pos) AS BIGINT)"
        ).alias("lift_ppm"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (customer churn)
# ---------------------------------------------------------------------------

KAPLAN_MEIER_ORACLE = """
WITH o AS (
  SELECT o_custkey, CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS midx
  FROM orders
), cust AS (
  SELECT o_custkey, MIN(midx) AS fm, MAX(midx) AS lm FROM o GROUP BY o_custkey
), mx AS (SELECT MAX(lm) AS maxm FROM cust),
starts AS (SELECT fm AS midx, CAST(COUNT(*) AS BIGINT) AS n_start FROM cust GROUP BY fm),
ends_all AS (SELECT lm AS midx, CAST(COUNT(*) AS BIGINT) AS n_end FROM cust GROUP BY lm),
events AS (
  SELECT lm AS midx, CAST(COUNT(*) AS BIGINT) AS d
  FROM cust CROSS JOIN mx WHERE lm < maxm GROUP BY lm
), spine AS (SELECT DISTINCT midx FROM o),
j AS (
  SELECT s.midx,
         COALESCE(st.n_start, 0) AS n_start,
         COALESCE(en.n_end, 0) AS n_end,
         COALESCE(ev.d, 0) AS d
  FROM spine s
  LEFT JOIN starts st ON st.midx = s.midx
  LEFT JOIN ends_all en ON en.midx = s.midx
  LEFT JOIN events ev ON ev.midx = s.midx
), risked AS (
  SELECT midx, d,
         CAST(SUM(n_start) OVER (ORDER BY midx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - COALESCE(SUM(n_end) OVER (ORDER BY midx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM j
), packed AS (
  SELECT list(STRUCT_PACK(midx := midx, n_risk := n_risk, d := d) ORDER BY midx) AS arr
  FROM risked
), folded AS (
  SELECT arr,
         list_transform(range(1, len(arr) + 1),
           k -> CASE WHEN k = 1
                THEN 1000000 * (arr[1].n_risk - arr[1].d) // arr[1].n_risk
                ELSE list_reduce(
                  list_transform(list_slice(arr, 1, k),
                    e -> STRUCT_PACK(n_risk := e.n_risk, d := e.d, s := CAST(NULL AS BIGINT))),
                  (acc, e) -> STRUCT_PACK(n_risk := e.n_risk, d := e.d,
                    s := CASE WHEN acc.s IS NULL
                         THEN (1000000 * (acc.n_risk - acc.d) // acc.n_risk)
                              * (e.n_risk - e.d) // e.n_risk
                         ELSE acc.s * (e.n_risk - e.d) // e.n_risk END)).s
                END) AS surv
  FROM packed
)
SELECT printf('%04d-%02d', CAST(u.e.midx // 12 AS INTEGER),
              CAST(u.e.midx % 12 + 1 AS INTEGER)) AS month,
       u.e.n_risk AS n_risk, u.e.d AS n_events,
       CAST(surv[u.i] AS BIGINT) AS survival_ppm
FROM folded,
     LATERAL (SELECT UNNEST(arr) AS e, UNNEST(range(1, len(arr)+1)) AS i) u
ORDER BY month
"""


@register(
    "stats_kaplan_meier",
    oracle=KAPLAN_MEIER_ORACLE,
    tags=("stats", "survival", "cohort"),
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for customer lifetime: a customer
    enters at their first-order month, "dies" at their last-order
    month, and is RIGHT-CENSORED (not an event) when that last month
    is the observation edge — the textbook churn-survival setup. The
    risk set per month is two cumulative sums over the month spine
    (entries so far minus exits before now — no per-customer scan per
    month), and S(t) = Π(1 − dᵤ/nᵤ) runs as an EXACT INTEGER fold:
    S' = S·(n−d) div n in ppm, sequential by nature, bounded by
    CALENDAR length — the same two-phase bounded-artifact pattern as
    timeseries_holt_forecast. Spark folds once with an
    array-accumulator HOF (O(months)); the oracle mirrors with
    per-prefix folds (O(months²) — DuckDB 1.0's list_reduce drops
    list-typed accumulator members, so the oracle re-folds each
    prefix; same truncation sequence, bit-identical results).

    Scale shape: one hash-agg per customer (min/max month), three
    spine-keyed aggs, windows and the fold over the ~80-row spine.
    Only the first agg sees the fact table.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("midx"),
    )
    # shared(): cust feeds the censoring edge (maxm) plus the three
    # spine aggregations (starts/ends/events) — uncached, the orders
    # scan re-derived 7x (round-10 scan audit).
    from data_lake_with_spark_spark.operators.plan_cache import shared

    cust = shared(
        o.groupBy("o_custkey").agg(
            F.min("midx").alias("fm"), F.max("midx").alias("lm")
        )
    )
    maxm = cust.agg(F.max("lm").alias("maxm"))
    cust2 = cust.crossJoin(F.broadcast(maxm))
    starts = cust2.groupBy(F.col("fm").alias("midx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_start")
    )
    ends_all = cust2.groupBy(F.col("lm").alias("midx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_end")
    )
    events = (
        cust2.where(F.col("lm") < F.col("maxm"))
        .groupBy(F.col("lm").alias("midx"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    spine = o.select("midx").distinct()
    j = (
        spine.join(starts, "midx", "left")
        .join(ends_all, "midx", "left")
        .join(events, "midx", "left")
        .select(
            "midx",
            F.coalesce("n_start", F.lit(0)).alias("n_start"),
            F.coalesce("n_end", F.lit(0)).alias("n_end"),
            F.coalesce("d", F.lit(0)).cast("bigint").alias("d"),
        )
    )
    w_cum = W.orderBy("midx").rowsBetween(W.unboundedPreceding, 0)
    w_prev = W.orderBy("midx").rowsBetween(W.unboundedPreceding, -1)
    risked = j.select(
        "midx",
        "d",
        (
            F.sum("n_start").over(w_cum)
            - F.coalesce(F.sum("n_end").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    packed = risked.agg(
        F.array_sort(F.collect_list(F.struct("midx", "n_risk", "d"))).alias("arr")
    )
    folded = packed.select(
        "arr",
        F.expr(
            "aggregate(arr, named_struct('s', CAST(1000000 AS BIGINT),"
            " 'o', CAST(array() AS ARRAY<BIGINT>)), "
            "(acc, e) -> named_struct("
            "'s', acc.s * (e.n_risk - e.d) div e.n_risk, "
            "'o', concat(acc.o, array(acc.s * (e.n_risk - e.d) div e.n_risk))))"
        ).alias("f"),
    )
    return (
        folded.select(
            F.posexplode(F.arrays_zip(F.col("arr"), F.col("f.o"))).alias("i", "z")
        )
        .select(
            F.format_string(
                "%04d-%02d",
                (F.col("z.arr.midx") / 12).cast("int"),
                (F.col("z.arr.midx") % 12 + 1).cast("int"),
            ).alias("month"),
            F.col("z.arr.n_risk").alias("n_risk"),
            F.col("z.arr.d").alias("n_events"),
            F.col("z.o").cast("bigint").alias("survival_ppm"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Voice-activity detection segments (multimodal)
# ---------------------------------------------------------------------------

AUDIO_VAD_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(64)) AS i FROM documents WHERE doc_id < 200
), pcm AS (
  SELECT doc_id, i // 8 AS frame_idx,
         ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
  FROM s
), frames AS (
  SELECT doc_id, frame_idx,
         CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
  FROM pcm GROUP BY doc_id, frame_idx
), flagged AS (
  SELECT doc_id, frame_idx, energy,
         CASE WHEN energy > 6900000000 THEN 1 ELSE 0 END AS active
  FROM frames
), islanded AS (
  SELECT doc_id, frame_idx, energy, active,
         SUM(1 - active) OVER (PARTITION BY doc_id ORDER BY frame_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), segs AS (
  SELECT doc_id, island,
         CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
         CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
         CAST(COUNT(*) AS BIGINT) AS n_frames,
         CAST(SUM(energy) AS BIGINT) AS energy_sum
  FROM islanded WHERE active = 1
  GROUP BY doc_id, island
)
SELECT doc_id AS media_id, start_frame, end_frame, n_frames, energy_sum
FROM segs WHERE n_frames >= 2
ORDER BY media_id, start_frame
"""


@register(
    "multimodal_audio_vad",
    oracle=AUDIO_VAD_ORACLE,
    tags=("multimodal", "llm", "decode"),
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity detection (E5): decode real WAV
    bytes, frame the PCM (8 samples/frame), per-frame energy (exact
    Σv²), threshold, then coalesce consecutive active frames into
    segments and keep runs of ≥ 2 frames — the decode → feature →
    gate → segment pipeline an audio data curator runs before ASR,
    composed entirely from this repo's existing kernels (stdlib WAV
    decode, integer frame energy, the gaps-and-islands run detector —
    islands keyed on the running count of INACTIVE frames, so each
    active run gets a stable id). All arithmetic integral, so the
    analytic PCM oracle hash-matches.

    Scale shape: decode and framing are map-side (posexplode of the
    decoded array), one hash-agg per (media, frame), one window keyed
    per media for the run ids, one agg per run. Media files
    parallelize by row; nothing global.
    """
    from data_lake_with_spark_spark.operators import multimodal as MM

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_wav_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    frames = (
        dec.select("media_id", F.posexplode("values").alias("i", "v"))
        .select(
            "media_id",
            (F.col("i") / 8).cast("int").alias("frame_idx"),
            F.col("v").cast("bigint").alias("v"),
        )
        .groupBy("media_id", "frame_idx")
        .agg(F.sum(F.col("v") * F.col("v")).cast("bigint").alias("energy"))
    )
    flagged = frames.withColumn(
        "active", F.when(F.col("energy") > 6900000000, 1).otherwise(0)
    )
    w_isl = (
        W.partitionBy("media_id")
        .orderBy("frame_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islanded = flagged.withColumn(
        "island", F.sum(1 - F.col("active")).over(w_isl)
    )
    segs = (
        islanded.where(F.col("active") == 1)
        .groupBy("media_id", "island")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.max("frame_idx").cast("int").alias("end_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum("energy").cast("bigint").alias("energy_sum"),
        )
    )
    return (
        segs.where(F.col("n_frames") >= 2)
        .select("media_id", "start_frame", "end_frame", "n_frames", "energy_sum")
        .orderBy("media_id", "start_frame")
    )


# ---------------------------------------------------------------------------
# Bollinger-band breakouts (integer-exact, sqrt-free)
# ---------------------------------------------------------------------------

BOLLINGER_ORACLE = """
WITH daily AS (
  SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), win AS (
  SELECT day, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         CAST(SUM(cents) OVER (ORDER BY day
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS s20,
         SUM(CAST(cents AS HUGEINT) * cents) OVER (ORDER BY day
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS ss20
  FROM daily
), scored AS (
  SELECT day, cents, s20, ss20,
         (20 * cents - s20) AS dev20,
         80 * ss20 - 4 * CAST(s20 AS HUGEINT) * s20 AS var400x4
  FROM win WHERE rn >= 20
)
SELECT day, cents,
       CAST(s20 // 20 AS BIGINT) AS sma20_cents,
       CASE WHEN dev20 > 0 THEN 'above' ELSE 'below' END AS direction
FROM scored
WHERE CAST(dev20 AS HUGEINT) * dev20 > var400x4
ORDER BY day
"""


@register(
    "finance_bollinger_breakouts",
    oracle=BOLLINGER_ORACLE,
    tags=("finance", "timeseries", "window"),
)
def finance_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout days (daily revenue outside SMA20 ±
    2σ) with NO square root and NO floats: the band test
    |x − μ| > 2σ cross-multiplies to (20x − s)² > 80·Σx² − 4s² —
    population variance over the 20-day window in pure integers (the
    same moments trick as stats_anova_oneway, squared to kill the
    sqrt). Both sides are exact DECIMAL(38,0)-range integers, so the
    breakout set is bit-deterministic — a float-banded version flips
    edge days per partitioning; this one can't. Warmup excludes the
    first 19 partially-filled windows.

    Scale shape: one hash-agg to the calendar-bounded daily spine
    (exact BIGINT cents, order-independent), two sliding sums in ONE
    window pass over the spine, map-side breakout filter. Only the
    first agg sees the fact table.
    """
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_format(F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w20 = W.orderBy("day").rowsBetween(-19, 0)
    win = daily.select(
        "day",
        "cents",
        F.row_number().over(W.orderBy("day")).alias("rn"),
        F.sum("cents").over(w20).cast("bigint").alias("s20"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .over(w20)
        .alias("ss20"),
    )
    scored = win.where(F.col("rn") >= 20).select(
        "day",
        "cents",
        "s20",
        (20 * F.col("cents") - F.col("s20")).alias("dev20"),
        (
            F.lit(80).cast("decimal(38,0)") * F.col("ss20")
            - F.lit(4).cast("decimal(38,0)")
            * (F.col("s20").cast("decimal(38,0)") * F.col("s20"))
        ).alias("var400x4"),
    )
    return (
        scored.where(
            F.col("dev20").cast("decimal(38,0)") * F.col("dev20")
            > F.col("var400x4")
        )
        .select(
            "day",
            "cents",
            F.expr("CAST(s20 DIV 20 AS BIGINT)").alias("sma20_cents"),
            F.when(F.col("dev20") > 0, "above").otherwise("below").alias(
                "direction"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman-Ford, unrolled oracle)
# ---------------------------------------------------------------------------

def _sssp_oracle(n_iter: int = 4) -> str:
    """Unrolled weighted Bellman-Ford twin over the covisitation graph
    (cost = 1000 div co-window count: stronger ties are cheaper) —
    extends the unrolled-iterative oracle family (PageRank, LPA, BFS,
    CC) with weighted relaxation."""
    head = """WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
), pairs AS (
  SELECT a.user_id AS u, b.user_id AS v,
         CAST(1000 // COUNT(*) AS BIGINT) AS cost
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), ed AS (
  SELECT u AS src, v AS dst, cost FROM pairs
  UNION ALL SELECT v, u, cost FROM pairs
), d0 AS (
  SELECT MIN(src) AS id, CAST(0 AS BIGINT) AS dist FROM ed
)"""
    ctes = [head]
    for k in range(1, n_iter + 1):
        ctes.append(
            f""", d{k} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{k - 1}
    UNION ALL
    SELECT ed.dst AS id, d{k - 1}.dist + ed.cost AS dist
    FROM ed JOIN d{k - 1} ON ed.src = d{k - 1}.id
  ) GROUP BY id
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT id AS user_id, CAST(dist AS BIGINT) AS dist FROM d{n_iter}"
        "\nORDER BY dist, user_id"
    )


@register(
    "graph_sssp_weighted",
    oracle=_sssp_oracle(4),
    tags=("graph", "events", "iterative"),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths over the covisitation
    graph — edge cost 1000 div co-window-count, so frequently
    co-active users are 'closer' — within 4 relaxation rounds of the
    smallest node id. Bellman-Ford as the driver loop over
    checkpoint-truncated lazy plans (operators/graph.py:sssp_weighted,
    the weighted sibling of bfs_hops: one edge join + one min-agg per
    round); the converging default iterates to fixpoint, the pinned
    n_iter=4 registered here is what the unrolled SQL oracle can
    express — the fifth member of the unrolled-iterative family.
    Source selection is a bounded driver action; eager like the BFS.

    Scale shape per round: one shuffle keyed on the frontier join key
    and one min-agg — O(rounds) shuffles total, each proportional to
    edges incident to the reached set, never all-pairs.
    """
    from data_lake_with_spark_spark.operators.graph import sssp_weighted

    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
        "user_id",
    ).distinct()
    a = w.select("win", F.col("user_id").alias("a_id"))
    b = w.select("win", F.col("user_id").alias("b_id"))
    pairs = (
        a.join(b, "win")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") >= 3)
        .select("a_id", "b_id", F.expr("CAST(1000 DIV nw AS BIGINT)").alias("cost"))
    )
    pairs = pairs.localCheckpoint(eager=True)
    source = pairs.agg(F.min("a_id")).first()[0]
    dist = sssp_weighted(pairs, int(source), n_iter=4, id_col="user_id")
    return dist.select("user_id", "dist").orderBy("dist", "user_id")


# ---------------------------------------------------------------------------
# Learning curve: AUC at nested sample fractions
# ---------------------------------------------------------------------------

LEARNING_CURVE_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || 'lc'), 1, 8)
              AS BIGINT) AS h
  FROM embeddings
), fr AS (
  SELECT * FROM (VALUES (25, 1073741824), (50, 2147483648), (100, 4294967296))
           AS v(frac_pct, thr)
), member AS (
  SELECT fr.frac_pct, s.score, s.pos
  FROM s JOIN fr ON s.h < fr.thr
), g AS (
  SELECT frac_pct, score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM member GROUP BY frac_pct, score
), r AS (
  SELECT frac_pct, p, cnt,
         CAST(COALESCE(SUM(cnt) OVER (PARTITION BY frac_pct ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM g
)
SELECT CAST(frac_pct AS INTEGER) AS frac_pct,
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(cnt) - SUM(p) AS BIGINT) AS n_neg,
       FLOOR(((CAST(SUM(p * (2 * cumb + cnt + 1)) AS BIGINT) - SUM(p) * (SUM(p) + 1))
              / (2 * SUM(p) * (SUM(cnt) - SUM(p)))) * 1000000.0 + 0.5) / 1000000.0
         AS auc
FROM r GROUP BY frac_pct ORDER BY frac_pct
"""


@register(
    "ml_learning_curve_auc",
    oracle=LEARNING_CURVE_ORACLE,
    tags=("training", "stats", "ml", "sampling"),
)
def ml_learning_curve_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-curve readout: exact AUC at NESTED 25% / 50% / 100%
    sample fractions — nested by construction (membership is a hash
    threshold, so the 25% set ⊂ 50% ⊂ 100%), which is how a real
    scaling study holds data composition fixed while growing size. One
    scan fans rows into their fractions (a 3-row literal broadcast
    join on the hash inequality — map-side, ×matching-fractions), then
    the Mann-Whitney rank-sum AUC runs per fraction over
    fraction-partitioned distinct-score spines. Content-addressed
    sampling (md5) keeps the curve reproducible across engines and
    runs.

    Scale shape: the ml_auc_rank_sum shape with frac_pct prepended to
    every key — one hash-agg to the (fraction × score) spine, windows
    partitioned per fraction, 3-row readout.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), 'lc')),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    fr = spark.createDataFrame(
        [(25, 1 << 30), (50, 1 << 31), (100, 1 << 32)], "frac_pct int, thr bigint"
    )
    member = s.join(F.broadcast(fr), s.h < fr.thr).select("frac_pct", "score", "pos")
    g = member.groupBy("frac_pct", "score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w = (
        W.partitionBy("frac_pct")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = g.select(
        "frac_pct",
        "p",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("cumb"),
    )
    r2 = F.sum(F.col("p") * (2 * F.col("cumb") + F.col("cnt") + 1)).cast("bigint")
    return (
        r.groupBy("frac_pct")
        .agg(
            F.sum("p").cast("bigint").alias("n_pos"),
            (F.sum("cnt") - F.sum("p")).cast("bigint").alias("n_neg"),
            pround(
                (r2 - F.sum("p") * (F.sum("p") + 1))
                / (2 * F.sum("p") * (F.sum("cnt") - F.sum("p"))),
                6,
            ).alias("auc"),
        )
        .select(
            F.col("frac_pct").cast("int").alias("frac_pct"),
            "n_pos",
            "n_neg",
            "auc",
        )
        .orderBy("frac_pct")
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

ATTRIBUTION_U_ORACLE = """
WITH conv AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS cts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS touch_id, user_id, event_type,
         CAST(epoch_ms(ts) AS BIGINT) AS tts
  FROM events WHERE event_type <> 'purchase'
), path AS (
  SELECT c.conv_id, t.touch_id, t.event_type, t.tts,
         CAST(COUNT(*) OVER (PARTITION BY c.conv_id) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id
                            ORDER BY t.tts, t.touch_id) AS posn
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.tts < c.cts AND t.tts >= c.cts - 604800000
), credited AS (
  SELECT conv_id, event_type,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN posn = 1 THEN 400000
              WHEN posn = n THEN 400000
              ELSE 200000 // (n - 2) END AS credit_ppm
  FROM path
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_ppm) AS BIGINT) AS total_credit_ppm
FROM credited GROUP BY event_type ORDER BY event_type
"""


@register(
    "attribution_position_based",
    oracle=ATTRIBUTION_U_ORACLE,
    tags=("analytics", "attribution", "window"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    purchase distributes credit over the user's touches in the
    preceding 7 days — 40% to the first touch, 40% to the last, 20%
    split across the middles (integer ppm with truncating div; the
    sub-ppm remainder is deliberately unassigned rather than
    float-smeared). The standard upgrade from last-touch attribution
    (attribution_last_touch) when first-touch discovery matters.
    Positions are total-ordered by (ts, event_id), so credit
    assignment is deterministic under ties.

    Scale shape: one bounded-range join (user key + 7-day window — the
    join_range_within pattern, never user-cartesian across time), two
    windows partitioned per conversion, one hash-agg per channel. A
    user's path length bounds the per-conversion work.
    """
    ev = _t(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        epoch_ms("ts").alias("cts"),
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        "event_type",
        epoch_ms("ts").alias("tts"),
    )
    path = (
        conv.join(touch, "user_id")
        .where(
            (F.col("tts") < F.col("cts"))
            & (F.col("tts") >= F.col("cts") - 604800000)
        )
        .select(
            "conv_id",
            "touch_id",
            "event_type",
            F.count(F.lit(1))
            .over(W.partitionBy("conv_id"))
            .cast("bigint")
            .alias("n"),
            F.row_number()
            .over(W.partitionBy("conv_id").orderBy("tts", "touch_id"))
            .alias("posn"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when(F.col("posn") == 1, 400000)
        .when(F.col("posn") == F.col("n"), 400000)
        .otherwise(F.expr("200000 DIV (n - 2)"))
    )
    return (
        path.select("event_type", credit.alias("credit_ppm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_ppm").cast("bigint").alias("total_credit_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Embedding-population drift (centroid shift)
# ---------------------------------------------------------------------------

EMBEDDING_DRIFT_ORACLE = """
WITH s AS (
  SELECT CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || 'emb'), 1, 8)
              AS BIGINT) % 2 AS side,
         embedding::DOUBLE[] AS v
  FROM embeddings
), comp AS (
  SELECT side, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1e6) AS BIGINT) AS x
  FROM s
), dims AS (
  SELECT dim,
         CAST(SUM(CASE WHEN side = 0 THEN x ELSE 0 END)
              // COUNT_IF(side = 0) AS BIGINT) AS mean_a,
         CAST(SUM(CASE WHEN side = 1 THEN x ELSE 0 END)
              // COUNT_IF(side = 1) AS BIGINT) AS mean_b
  FROM comp GROUP BY dim
), scored AS (
  SELECT dim, mean_a, mean_b,
         (mean_a - mean_b) * (mean_a - mean_b) AS d2
  FROM dims
)
, tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
         CAST(SUM(d2) AS BIGINT) AS l2sq_micro2,
         CAST(MAX(d2) AS BIGINT) AS worst_d2
  FROM scored
), worst AS (
  SELECT CAST(dim AS INTEGER) AS worst_dim
  FROM (SELECT dim, ROW_NUMBER() OVER (ORDER BY d2 DESC, dim ASC) AS rn
        FROM scored) WHERE rn = 1
)
SELECT t.n_dims, t.l2sq_micro2, w.worst_dim, t.worst_d2
FROM tot t CROSS JOIN worst w
"""


@register(
    "ml_embedding_drift",
    oracle=EMBEDDING_DRIFT_ORACLE,
    tags=("training", "stats", "drift", "vector"),
)
def ml_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-population drift: centroid shift between two md5
    halves of the corpus (train-time vs serving-time stand-in) — per
    dimension, micro-scaled integer means (truncating div matches
    engines), squared differences summed exactly, plus the
    worst-drifting dimension (deterministic tie-break toward the
    lower dim index). The vector companion of ml_psi_score_drift: PSI
    watches a scalar score; this watches the representation itself.

    Scale shape: posexplode to (side, dim) components — map-side —
    then ONE hash-agg keyed by dim (64 groups, both sides folded in
    one pass via conditional sums), then arithmetic on 64 rows. The
    100 TB cost is one scan + one tiny-keyed agg.
    """
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), 'emb')),"
            " 1, 8), 16, 10) AS BIGINT), 2)"
        ).alias("side"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "xd"),
    ).select("side", "dim", F.floor(F.col("xd") * 1e6).cast("bigint").alias("x"))
    dims = s.groupBy("dim").agg(
        F.expr(
            "CAST(SUM(CASE WHEN side = 0 THEN x ELSE 0 END)"
            " DIV count_if(side = 0) AS BIGINT)"
        ).alias("mean_a"),
        F.expr(
            "CAST(SUM(CASE WHEN side = 1 THEN x ELSE 0 END)"
            " DIV count_if(side = 1) AS BIGINT)"
        ).alias("mean_b"),
    )
    scored = dims.select(
        "dim",
        ((F.col("mean_a") - F.col("mean_b")) * (F.col("mean_a") - F.col("mean_b")))
        .cast("bigint")
        .alias("d2"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum("d2").cast("bigint").alias("l2sq_micro2"),
        F.expr("CAST(max_by(dim, struct(d2, -dim)) AS INTEGER)").alias("worst_dim"),
        F.max("d2").cast("bigint").alias("worst_d2"),
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation of two daily series
# ---------------------------------------------------------------------------

XCORR_ORACLE = """
WITH rev AS (
  SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
), ord AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
), lags AS (
  SELECT UNNEST([-2, -1, 0, 1, 2]) AS lag
), m AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(r.x) AS HUGEINT) AS sx,
         CAST(SUM(o.y) AS HUGEINT) AS sy,
         SUM(CAST(r.x AS HUGEINT) * o.y) AS sxy,
         SUM(CAST(r.x AS HUGEINT) * r.x) AS sxx,
         SUM(CAST(o.y AS HUGEINT) * o.y) AS syy
  FROM lags l
  JOIN rev r ON TRUE
  JOIN ord o ON o.day = r.day + CAST(l.lag AS INTEGER)
  GROUP BY l.lag
)
SELECT CAST(lag AS INTEGER) AS lag, n,
       FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS corr
FROM m ORDER BY lag
"""


@register(
    "timeseries_cross_correlation",
    oracle=XCORR_ORACLE,
    tags=("timeseries", "stats"),
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily revenue and daily
    order volume at lags −2..+2 — the does-X-anticipate-Y diagnostic
    behind demand forecasting. Moments per lag are EXACT wide-integer
    sums (DECIMAL(38,0) products, order-independent); the Pearson
    readout divides once per lag with sqrt — which, unlike ln/exp, is
    IEEE-correctly-rounded and therefore bit-identical across engines
    on identical integer inputs. The lag shift is a 5-row literal
    fan-out joined on the shifted day key (map-side ×5), not five
    passes.

    Scale shape: two hash-aggs collapse both fact tables to their
    calendar-bounded daily spines; the lag join and moment agg run on
    spine-sized data. Only the first aggs see the 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(
        F.date_trunc("day", "l_shipdate").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    o = _t(spark, sf_dir, "orders")
    ordd = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    lags = spark.createDataFrame([(-2,), (-1,), (0,), (1,), (2,)], "lag int")
    joined = (
        rev.crossJoin(F.broadcast(lags))
        .join(
            ordd.select(F.col("day").alias("oday"), "y"),
            F.expr("oday = date_add(day, lag)"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.sqrt(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * F.sqrt(
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        pround(num / den, 6).alias("corr"),
    ).orderBy("lag")
