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
