"""Round-9 batch: training-data mixing (token-budget allocation),
randomization inference (re-randomization p-value), and Bayesian /
frequentist A/B design readouts (Beta posterior, power analysis).

Same registry discipline as plans/extended_ops.py..4: integer-exact
or deterministically-rounded outputs, full DuckDB oracles, no
cartesian products, no Python in the hot path. Training-pipeline /
product-analytics extensions beyond the reference's own surface
(reference scope: /root/reference/etl.py — no counterpart there).
Registered under the ≤20/round birth cap; each entry is sf0.01-gated
at birth via tests/test_oracle_parity_sf01.py CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Training-data mixing: per-source token-budget allocation
# ---------------------------------------------------------------------------

TOKEN_BUDGET_ORACLE = r"""
WITH toks AS (
  SELECT source,
         UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
  WHERE len(trim(text)) > 0
), src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_tokens
  FROM toks GROUP BY source
), ndocs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(total_tokens) // 2 AS BIGINT) AS budget,
         CAST(SUM(distinct_tokens) AS BIGINT) AS w_sum
  FROM src
), alloc AS (
  SELECT s.source, d.n_docs, s.total_tokens, s.distinct_tokens,
         CAST(LEAST(
           s.total_tokens,
           CAST(CAST(t.budget AS HUGEINT) * s.distinct_tokens // t.w_sum
                AS BIGINT)
         ) AS BIGINT) AS alloc_tokens,
         t.budget
  FROM src s JOIN ndocs d USING (source) CROSS JOIN tot t
)
SELECT source, n_docs, total_tokens, distinct_tokens, alloc_tokens,
       -- widen BEFORE the x1e6: alloc_tokens*1000000 wraps int64 past
       -- ~9e12 tokens/source (silently in non-ANSI Spark), the same
       -- class the brown_forsythe fix eliminated
       CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // total_tokens
            AS BIGINT) AS fill_ppm,
       CAST(budget - SUM(alloc_tokens) OVER () AS BIGINT)
         AS unallocated_tokens
FROM alloc
ORDER BY source
"""


@register(
    "training_token_budget",
    oracle=TOKEN_BUDGET_ORACLE,
    tags=("training", "llm", "text"),
)
def training_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing token-budget allocation across sources — the
    planning step behind DoReMi-style mixture reweighting: given a
    global training budget (here: half the pool's tokens), allocate
    tokens to each source proportionally to a diversity weight
    (its DISTINCT-token mass — vocabulary contribution, the cheap
    exact stand-in for per-domain quality), capped at what the source
    actually has. The single-pass water-filling step: capped sources
    saturate, and the reported ``unallocated_tokens`` residual is the
    next round's redistribution pool (iterating to fixpoint is a
    driver-side loop over a 20-row frame — deliberately out of scope
    for the oracled readout).

    Exact integers end to end: budget·weight products widen to
    decimal(38,0)/HUGEINT before the floor division (non-negative
    operands, so Spark DIV and DuckDB // agree). Scale shape: one
    token explode + per-source count-distinct (two shuffles keyed on
    source/token), then all arithmetic on a sources-sized frame
    (broadcast totals, no second pass over data).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.where(F.length(F.trim("text")) > 0).select(
        "source",
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
        F.countDistinct("tok").cast("bigint").alias("distinct_tokens"),
    )
    ndocs = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = src.agg(
        # DIV, not /: the slash is double division and decimal casts
        # round HALF_UP, while integral DIV truncates exactly like
        # DuckDB's integer // (non-negative operands here anyway)
        F.expr("CAST(SUM(total_tokens) DIV 2 AS BIGINT)").alias("budget"),
        F.sum("distinct_tokens").cast("bigint").alias("w_sum"),
    )
    alloc = (
        src.join(ndocs, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "distinct_tokens",
            F.least(
                F.col("total_tokens"),
                F.expr(
                    "CAST((CAST(budget AS DECIMAL(38,0)) * distinct_tokens)"
                    " DIV w_sum AS BIGINT)"
                ),
            )
            .cast("bigint")
            .alias("alloc_tokens"),
            "budget",
        )
    )
    return alloc.select(
        "source",
        "n_docs",
        "total_tokens",
        "distinct_tokens",
        "alloc_tokens",
        F.expr(
            "CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000"
            " DIV total_tokens AS BIGINT)"
        ).alias("fill_ppm"),
        (
            F.col("budget")
            - F.sum("alloc_tokens").over(
                W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            )
        )
        .cast("bigint")
        .alias("unallocated_tokens"),
    ).orderBy("source")


# Portable deterministic hash shared verbatim by both engines (the
# PSI/A-B split idiom).
def _h(col, salt: str):
    return F.expr(
        f"CAST(conv(substring(md5(concat(CAST({col} AS STRING), '{salt}')),"
        " 1, 8), 16, 10) AS BIGINT)"
    )


def _h_sql(col: str, salt: str) -> str:
    return (
        f"CAST('0x' || substring(md5(CAST({col} AS VARCHAR) || '{salt}'), 1, 8)"
        " AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Randomization inference: re-randomization p-value for a mean difference
# ---------------------------------------------------------------------------

_RERAND_B = 64

PERMUTATION_ORACLE = f"""
WITH base AS (
  SELECT event_id,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v,
         {_h_sql('event_id', '#rt')} % 2 AS g
  FROM events
), obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS n1,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT) AS s1
  FROM base
), tobs AS (
  SELECT n, n1, n - n1 AS n0,
         CAST(n AS HUGEINT) * s1 - CAST(n1 AS HUGEINT) * s AS t_obs
  FROM obs
), reps AS (
  SELECT UNNEST(range({_RERAND_B})) AS b
), perm AS (
  SELECT r.b,
         CAST(SUM(CASE WHEN {_h_sql('event_id', "#rp' || CAST(r.b AS VARCHAR) || '")} % 2 = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS n1b,
         CAST(SUM(CASE WHEN {_h_sql('event_id', "#rp' || CAST(r.b AS VARCHAR) || '")} % 2 = 1
                  THEN v ELSE 0 END) AS BIGINT) AS s1b
  FROM base, reps r GROUP BY r.b
), tb AS (
  SELECT p.b,
         CAST(o.n AS HUGEINT) * p.s1b - CAST(p.n1b AS HUGEINT) * o.s AS t_b
  FROM perm p CROSS JOIN obs o
), extreme AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_extreme
  FROM tb CROSS JOIN tobs o
  WHERE ABS(t_b) >= ABS(o.t_obs)
)
SELECT o.n, o.n1, o.n0,
       CAST(FLOOR(CAST(o.t_obs AS DOUBLE)
                  / GREATEST(CAST(o.n1 AS DOUBLE) * o.n0, 1.0)) AS BIGINT)
         AS mean_diff_micro,
       e.n_extreme,
       CAST({_RERAND_B} AS INTEGER) AS n_replicas,
       CAST((1 + e.n_extreme) * 1000000 // {_RERAND_B + 1} AS BIGINT)
         AS p_ppm
FROM tobs o CROSS JOIN extreme e
"""


@register(
    "stats_permutation_pvalue",
    oracle=PERMUTATION_ORACLE,
    tags=("stats", "ab", "bootstrap"),
)
def stats_permutation_pvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization-inference p-value for a two-group mean difference
    — the assumption-free alternative to the t-test (Fisher's
    re-randomization argument, the standard robustness check behind
    A/B readouts): re-draw the treatment assignment B=64 times and ask
    how often the re-randomized statistic is at least as extreme as
    the observed one; p = (1 + #extreme)/(B + 1). Assignments are
    DETERMINISTIC md5 coin flips of (row, replica) — same recipe as
    the Poisson bootstrap — so the whole test is reproducible and
    fully oracled. The observed split here is itself a null hash
    split, so p lands mid-range (a real pipeline passes its actual
    assignment column); every output is an exact count either way.

    The statistic is the integer-exact cross form n·S1 − n1·S
    (∝ n1·n0·(mean1 − mean0)) widened to decimal(38,0)/HUGEINT, so no
    scale can overflow it; the mean-difference readout divides once in
    identical double trees (FLOOR, floor on both engines even when
    negative). Scale shape: one map-side ×B fan-out (broadcast literal
    range, no data-sized shuffle grows with B), one hash-agg to B rows
    with map-side combine — shuffle bytes O(B·partitions), independent
    of row count.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint").alias("v"),
        (_h("event_id", "#rt") % 2).alias("g"),
    )
    obs = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("n1"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.when(F.col("g") == 1, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
    )
    tobs = obs.select(
        "n",
        "n1",
        (F.col("n") - F.col("n1")).alias("n0"),
        "s",
        (
            F.col("n").cast("decimal(38,0)") * F.col("s1")
            - F.col("n1").cast("decimal(38,0)") * F.col("s")
        ).alias("t_obs"),
    )
    reps = spark.range(_RERAND_B).select(F.col("id").cast("int").alias("b"))
    flip = (
        _h("event_id", "#rp' || CAST(b AS STRING) || '") % 2
    )  # salt embeds the replica id, matching the oracle's string concat
    perm = (
        ev.crossJoin(F.broadcast(reps))
        .select("b", "v", flip.alias("gb"))
        .groupBy("b")
        .agg(
            F.sum("gb").cast("bigint").alias("n1b"),
            F.sum(F.when(F.col("gb") == 1, F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("s1b"),
        )
    )
    tb = perm.crossJoin(F.broadcast(obs.select("n", "s"))).select(
        (
            F.col("n").cast("decimal(38,0)") * F.col("s1b")
            - F.col("n1b").cast("decimal(38,0)") * F.col("s")
        ).alias("t_b")
    )
    extreme = tb.crossJoin(F.broadcast(tobs.select("t_obs"))).agg(
        F.sum(
            F.when(F.abs(F.col("t_b")) >= F.abs(F.col("t_obs")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_extreme")
    )
    return (
        tobs.crossJoin(F.broadcast(extreme))
        .select(
            "n",
            "n1",
            "n0",
            # GREATEST-guarded: a degenerate split (n1·n0 = 0 forces
            # t_obs = 0) must read 0 on both engines, not NULL/error.
            F.floor(
                F.col("t_obs").cast("double")
                / F.greatest(
                    F.col("n1").cast("double") * F.col("n0"), F.lit(1.0)
                )
            )
            .cast("bigint")
            .alias("mean_diff_micro"),
            "n_extreme",
            F.lit(_RERAND_B).cast("int").alias("n_replicas"),
            F.expr(
                f"CAST((1 + n_extreme) * 1000000 DIV {_RERAND_B + 1} AS BIGINT)"
            ).alias("p_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Bayesian A/B readout: Beta posterior summary per arm
# ---------------------------------------------------------------------------

BAYES_AB_ORACLE = """
WITH arms AS (
  SELECT DISTINCT user_id,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'ab1'), 1, 8)
              AS BIGINT) % 2 AS arm
  FROM events
), conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
), cells AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM arms a LEFT JOIN conv c USING (user_id)
  GROUP BY arm
), post AS (
  SELECT arm, n, s,
         CAST((1 + s) * 1000000 // (2 + n) AS BIGINT) AS post_mean_ppm,
         CAST(CAST(1000000000 AS HUGEINT) * (1 + s) * (1 + n - s)
              // (CAST(2 + n AS HUGEINT) * (2 + n) * (3 + n)) AS BIGINT)
           AS post_var_ppb
  FROM cells
), wide AS (
  SELECT
    MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
    MAX(CASE WHEN arm = 0 THEN s END) AS s_a,
    MAX(CASE WHEN arm = 0 THEN post_mean_ppm END) AS post_mean_a_ppm,
    MAX(CASE WHEN arm = 0 THEN post_var_ppb END) AS post_var_a_ppb,
    MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
    MAX(CASE WHEN arm = 1 THEN s END) AS s_b,
    MAX(CASE WHEN arm = 1 THEN post_mean_ppm END) AS post_mean_b_ppm,
    MAX(CASE WHEN arm = 1 THEN post_var_ppb END) AS post_var_b_ppb
  FROM post
)
SELECT n_a, s_a, post_mean_a_ppm, post_var_a_ppb,
       n_b, s_b, post_mean_b_ppm, post_var_b_ppb,
       CAST(post_mean_b_ppm - post_mean_a_ppm AS BIGINT) AS lift_ppm,
       CAST(FLOOR(1000000.0
                  * (CAST(post_mean_b_ppm - post_mean_a_ppm AS DOUBLE)
                     / 1000000.0)
                  / sqrt(CAST(post_var_a_ppb + post_var_b_ppb AS DOUBLE)
                         / 1000000000.0)) AS BIGINT) AS z_micro
FROM wide
"""


@register(
    "ab_bayes_beta_posterior",
    oracle=BAYES_AB_ORACLE,
    tags=("analytics", "experiment", "stats"),
)
def ab_bayes_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout: per-arm Beta(1+s, 1+n−s) posterior over
    the conversion rate (uniform prior) — the decision layer product
    teams put over ab_test_conversion's frequentist counts. Posterior
    mean (1+s)/(2+n) and variance a·b/((a+b)²(a+b+1)) are EXACT
    rationals, reported as floor-ppm/ppb integers (non-negative
    operands, so Spark DIV ≡ DuckDB //; products widen to
    decimal(38,0)/HUGEINT first). The normal-approximation
    z = Δmean/√(varA+varB) is the one double readout, computed from
    the already-rounded integer columns in identical expression trees
    (sqrt is IEEE correctly-rounded on both engines).

    Same content-addressed arm assignment and conversion definition
    as ab_test_conversion (md5(user, 'ab1') % 2; distinct purchase
    users). Scale shape: two distincts + one broadcast-ready left
    join; everything after is a 2-row frame.
    """
    ev = _t(spark, sf_dir, "events")
    arms = ev.select(
        "user_id",
        F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(user_id AS STRING),"
            " 'ab1')), 1, 8), 16, 10) AS BIGINT), 2)"
        ).alias("arm"),
    ).distinct()
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    cells = (
        arms.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("bigint").alias("s"),
        )
    )
    post = cells.select(
        "arm",
        "n",
        "s",
        F.expr("CAST((1 + s) * 1000000 DIV (2 + n) AS BIGINT)").alias(
            "post_mean_ppm"
        ),
        F.expr(
            "CAST(CAST(1000000000 AS DECIMAL(38,0)) * (1 + s) * (1 + n - s)"
            " DIV (CAST(2 + n AS DECIMAL(38,0)) * (2 + n) * (3 + n))"
            " AS BIGINT)"
        ).alias("post_var_ppb"),
    )
    wide = post.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s_a"),
        F.max(F.when(F.col("arm") == 0, F.col("post_mean_ppm"))).alias(
            "post_mean_a_ppm"
        ),
        F.max(F.when(F.col("arm") == 0, F.col("post_var_ppb"))).alias(
            "post_var_a_ppb"
        ),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s_b"),
        F.max(F.when(F.col("arm") == 1, F.col("post_mean_ppm"))).alias(
            "post_mean_b_ppm"
        ),
        F.max(F.when(F.col("arm") == 1, F.col("post_var_ppb"))).alias(
            "post_var_b_ppb"
        ),
    )
    return wide.select(
        "n_a",
        "s_a",
        "post_mean_a_ppm",
        "post_var_a_ppb",
        "n_b",
        "s_b",
        "post_mean_b_ppm",
        "post_var_b_ppb",
        (F.col("post_mean_b_ppm") - F.col("post_mean_a_ppm"))
        .cast("bigint")
        .alias("lift_ppm"),
        F.floor(
            F.lit(1000000.0)
            * (
                (F.col("post_mean_b_ppm") - F.col("post_mean_a_ppm")).cast(
                    "double"
                )
                / F.lit(1000000.0)
            )
            / F.sqrt(
                (F.col("post_var_a_ppb") + F.col("post_var_b_ppb")).cast(
                    "double"
                )
                / F.lit(1000000000.0)
            )
        )
        .cast("bigint")
        .alias("z_micro"),
    )


# ---------------------------------------------------------------------------
# Frequentist A/B design: required sample size per metric (power analysis)
# ---------------------------------------------------------------------------

# (z_{alpha/2} + z_beta)^2 for alpha = 0.05, power = 0.8, both z's
# quantized to micro (1.959964 + 0.841621 = 2.801585) and squared
# EXACTLY as integers — the driver-quantized-constant pattern, so the
# literal is bit-identical in the Spark plan and the oracle SQL.
# Units: micro^2 = 1e-12.
_Z_SUM2_P12 = 7848878512225

POWER_ORACLE = f"""
WITH x AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         SUM(CAST(v AS HUGEINT) * v) AS ssq
  FROM x GROUP BY event_type
)
SELECT event_type, n,
       CAST(CAST(s AS HUGEINT) * 10000 // n AS BIGINT) AS mean_micro,
       CAST((800 * CAST({_Z_SUM2_P12} AS HUGEINT)
               * (CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s)
             + GREATEST(CAST(s AS HUGEINT) * s, 1) * 1000000000000 - 1)
            // (GREATEST(CAST(s AS HUGEINT) * s, 1) * 1000000000000)
            AS BIGINT)
         AS n_required
FROM g
ORDER BY event_type
"""


@register(
    "ab_power_sample_size",
    oracle=POWER_ORACLE,
    tags=("analytics", "experiment", "stats"),
)
def ab_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: per metric (event_type), the sample
    size per arm required to detect a 5% lift in the mean at
    alpha = 0.05 with 80% power — n = ceil(2·(z_a + z_b)²·sigma²/delta²),
    the readout every experimentation platform publishes before a
    launch. The z constants are micro-quantized and squared exactly
    into one integer literal shared by both engines; values quantize
    to centi-units first (the sigma/delta RATIO is scale-invariant, so
    quantization coarseness only defines the metric, it doesn't
    approximate the formula), after which the whole computation is a
    ceiling division of exact integers:
    n = ceil(800·Z²·(n·Σv² − (Σv)²) / ((Σv)²·1e12)) — population
    variance and the 5%-of-mean delta folded into one fraction, moment
    sums widened to decimal(38,0)/HUGEINT so no scale overflows them
    (headroom to ~sf100), ceil-div via (num + den − 1) DIV den on
    non-negative operands where Spark DIV ≡ DuckDB //. The s² in the
    denominator is GREATEST(s²,1)-guarded on BOTH engines (the
    NEYMAN_ORACLE idiom): a metric summing to zero would otherwise
    make Spark DIV return NULL (non-ANSI) while DuckDB // raises —
    same edge, different failure mode.

    Scale shape: one scan, one map-side-combined hash-agg to
    |event_type| rows; everything after is per-group integer math.
    """
    x = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    vd = F.col("v").cast("decimal(19,0)")
    g = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ssq"),
    )
    return g.select(
        "event_type",
        "n",
        F.expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * 10000 DIV n AS BIGINT)"
        ).alias("mean_micro"),
        F.expr(
            f"CAST((800 * CAST({_Z_SUM2_P12} AS DECIMAL(38,0))"
            "        * (CAST(n AS DECIMAL(38,0)) * ssq"
            "           - CAST(s AS DECIMAL(38,0)) * s)"
            "      + GREATEST(CAST(s AS DECIMAL(38,0)) * s, 1)"
            "        * 1000000000000 - 1)"
            " DIV (GREATEST(CAST(s AS DECIMAL(38,0)) * s, 1)"
            "      * 1000000000000)"
            " AS BIGINT)"
        ).alias("n_required"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Language modeling: interpolated Kneser-Ney bigram probabilities
# ---------------------------------------------------------------------------

KNESER_NEY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents WHERE len(trim(text)) > 0
), bg AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n_succ
  FROM c12 GROUP BY w1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_pred FROM c12 GROUP BY w2
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM c12
), scored AS (
  -- interpolated KN with discount d = 3/4, all-rational:
  -- P = (c - 3/4)/c1 + (3/4)(n_succ/c1)(n_pred/B)
  --   = ((4c - 3)B + 3 n_succ n_pred) / (4 c1 B)   [observed => c>=1]
  SELECT b.w1, b.w2, b.c, x.c1, x.n_succ, n.n_pred,
         CAST((CAST(4 * b.c - 3 AS HUGEINT) * t.n_bigram_types
               + CAST(3 AS HUGEINT) * x.n_succ * n.n_pred) * 1000000
              // (CAST(4 AS HUGEINT) * x.c1 * t.n_bigram_types)
              AS BIGINT) AS p_kn_ppm
  FROM c12 b
  JOIN ctx x USING (w1)
  JOIN cont n USING (w2)
  CROSS JOIN tot t
)
SELECT w1, w2, c AS n_bigram, c1 AS n_context,
       n_succ, n_pred, p_kn_ppm
FROM scored
ORDER BY p_kn_ppm DESC, w1 ASC, w2 ASC
LIMIT 50
"""


@register(
    "text_kneser_ney_bigram",
    oracle=KNESER_NEY_ORACLE,
    tags=("text", "llm", "lm"),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the standard
    n-gram LM smoother (Chen & Goodman 1999) and the scoring backbone
    of perplexity-based data filtering (CCNet-style): discounted
    bigram evidence backs off to the CONTINUATION unigram (how many
    distinct contexts a word follows — 'Francisco' is frequent but
    follows only 'San', so its continuation mass is tiny, the insight
    that separates KN from naive backoff). With the discount fixed at
    the canonical d = 3/4 the whole estimate is one exact rational:
    P = ((4c−3)·B + 3·N1+(w1·)·N1+(·w2)) / (4·c(w1)·B), reported in
    truncating ppm — zero transcendentals, every factor an exact
    count, products widened to decimal(38,0)/HUGEINT so no corpus
    size overflows them. Top-50 readout with a total ordering
    (p desc, w1, w2).

    Scale shape: the bigram-count frame is the ``shared`` root (it
    feeds the context totals, the continuation counts, and the final
    scoring join — one corpus tokenization, not four); context and
    continuation stats are word-grain aggregates that shuffle on the
    word key; the readout is a TakeOrdered top-50. The same cached
    root is what a full perplexity scorer would reuse per document.
    """
    from data_lake_with_spark_spark.functions import text as TXT
    from data_lake_with_spark_spark.operators.plan_cache import shared

    docs = _t(spark, sf_dir, "documents")
    toked = docs.where(F.length(F.trim("text")) > 0).select(
        TXT.tokens("text").alias("tk")
    )
    bg = toked.where(F.size("tk") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.struct(
                    F.element_at("tk", i + 1).alias("w1"),
                    F.element_at("tk", i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = shared(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ctx = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_succ"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pred")
    )
    tot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"))
    scored = (
        c12.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c").alias("n_bigram"),
            F.col("c1").alias("n_context"),
            "n_succ",
            "n_pred",
            F.expr(
                "CAST((CAST(4 * c - 3 AS DECIMAL(38,0)) * n_bigram_types"
                "      + CAST(3 AS DECIMAL(38,0)) * n_succ * n_pred) * 1000000"
                " DIV (CAST(4 AS DECIMAL(38,0)) * c1 * n_bigram_types)"
                " AS BIGINT)"
            ).alias("p_kn_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("p_kn_ppm"), F.asc("w1"), F.asc("w2")
    ).limit(50)
