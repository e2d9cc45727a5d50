"""Round-8/9 batch: FIFO lot allocation, ML evaluation metrics
(Brier decomposition, Cohen's kappa), and DSIR-style training-data
selection weights (round 9).

Same registry discipline as plans/extended_ops.py..3: integer-exact or
deterministically-rounded outputs, full DuckDB oracles, no cartesian
products, no Python in the hot path. Training-pipeline /
product-analytics extensions beyond the reference's own surface
(reference scope: /root/reference/etl.py — no counterpart there).
Registered under the round-7 verdict's ≤20/round cap; each entry is
sf0.01-gated at birth via tests/test_oracle_parity_sf01.py
CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Portable deterministic hash shared verbatim by both engines: the
# first 8 hex chars of md5(key || salt) as a BIGINT (the PSI/A-B
# split idiom, plans/extended_ops2.py PSI_ORACLE).
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
# Inventory: FIFO lot allocation via running sums (no iteration)
# ---------------------------------------------------------------------------

FIFO_ORACLE = """
WITH flows AS (
  SELECT event_type, event_id, ts,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS mu
  FROM events
), demand AS (
  SELECT event_type,
         CAST(COALESCE(SUM(CASE WHEN mu < 0 THEN -mu END), 0) AS BIGINT)
           AS total_out
  FROM flows GROUP BY event_type
), lots AS (
  SELECT event_type, event_id, mu AS qty,
         CAST(COALESCE(SUM(mu) OVER (PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM flows WHERE mu > 0
)
SELECT l.event_type, l.event_id, l.qty,
       CAST(LEAST(l.qty, GREATEST(d.total_out - l.cum_before, 0)) AS BIGINT)
         AS consumed,
       CAST(l.qty - LEAST(l.qty, GREATEST(d.total_out - l.cum_before, 0))
            AS BIGINT) AS remaining,
       CASE WHEN d.total_out - l.cum_before >= l.qty THEN 'CONSUMED'
            WHEN d.total_out - l.cum_before > 0 THEN 'PARTIAL'
            ELSE 'OPEN' END AS status
FROM lots l JOIN demand d USING (event_type)
ORDER BY l.event_type, l.event_id
"""


@register(
    "inventory_fifo_allocation",
    oracle=FIFO_ORACLE,
    tags=("inventory", "window", "finance"),
)
def inventory_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching WITHOUT iteration: positive event values are
    inflow lots (ordered by ts, event_id), negative values aggregate
    to a per-type total demand, and each lot's consumption falls out
    of interval arithmetic — a lot covering cumulative range
    [cum_before, cum_before+qty) against demand D consumes
    clamp(D − cum_before, 0, qty). The cost-basis / lot-accounting
    primitive usually written as a procedural loop, expressed as one
    running-sum window + a broadcast of per-type demand — the
    closed-form that makes FIFO tractable at 100 TB (a loop over lots
    is not).

    Exact integer micro-units end to end; statuses CONSUMED / PARTIAL
    / OPEN partition the lots at the demand frontier.
    """
    flows = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("mu"),
    )
    demand = flows.groupBy("event_type").agg(
        F.coalesce(
            F.sum(F.when(F.col("mu") < 0, -F.col("mu"))), F.lit(0)
        ).cast("bigint").alias("total_out")
    )
    lots = flows.where(F.col("mu") > 0).select(
        "event_type",
        "event_id",
        F.col("mu").alias("qty"),
        F.coalesce(
            F.sum("mu").over(
                W.partitionBy("event_type")
                .orderBy("ts", "event_id")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint").alias("cum_before"),
    )
    open_demand = F.col("total_out") - F.col("cum_before")
    consumed = F.least(F.col("qty"), F.greatest(open_demand, F.lit(0)))
    return (
        lots.join(F.broadcast(demand), "event_type")
        .select(
            "event_type",
            "event_id",
            "qty",
            consumed.cast("bigint").alias("consumed"),
            (F.col("qty") - consumed).cast("bigint").alias("remaining"),
            F.when(open_demand >= F.col("qty"), "CONSUMED")
            .when(open_demand > 0, "PARTIAL")
            .otherwise("OPEN")
            .alias("status"),
        )
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# ML eval: Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------

BRIER_ORACLE = f"""
WITH s AS (
  SELECT {_h_sql('event_id', 'brp')} % 1000 AS p_ppt,
         CASE WHEN {_h_sql('event_id', 'bry')} % 1000
                   < {_h_sql('event_id', 'brp')} % 1000
              THEN 1 ELSE 0 END AS y
  FROM events
), b AS (
  SELECT p_ppt // 100 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p_ppt) AS BIGINT) AS sum_p_ppt,
         CAST(SUM(y) AS BIGINT) AS sum_y
  FROM s GROUP BY 1
), g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(sum_y) * 1000000 // SUM(n) AS BIGINT) AS ybar_ppm
  FROM b
), c AS (
  SELECT bin, n,
         CAST(sum_p_ppt * 1000 // n AS BIGINT) AS mean_p_ppm,
         CAST(sum_y * 1000000 // n AS BIGINT) AS mean_y_ppm,
         n_total, ybar_ppm
  FROM b CROSS JOIN g
)
SELECT CAST(bin AS INTEGER) AS bin, n, mean_p_ppm, mean_y_ppm,
       CAST(n * (mean_p_ppm - mean_y_ppm) * (mean_p_ppm - mean_y_ppm)
            AS BIGINT) AS reliability_num,
       CAST(n * (mean_y_ppm - ybar_ppm) * (mean_y_ppm - ybar_ppm)
            AS BIGINT) AS resolution_num,
       CAST(ybar_ppm * (1000000 - ybar_ppm) AS BIGINT) AS uncertainty_ppm2
FROM c ORDER BY bin
"""


@register(
    "ml_brier_decomposition",
    oracle=BRIER_ORACLE,
    tags=("ml", "stats", "calibration"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — Brier = reliability −
    resolution + uncertainty — over 10 fixed prediction bins: the
    probabilistic-forecast diagnostic that separates miscalibration
    (reliability: bin mean prediction vs bin outcome rate) from
    discrimination (resolution: bin outcome rate vs base rate). The
    companion readout to ml_calibration_ece (which reports only the
    reliability axis). Portable scores: prediction p = md5 permille,
    outcome drawn well-calibrated (y = [second hash < p]), so
    reliability is near-zero by construction and resolution is
    non-trivial — both falsifiable.

    Numerators stay exact BIGINTs (n · Δppm², ≤1e17 at sf1); the
    reader divides by n_total·1e12 off-engine. One scan, one 10-cell
    hash-agg, one broadcast of the 1-row base rate — the shuffle is
    10 rows.
    """
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        (_h("event_id", "brp") % 1000).alias("p_ppt"),
        F.when(
            (_h("event_id", "bry") % 1000) < (_h("event_id", "brp") % 1000),
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    b = s.groupBy(F.expr("p_ppt DIV 100").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p_ppt").cast("bigint").alias("sum_p_ppt"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )
    # global base rate via a window over the 10-row bin frame (ONE
    # events scan; an agg + self-join would re-scan the fact table)
    c = b.select(
        "bin",
        "n",
        F.expr("CAST(sum_p_ppt * 1000 DIV n AS BIGINT)").alias("mean_p_ppm"),
        F.expr("CAST(sum_y * 1000000 DIV n AS BIGINT)").alias("mean_y_ppm"),
        F.expr(
            "CAST(SUM(sum_y) OVER () * 1000000 DIV SUM(n) OVER () AS BIGINT)"
        ).alias("ybar_ppm"),
    )
    dp = F.col("mean_p_ppm") - F.col("mean_y_ppm")
    dr = F.col("mean_y_ppm") - F.col("ybar_ppm")
    return c.select(
        F.col("bin").cast("int").alias("bin"),
        "n",
        "mean_p_ppm",
        "mean_y_ppm",
        (F.col("n") * dp * dp).cast("bigint").alias("reliability_num"),
        (F.col("n") * dr * dr).cast("bigint").alias("resolution_num"),
        (F.col("ybar_ppm") * (F.lit(1000000) - F.col("ybar_ppm")))
        .cast("bigint")
        .alias("uncertainty_ppm2"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# ML eval: Cohen's kappa between two deterministic raters
# ---------------------------------------------------------------------------

KAPPA_ORACLE = f"""
WITH r AS (
  SELECT CASE WHEN {_h_sql('event_id', 'ka')} % 1000 < 500 THEN 1 ELSE 0 END
           AS a,
         CASE WHEN {_h_sql('event_id', 'ka')} % 1000
                   + {_h_sql('event_id', 'kb')} % 200 - 100 < 500
              THEN 1 ELSE 0 END AS b
  FROM events
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         CAST(SUM(a) AS BIGINT) AS a1,
         CAST(SUM(b) AS BIGINT) AS b1
  FROM r
), p AS (
  SELECT n, agree,
         CAST(agree * 1000000 // n AS BIGINT) AS po_ppm,
         CAST((a1 * 1000000 // n) * (b1 * 1000000 // n)
              // 1000000
              + ((n - a1) * 1000000 // n) * ((n - b1) * 1000000 // n)
              // 1000000 AS BIGINT) AS pe_ppm
  FROM m
)
SELECT n, agree, po_ppm, pe_ppm,
       -- sign-extracted magnitude, dividing only non-negative
       -- operands. Measured: DuckDB integer // TRUNCATES toward zero
       -- exactly like Spark DIV (-7//2 = -3 on BIGINT/HUGEINT), so
       -- the engines agree on negative kappa either way; the idiom
       -- stays as defense-in-depth — it is exact under BOTH floor
       -- and truncate semantics, so a future engine/type change
       -- cannot silently diverge (pinned cross-engine on negative
       -- inputs in tests/test_extended_ops4.py)
       CAST(CASE WHEN po_ppm >= pe_ppm
                 THEN (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
                 ELSE -((pe_ppm - po_ppm) * 1000000 // (1000000 - pe_ppm))
            END AS BIGINT) AS kappa_micro
FROM p
"""


@register(
    "ml_cohens_kappa",
    oracle=KAPPA_ORACLE,
    tags=("ml", "stats", "agreement"),
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two binary
    raters, κ = (p_o − p_e)/(1 − p_e) — the standard label-quality
    readout when two annotators (or model generations) label the same
    corpus. Raters are deterministic md5 functions, the second a
    noisy copy of the first (score + uniform ±100 permille), so the
    marginals differ and κ lands strictly between 0 and 1 — both
    terms falsifiable.

    Exact integer ppm arithmetic throughout (expected agreement from
    ppm marginal products, floor division — identical on both
    engines). One scan, one 4-counter fold; the whole reduction is a
    single map-side-combined aggregate.
    """
    ev = _t(spark, sf_dir, "events")
    ha = _h("event_id", "ka") % 1000
    hb = _h("event_id", "kb") % 200
    r = ev.select(
        F.when(ha < 500, 1).otherwise(0).alias("a"),
        F.when(ha + hb - 100 < 500, 1).otherwise(0).alias("b"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
        F.sum("a").cast("bigint").alias("a1"),
        F.sum("b").cast("bigint").alias("b1"),
    )
    p = m.select(
        "n",
        "agree",
        F.expr("CAST(agree * 1000000 DIV n AS BIGINT)").alias("po_ppm"),
        F.expr(
            "CAST((a1 * 1000000 DIV n) * (b1 * 1000000 DIV n) DIV 1000000"
            " + ((n - a1) * 1000000 DIV n) * ((n - b1) * 1000000 DIV n)"
            " DIV 1000000 AS BIGINT)"
        ).alias("pe_ppm"),
    )
    return p.select(
        "n",
        "agree",
        "po_ppm",
        "pe_ppm",
        # sign-extracted magnitude (see oracle comment): exact under
        # both floor and truncate division semantics, so below-chance
        # (negative) kappa can never diverge cross-engine
        F.expr(
            "CAST(CASE WHEN po_ppm >= pe_ppm"
            " THEN (po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm)"
            " ELSE -((pe_ppm - po_ppm) * 1000000 DIV (1000000 - pe_ppm))"
            " END AS BIGINT)"
        ).alias("kappa_micro"),
    )


# ---------------------------------------------------------------------------
# Time series: exact rolling median (order statistic over a bounded frame)
# ---------------------------------------------------------------------------

ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS flow
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day, flow,
         list_sort(list(flow) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM daily
)
SELECT event_type, day, flow,
       CAST(len(arr) AS BIGINT) AS n_window,
       CAST(arr[(len(arr) - 1) // 2 + 1] + arr[len(arr) // 2 + 1] AS BIGINT)
         AS med2x_mu
FROM r ORDER BY event_type, day
"""


@register(
    "timeseries_rolling_median",
    oracle=ROLLING_MEDIAN_ORACLE,
    tags=("timeseries", "window", "stats"),
)
def timeseries_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling MEDIAN of the daily flow per event_type —
    the robust companion to the rolling mean (anomaly_rolling_zscore):
    one outlier day cannot drag it. The window frame is bounded (≤7
    values), so collecting and sorting it per row is O(1) work and the
    order statistic stays exact — reported as the SUM of the two
    middle elements (= 2·median, integer-exact for even and odd
    frames alike; the reader halves it off-engine).

    Scale shape: one hash-agg to daily grain, then one window over
    one event_type-keyed shuffle; the per-row array never exceeds the
    frame length, so memory is calendar-bounded regardless of sf.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("mu"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("mu").cast("bigint").alias("flow")
    )
    w7 = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("flow").over(w7))
    r = daily.select("event_type", "day", "flow", arr.alias("arr"))
    n = F.size("arr")
    med2x = F.element_at("arr", ((n - 1) / 2).cast("int") + 1) + F.element_at(
        "arr", (n / 2).cast("int") + 1
    )
    return r.select(
        "event_type",
        "day",
        "flow",
        n.cast("bigint").alias("n_window"),
        med2x.cast("bigint").alias("med2x_mu"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Vector retrieval: MaxSim late interaction (multi-vector documents)
# ---------------------------------------------------------------------------

MAXSIM_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (2, 5, 11, 23)
), t AS (
  SELECT CAST(vec_id // 8 AS BIGINT) AS doc_id, embedding::DOUBLE[] AS tv
  FROM embeddings WHERE vec_id < 400
), d AS (
  SELECT doc_id, q_id,
         MAX(CAST(FLOOR(list_dot_product(tv, qv) * 1000000 + 0.5) AS BIGINT))
           AS best_mu
  FROM t CROSS JOIN q GROUP BY doc_id, q_id
), s AS (
  SELECT doc_id, CAST(SUM(best_mu) AS BIGINT) AS maxsim_mu
  FROM d GROUP BY doc_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY maxsim_mu DESC, doc_id ASC) AS INTEGER)
         AS rank,
       doc_id, maxsim_mu
FROM s ORDER BY rank LIMIT 10
"""


@register(
    "vector_maxsim_late_interaction",
    oracle=MAXSIM_ORACLE,
    tags=("vector", "llm", "retrieval"),
)
def vector_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction scoring over MULTI-VECTOR
    documents: each doc is a bag of 8 token vectors (vec_id DIV 8
    groups), the query is a 4-token vector set, and
    score(doc) = Σ_{q tokens} max_{doc tokens} ⟨q, t⟩ — the retrieval
    model between single-vector ANN (vector_topk_*) and full
    cross-attention. Top-10 docs, ranked by the exact integer-micro
    score (sequential double dot products match across engines —
    the dedup_embedding_cosine precedent).

    The 4-row query set broadcasts onto the token table (the bounded
    scalar-cross idiom); doc input is pinned (vec_id < 400) for the
    deterministic oracle, like every oracled vector query. At
    production scale the same plan runs per-query-token ANN shortlists
    (vector_topk_lsh) before the max-agg — MaxSim's documented scale
    path — so the cross join never touches the full corpus.
    """
    emb = _t(spark, sf_dir, "embeddings")
    from data_lake_with_spark_spark.functions.vector import dot

    q = emb.where(F.col("vec_id").isin(2, 5, 11, 23)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    t = emb.where(F.col("vec_id") < 400).select(
        F.expr("CAST(vec_id DIV 8 AS BIGINT)").alias("doc_id"),
        F.col("embedding").alias("tv"),
    )
    dot_mu = F.floor(dot(F.col("tv"), F.col("qv")) * 1e6 + F.lit(0.5)).cast(
        "bigint"
    )
    d = (
        t.crossJoin(F.broadcast(q))
        .select("doc_id", "q_id", dot_mu.alias("mu"))
        .groupBy("doc_id", "q_id")
        .agg(F.max("mu").alias("best_mu"))
    )
    s = d.groupBy("doc_id").agg(
        F.sum("best_mu").cast("bigint").alias("maxsim_mu")
    )
    rank = F.row_number().over(W.orderBy(F.desc("maxsim_mu"), F.asc("doc_id")))
    return (
        s.withColumn("rank", rank.cast("int"))
        .where(F.col("rank") <= 10)
        .select("rank", "doc_id", "maxsim_mu")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Text: TextRank keywords (weighted PageRank over the co-occurrence graph)
# ---------------------------------------------------------------------------


def _textrank_oracle(n_iter: int = 5, top_k: int = 20) -> str:
    """Generated CTE chain unrolling ``n_iter`` weighted-PageRank
    rounds over the adjacent-token co-occurrence graph: rank units of
    1e9 (giga-units keep w·r inside BIGINT at sf1), damping 17/20,
    per-edge truncating division — the graph_pagerank_neardup integer
    recipe applied to a word graph."""
    head = """WITH toks AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS arr
  FROM documents
), bg AS MATERIALIZED (
  SELECT LEAST(struct_extract(p, 1), struct_extract(p, 2)) AS w1,
         GREATEST(struct_extract(p, 1), struct_extract(p, 2)) AS w2
  FROM toks, UNNEST(list_zip(arr[1:len(arr) - 1], arr[2:len(arr)]))
       AS u(p)
  WHERE struct_extract(p, 1) <> struct_extract(p, 2)
), e AS MATERIALIZED (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS w FROM bg GROUP BY w1, w2
), ed AS MATERIALIZED (
  SELECT w1 AS src, w2 AS dst, w FROM e
  UNION ALL SELECT w2, w1, w FROM e
), wdeg AS MATERIALIZED (
  SELECT src, CAST(SUM(w) AS BIGINT) AS wd FROM ed GROUP BY src
), r0 AS MATERIALIZED (
  SELECT src AS word, CAST(1000000000 AS BIGINT) AS r FROM wdeg
)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", s{i} AS MATERIALIZED (
  SELECT ed.dst AS word,
         CAST(SUM(ed.w * p.r // d.wd) AS BIGINT) AS contrib
  FROM ed
  JOIN r{i - 1} p ON p.word = ed.src
  JOIN wdeg d ON d.src = ed.src
  GROUP BY ed.dst
), r{i} AS MATERIALIZED (
  SELECT n.word,
         CAST(150000000 + 17 * COALESCE(s.contrib, 0) // 20 AS BIGINT) AS r
  FROM r0 n LEFT JOIN s{i} s USING (word)
)"""
        )
    return "".join(ctes) + (
        f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, word ASC) AS INTEGER) AS rank,
       word, r AS rank_giga
FROM r{n_iter} ORDER BY rank LIMIT {top_k}"""
    )


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(5, 20),
    tags=("text", "graph", "llm", "iterative"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the adjacent-token co-occurrence graph — the
    graph-centrality upgrade of RAKE (text_rake_keywords scores by
    degree/frequency; TextRank lets support flow, so a word bridging
    many contexts outranks a merely frequent one). 5 unrolled rounds
    in exact integer giga-units (damping 17/20, per-edge truncating
    division — the graph_pagerank_neardup recipe on a word graph);
    top-20 words by final rank, total-ordered.

    Scale shape: bigram extraction is a zero-join HOF zip per doc; the
    graph aggregates to VOCABULARY grain (bounded by the language, not
    the corpus — weights grow with sf, the node set doesn't), so each
    unrolled round is one edge→rank join + hash-agg over a tiny frame.
    The plan is built lazily — no checkpoints at this unroll depth, no
    EAGER entry.
    """
    docs = _t(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
        ).alias("arr")
    )
    n = F.size("arr")
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("arr", 1, n - 1).alias("a"),
                F.slice("arr", 2, n - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    e = (
        pairs.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("w1"), F.greatest("a", "b").alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    from data_lake_with_spark_spark.operators.plan_cache import shared

    ed = shared(
        e.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "w")
        .unionAll(
            e.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
        )
        # vocabulary-grain; every round fans out over it — an uncached
        # frame re-tokenizes the CORPUS per round (measured: 32
        # FileScans for 5 rounds; the ARCHITECTURE reused-subtree
        # lesson). shared() = lazy cache + cleanup tracking.
    )
    wdeg = shared(
        ed.groupBy("src").agg(F.sum("w").cast("bigint").alias("wd"))
    )
    nodes = wdeg.select(F.col("src").alias("word"))
    r = nodes.select("word", F.lit(1000000000).cast("bigint").alias("r"))
    for _ in range(5):
        contrib = (
            ed.join(r.select(F.col("word").alias("src"), "r"), "src")
            .join(wdeg, "src")
            .select(
                F.col("dst").alias("word"),
                F.expr("w * r DIV wd").alias("term"),
            )
            .groupBy("word")
            .agg(F.sum("term").cast("bigint").alias("contrib"))
        )
        r = nodes.join(contrib, "word", "left").select(
            "word",
            (
                F.lit(150000000)
                + F.expr("17 * COALESCE(contrib, 0) DIV 20")
            ).cast("bigint").alias("r"),
        )
    rank = F.row_number().over(W.orderBy(F.desc("r"), F.asc("word")))
    return (
        r.withColumn("rank", rank.cast("int"))
        .where(F.col("rank") <= 20)
        .select("rank", "word", F.col("r").alias("rank_giga"))
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Statistics: Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------

BROWN_FORSYTHE_ORACLE = """
WITH x AS (
  SELECT event_type AS grp, event_id,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v
  FROM events
), rnk AS (
  SELECT grp, v,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM x
), med AS (
  SELECT grp,
         CAST(SUM(CASE WHEN rn = (n - 1) // 2 + 1 THEN v ELSE 0 END
                  + CASE WHEN rn = n // 2 + 1 THEN v ELSE 0 END) AS BIGINT)
           AS med2x
  FROM rnk GROUP BY grp
), z AS (
  SELECT x.grp, ABS(2 * x.v - m.med2x) AS z
  FROM x JOIN med m ON m.grp = x.grp
), g AS (
  -- ss_g stays HUGEINT (and the multiply widens FIRST): a premature
  -- BIGINT cast errors beyond the swept scales while Spark's old
  -- BIGINT sum wrapped silently — both sides now accumulate in a
  -- 38-digit type where overflow is impossible, not scale-dependent
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(z) AS BIGINT) AS s_g,
         SUM(CAST(z AS HUGEINT) * z) AS ss_g
  FROM z GROUP BY grp
), terms AS (
  SELECT grp, n_g, s_g, ss_g,
         CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g)
              AS BIGINT) AS term
  FROM g
), tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         SUM(ss_g) AS ssq,
         CAST(SUM(term) AS BIGINT) AS sum_terms,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM terms
)
SELECT n, k,
       CAST(sum_terms
            - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                   AS BIGINT) AS BIGINT) AS ssb_q,
       CAST(ssq - sum_terms AS BIGINT) AS ssw_q,
       FLOOR((CAST(sum_terms - FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                   AS DOUBLE) / (k - 1))
             / (CAST(ssq - sum_terms AS DOUBLE) / (n - k))
             * 1000000.0 + 0.5) / 1000000.0 AS w_stat
FROM tot
"""


@register(
    "stats_brown_forsythe",
    oracle=BROWN_FORSYTHE_ORACLE,
    tags=("stats", "window"),
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test: one-way ANOVA run on
    absolute deviations from each group's MEDIAN — the robust
    heteroscedasticity check that gates whether stats_anova_oneway /
    stats_welch_ttest assumptions hold (Levene with the median center,
    the recommended form). Deviations stay integer-exact by doubling:
    z = |2·v − (lower middle + upper middle)| in milli-units, so the
    group median never divides. The ANOVA stage follows
    stats_anova_oneway's exact-moment recipe (BIGINT power sums,
    identical double expression trees for the squared-sum terms on
    both engines) without its ×1e6 term scaling — z² magnitudes here
    already exceed what that factor could fit in int64 at sf1.

    Scale shape: per-group medians from two window functions over ONE
    event_type-keyed shuffle (exact order statistic, no collect), a
    broadcast of the k-row median table, then a single k-cell
    hash-agg.
    """
    x = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        "event_id",
        F.floor(F.col("value") * 1e3 + F.lit(0.5)).cast("long").alias("v"),
    )
    wg = W.partitionBy("grp")
    rnk = x.select(
        "grp",
        "v",
        F.row_number().over(wg.orderBy("v", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    i1 = F.expr("(n - 1) DIV 2 + 1")
    i2 = F.expr("n DIV 2 + 1")
    med = rnk.groupBy("grp").agg(
        F.sum(
            F.when(F.col("rn") == i1, F.col("v")).otherwise(0)
            + F.when(F.col("rn") == i2, F.col("v")).otherwise(0)
        )
        .cast("bigint")
        .alias("med2x")
    )
    z = x.join(F.broadcast(med), "grp").select(
        "grp", F.abs(2 * F.col("v") - F.col("med2x")).alias("z")
    )
    # ss_g accumulates in decimal(38,0) (z widened BEFORE the square):
    # a BIGINT z*z sum wraps SILENTLY in non-ANSI Spark beyond the
    # swept scales while the DuckDB oracle's HUGEINT errors — the two
    # sides would fail differently, Spark wrong. 38 digits make
    # overflow impossible (z <= ~1e12 even at extreme value ranges,
    # so Σz² <= 1e36 at a trillion rows), same recipe as
    # text_zipf_slope's moment sums.
    zd = F.col("z").cast("decimal(19,0)")
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("s_g"),
        F.sum(zd * zd).cast("decimal(38,0)").alias("ss_g"),
    )
    terms = g.select(
        "n_g",
        "s_g",
        "ss_g",
        F.floor(
            F.col("s_g").cast("double") * F.col("s_g").cast("double") / F.col("n_g")
        )
        .cast("bigint")
        .alias("term"),
    )
    tot = terms.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("ss_g").cast("decimal(38,0)").alias("ssq"),
        F.sum("term").cast("bigint").alias("sum_terms"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    grand = F.floor(
        F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ).cast("bigint")
    ssb = (F.col("sum_terms") - grand).cast("bigint")
    ssw = (F.col("ssq") - F.col("sum_terms")).cast("bigint")
    w_stat = (
        F.floor(
            (ssb.cast("double") / (F.col("k") - 1))
            / (ssw.cast("double") / (F.col("n") - F.col("k")))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    return tot.select(
        "n", "k", ssb.alias("ssb_q"), ssw.alias("ssw_q"),
        w_stat.alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Sampling design: Neyman optimal stratified allocation
# ---------------------------------------------------------------------------

NEYMAN_ORACLE = """
WITH x AS (
  SELECT event_type AS grp,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v
  FROM events
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM x GROUP BY grp
), sd AS (
  SELECT grp, n_rows,
         CAST(FLOOR(sqrt((CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                         / (CAST(n_rows AS DOUBLE) * (n_rows - 1)))
                    * 1000.0) AS BIGINT) AS sd_scaled
  FROM g
), w AS (
  SELECT grp, n_rows, sd_scaled,
         CAST(n_rows * sd_scaled AS BIGINT) AS wgt,
         CAST(SUM(n_rows * sd_scaled) OVER () AS BIGINT) AS wtot
  FROM sd
), base AS (
  SELECT grp, n_rows, sd_scaled,
         CAST(1000 * wgt // GREATEST(wtot, 1) AS BIGINT) AS base_n,
         CAST((1000 * wgt) % GREATEST(wtot, 1) AS BIGINT) AS rem
  FROM w
), fin AS (
  SELECT grp, n_rows, sd_scaled, base_n,
         CAST(1000 - SUM(base_n) OVER () AS BIGINT) AS deficit,
         ROW_NUMBER() OVER (ORDER BY rem DESC, grp ASC) AS pr
  FROM base
)
SELECT grp AS event_type, n_rows, sd_scaled,
       CAST(base_n + CASE WHEN pr <= deficit THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM fin ORDER BY event_type
"""


@register(
    "sample_neyman_allocation",
    oracle=NEYMAN_ORACLE,
    tags=("sampling", "stats", "training"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified allocation of a 1000-row sample
    budget: n_h ∝ N_h·S_h (stratum size × stratum standard deviation)
    minimizes the variance of the stratified mean estimator — the
    sampling-design step a training-data curation pipeline runs before
    sample_stratified_topk draws the rows. Integer end to end: exact
    BIGINT variance numerator N·Σv² − (Σv)², one portable sqrt
    (IEEE-correctly-rounded, identical on both engines), then
    largest-remainder apportionment so the allocations sum to EXACTLY
    the budget (floor shares + the top remainders get +1 — the
    deterministic seat-apportionment rule). The variance numerator is
    evaluated in doubles with identical expression trees on both
    engines (s1² overflows int64 beyond sf0.1; IEEE ops are
    deterministic at any magnitude).

    One scan, one k-cell hash-agg, then windows over the k-row
    stratum frame — the fact table never re-shuffles.
    """
    x = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 1e3 + F.lit(0.5)).cast("long").alias("v"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("v").cast("bigint").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
    )
    sd = g.select(
        "grp",
        "n_rows",
        F.floor(
            F.sqrt(
                (
                    F.col("n_rows").cast("double") * F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1").cast("double")
                )
                / (F.col("n_rows").cast("double") * (F.col("n_rows") - 1))
            )
            * F.lit(1000.0)
        )
        .cast("bigint")
        .alias("sd_scaled"),
    )
    w = sd.select(
        "grp",
        "n_rows",
        "sd_scaled",
        (F.col("n_rows") * F.col("sd_scaled")).cast("bigint").alias("wgt"),
        F.expr("CAST(SUM(n_rows * sd_scaled) OVER () AS BIGINT)").alias("wtot"),
    )
    base = w.select(
        "grp",
        "n_rows",
        "sd_scaled",
        F.expr("CAST(1000 * wgt DIV GREATEST(wtot, 1) AS BIGINT)").alias("base_n"),
        F.expr("CAST((1000 * wgt) % GREATEST(wtot, 1) AS BIGINT)").alias("rem"),
    )
    fin = base.select(
        "grp",
        "n_rows",
        "sd_scaled",
        "base_n",
        F.expr("CAST(1000 - SUM(base_n) OVER () AS BIGINT)").alias("deficit"),
        F.row_number().over(W.orderBy(F.desc("rem"), F.asc("grp"))).alias("pr"),
    )
    return fin.select(
        F.col("grp").alias("event_type"),
        "n_rows",
        "sd_scaled",
        (
            F.col("base_n")
            + F.when(F.col("pr") <= F.col("deficit"), 1).otherwise(0)
        ).cast("bigint").alias("alloc"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Corpus: Zipf's-law slope of the rank-frequency curve
# ---------------------------------------------------------------------------

ZIPF_ORACLE = """
WITH toks AS (
  SELECT UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), tc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r FROM tc
), logs AS (
  SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM ranked
), moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(MAX(y) AS BIGINT) AS max_y
  FROM logs
)
SELECT m AS n_terms,
       FLOOR((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
       max_y AS log_top_freq_micro
FROM moments
"""


@register(
    "text_zipf_slope",
    oracle=ZIPF_ORACLE,
    tags=("text", "corpus", "stats", "llm"),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent of the corpus rank-frequency curve: OLS
    slope of ln(freq) on ln(rank) — natural text sits near −1, and a
    corpus whose slope drifts (template spam flattens it, dedup
    failures steepen the head) fails the pre-training health check.
    The frequency-domain sibling of text_heaps_law, sharing its exact
    OLS recipe: micro-nat quantized logs, BIGINT/decimal(38,0) moment
    sums, one identical double expression for the final slope.

    Scale shape: one explode + one token hash-agg; the ranked frame is
    VOCABULARY grain, so the single-partition rank window and the
    moment fold cost nothing at any sf.
    """
    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = tc.select(
        "c", F.row_number().over(W.orderBy(F.desc("c"), F.asc("tok"))).alias("r")
    )
    logs = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * 1e6).cast("bigint").alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * 1e6).cast("bigint").alias("y"),
    )
    moments = logs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.max("y").cast("bigint").alias("max_y"),
    )
    slope = (
        F.col("m").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("m").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return moments.select(
        F.col("m").alias("n_terms"),
        (F.floor(slope * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "zipf_slope"
        ),
        F.col("max_y").alias("log_top_freq_micro"),
    )


# ---------------------------------------------------------------------------
# Events: strict-ordered 3-step funnel
# ---------------------------------------------------------------------------

FUNNEL_STRICT_ORACLE = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 ON u1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts > u1.t1
  GROUP BY e.user_id
), u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 ON u2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2
  GROUP BY e.user_id
), c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u1) AS n_step1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM u2) AS n_step2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM u3) AS n_step3
)
SELECT n_step1, n_step2, n_step3,
       CAST(n_step2 * 1000000 // GREATEST(n_step1, 1) AS BIGINT)
         AS conv12_ppm,
       CAST(n_step3 * 1000000 // GREATEST(n_step2, 1) AS BIGINT)
         AS conv23_ppm
FROM c
"""


@register(
    "funnel_steps_strict",
    oracle=FUNNEL_STRICT_ORACLE,
    tags=("events", "funnel", "analytics"),
)
def funnel_steps_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ORDERED 3-step funnel (signup → view → purchase): a user
    advances to step k only with an event strictly AFTER their
    earliest step-(k−1) completion — the greedy earliest-completion
    chain, which maximizes the number of users counted at every step
    (any later choice of an earlier step's timestamp can only shrink
    the candidates for the next). Completes the funnel family:
    funnel_conversion_latency measures the 2-step latency
    distribution, funnel_unordered_set ignores order, this one is the
    ordered multi-step count every product dashboard leads with.

    Scale shape: each step is a pushed-down type filter + one
    user-keyed hash-agg over a monotonically SHRINKING user set, with
    user-keyed joins between steps (AQE broadcasts the survivors once
    they fit). No windows, no full-event sort. Each step's survivor
    frame is a tracked shared() cache — it feeds the next step AND
    the count readout; uncached the chain cost 1+2+3 = 6 event scans
    (round-10 scan audit), the funnel_stage_users discipline.
    """
    from data_lake_with_spark_spark.operators.plan_cache import shared

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u1 = shared(
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = shared(
        ev.where(F.col("event_type") == "view")
        .join(u1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c = (
        u1.agg(F.count(F.lit(1)).cast("bigint").alias("n_step1"))
        .crossJoin(
            F.broadcast(
                u2.agg(F.count(F.lit(1)).cast("bigint").alias("n_step2"))
            )
        )
        .crossJoin(
            F.broadcast(
                u3.agg(F.count(F.lit(1)).cast("bigint").alias("n_step3"))
            )
        )
    )
    return c.select(
        "n_step1",
        "n_step2",
        "n_step3",
        F.expr("CAST(n_step2 * 1000000 DIV GREATEST(n_step1, 1) AS BIGINT)").alias(
            "conv12_ppm"
        ),
        F.expr("CAST(n_step3 * 1000000 DIV GREATEST(n_step2, 1) AS BIGINT)").alias(
            "conv23_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Training-data selection: DSIR-style hashed n-gram importance weights
# ---------------------------------------------------------------------------

DSIR_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents
), big AS (
  SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS bg
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), feat AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5(bg), 1, 8) AS BIGINT) % 512 AS b
  FROM big
), cnt AS (
  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM feat GROUP BY 1, 2
), raw AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS r_b FROM feat GROUP BY 1
), tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS t_b
  FROM feat WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS big_r,
         CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS big_t
  FROM feat
), doc AS (
  -- per-doc moments vs the two distributions, HUGEINT-exact
  SELECT c.doc_id,
         CAST(SUM(c.c) AS BIGINT) AS n_feats,
         SUM(CAST(c.c AS HUGEINT) * COALESCE(t.t_b, 0)) AS a_t,
         SUM(CAST(c.c AS HUGEINT) * r.r_b) AS b_r
  FROM cnt c JOIN raw r USING (b) LEFT JOIN tgt t USING (b)
  GROUP BY 1
)
SELECT d.doc_id, d.n_feats,
       CAST(d.a_t AS BIGINT) AS a_target,
       CAST(d.b_r AS BIGINT) AS b_raw,
       CAST(FLOOR(1000000.0
                  * CAST(d.a_t * big_r - d.b_r * big_t AS DOUBLE)
                  / (GREATEST(CAST(big_t AS DOUBLE), 1.0)
                     * GREATEST(big_r, 1))) AS BIGINT)
         AS weight_ppm
FROM doc d, tot
ORDER BY doc_id
"""


@register(
    "training_dsir_weights",
    oracle=DSIR_ORACLE,
    tags=("training", "llm", "text"),
)
def training_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights for training-data selection (Xie
    et al. 2023, "Data Selection via Importance Resampling"):
    represent every document as a bag of HASHED BIGRAM features
    (md5-bucketed into 512 bins — the paper's hashed n-gram
    generative model), estimate a target distribution from a curated
    subset (here: the ``lang = 'en'`` corpus) and a raw distribution
    from the whole pool, and score each document by how much more
    target-like than pool-like its features are. The published weight
    is Σ cnt_f·log(t_f/r_f); this portable twin linearizes the
    log-ratio to the exact rational form
    Σ cnt_f·(t_f/T − r_f/R) = (R·A − T·B)/(T·R) with
    A = Σ cnt_f·t_f and B = Σ cnt_f·r_f — same ordering intent
    (positive = resembles the target more than the pool), zero
    transcendentals, so the readout is FLOOR-of-one-double exact on
    both engines. A/B and the (R·A − T·B) numerator accumulate in
    decimal(38,0)/HUGEINT so feature-count products cannot overflow
    at any corpus size (the Brown-Forsythe lesson).

    Scale shape: tokenization runs ONCE (the feature frame is a
    ``shared`` lazy cache feeding per-doc counts, the raw histogram,
    and the target histogram — the reused-subtree discipline); both
    feature histograms are 512-row broadcasts; the only data-sized
    shuffles are the (doc, bucket) and doc-grain hash-aggs. No
    collect, no all-pairs — at 100 TB this is two map-side-combined
    aggregations over the corpus.
    """
    from data_lake_with_spark_spark.functions import text as TXT
    from data_lake_with_spark_spark.operators.plan_cache import shared

    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "lang", TXT.tokens("text").alias("tk"))
    bigrams = toked.where(F.size("tk") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.array_join(F.slice("tk", i + 1, 2), " "),
            )
        ).alias("bg"),
    )
    feat = shared(
        bigrams.select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("bg"), 1, 8), 16, 10).cast("bigint")
                % 512
            ).alias("b"),
        )
    )
    cnt = feat.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    raw = feat.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("r_b"))
    tgt = (
        feat.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_b"))
    )
    tot = feat.agg(
        F.count(F.lit(1)).cast("bigint").alias("big_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("big_t"),
    )
    cd = F.col("c").cast("decimal(19,0)")
    doc = (
        cnt.join(F.broadcast(raw), "b")
        .join(F.broadcast(tgt), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(cd * F.coalesce(F.col("t_b"), F.lit(0)))
            .cast("decimal(38,0)")
            .alias("a_t"),
            F.sum(cd * F.col("r_b")).cast("decimal(38,0)").alias("b_r"),
        )
    )
    num = (
        F.col("a_t") * F.col("big_r") - F.col("b_r") * F.col("big_t")
    ).cast("double")
    # GREATEST-guarded like the oracle: a corpus with zero 'en' docs
    # (big_t = 0) or zero bigrams (big_r = 0) must degrade to weight 0
    # identically on both engines, not NULL-vs-error.
    den = F.greatest(F.col("big_t").cast("double"), F.lit(1.0)) * F.greatest(
        F.col("big_r"), F.lit(1)
    ).cast("double")
    return (
        doc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_feats",
            F.col("a_t").cast("bigint").alias("a_target"),
            F.col("b_r").cast("bigint").alias("b_raw"),
            F.floor(F.lit(1000000.0) * num / den)
            .cast("bigint")
            .alias("weight_ppm"),
        )
        .orderBy("doc_id")
    )
