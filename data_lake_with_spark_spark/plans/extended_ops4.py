"""Round-8 batch: FIFO lot allocation and two ML evaluation metrics
(Brier decomposition, Cohen's kappa).

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
       CAST((po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm) AS BIGINT)
         AS kappa_micro
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
        F.expr(
            "CAST((po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm) AS BIGINT)"
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
    ed = e.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "w"
    ).unionAll(e.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w"))
    wdeg = ed.groupBy("src").agg(F.sum("w").cast("bigint").alias("wd"))
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
