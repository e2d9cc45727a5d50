"""Round-10 batch: ANN quality frontiers — the offline evaluation
readouts a vector-index deployment tunes against (recall@k as a
function of the probe budget, and the candidate-volume price paid for
it), fully oracled through the portable integer coarse-quantizer
(the vector_topk_ivfpq_portable landmark idiom).

Same registry discipline as plans/extended_ops.py..5: integer-exact
or deterministically-rounded outputs, full DuckDB oracles, no
cartesian products, no Python in the hot path. Extensions beyond the
reference's own surface (reference scope: /root/reference/etl.py — no
counterpart there). Registered under the ≤20/round birth cap; each
entry is sf0.01-gated at birth via tests/test_oracle_parity_sf01.py
CHANGED_THIS_ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators.plan_cache import shared
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# ANN tuning: recall@k vs nprobe frontier over the portable IVF
# ---------------------------------------------------------------------------

# Probe budgets swept by the frontier (8 coarse cells total, so
# nprobe=8 is exhaustive and must read recall 1.0 — the built-in
# sanity row).
_NPROBES = (1, 2, 4, 8)
_RECALL_K = 10

RECALL_FRONTIER_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS x
  FROM e
), coarse AS (
  SELECT vec_id - 26 AS cell, dim, x AS cx FROM comp
  WHERE vec_id >= 26 AND vec_id < 34
), d2c AS (
  SELECT comp.vec_id, coarse.cell,
         SUM((comp.x - coarse.cx) * (comp.x - coarse.cx)) AS d
  FROM comp JOIN coarse ON comp.dim = coarse.dim
  GROUP BY comp.vec_id, coarse.cell
), ranked_cells AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS crn
  FROM d2c
), assign AS (
  SELECT vec_id, cell FROM ranked_cells WHERE crn = 1
), qc AS (
  SELECT vec_id AS query_id, dim, x AS qx FROM comp WHERE vec_id < 10
), d2all AS (
  SELECT qc.query_id, comp.vec_id AS neighbor_id,
         SUM((comp.x - qc.qx) * (comp.x - qc.qx)) AS d2
  FROM comp JOIN qc ON comp.dim = qc.dim
  WHERE comp.vec_id <> qc.query_id
  GROUP BY qc.query_id, comp.vec_id
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY d2, neighbor_id) AS rn
    FROM d2all) WHERE rn <= {_RECALL_K}
), nps AS (
  SELECT UNNEST([{", ".join(str(p) for p in _NPROBES)}]) AS nprobe
), cand AS (
  SELECT n.nprobe, r.vec_id AS query_id, a.vec_id AS neighbor_id
  FROM nps n
  JOIN ranked_cells r ON r.crn <= n.nprobe AND r.vec_id < 10
  JOIN assign a ON a.cell = r.cell
  WHERE a.vec_id <> r.vec_id
), approx AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT c.nprobe, c.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY c.nprobe, c.query_id
                              ORDER BY d.d2, c.neighbor_id) AS rn
    FROM cand c JOIN d2all d
      ON d.query_id = c.query_id AND d.neighbor_id = c.neighbor_id
  ) WHERE rn <= {_RECALL_K}
), hits AS (
  SELECT a.nprobe, a.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM approx a JOIN truth t
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY a.nprobe, a.query_id
), volume AS (
  SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand,
         CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
  FROM cand GROUP BY nprobe
)
SELECT v.nprobe,
       v.n_queries,
       CAST(v.n_cand // v.n_queries AS BIGINT) AS avg_candidates,
       CAST(COALESCE(SUM(h.n_hit), 0) * 1000000
            // (v.n_queries * {_RECALL_K}) AS BIGINT) AS recall_ppm
FROM volume v LEFT JOIN hits h ON h.nprobe = v.nprobe
GROUP BY v.nprobe, v.n_queries, v.n_cand
ORDER BY v.nprobe
"""


@register(
    "ann_recall_nprobe_frontier",
    oracle=RECALL_FRONTIER_ORACLE,
    tags=("vector", "llm", "approx", "ivf", "eval"),
)
def ann_recall_nprobe_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall@k vs probe-budget FRONTIER — the tuning curve behind
    ``operators/similarity.autotune_nprobe``, as an oracled query: for
    each nprobe in {1,2,4,8}, grade IVF-probed search (portable
    integer coarse quantizer, the vector_topk_ivfpq_portable landmark
    cells) against exact top-10 ground truth, reporting mean recall
    and the candidate volume paid for it. nprobe=8 probes every cell,
    so its row must read recall_ppm=1000000 — the frontier carries its
    own sanity pin. Everything is exact integer arithmetic (quantized
    components, integer L2, id tie-breaks), so the curve hash-checks
    cross-engine — unlike the seeded-kmeans IVF fast path whose recall
    is pinned by pytest only.

    Scale shape: the exploded-component frame is ONE tracked shared()
    scan feeding landmarks, queries and corpus; ground-truth distances
    are queries×corpus with a FIXED 10-query panel (O(n) rows, one
    hash-agg keyed on (query, neighbor)); the nprobe sweep fans out
    the ≤80-row ranked-cell frame, never the data. At production
    scale the same query runs over ivf_topk_from_layout's
    partition-pruned scans; this portable twin is the engine-agnostic
    contract for it.
    """
    emb = _t(spark, sf_dir, "embeddings")
    comp = shared(
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        ).select(
            "vec_id",
            "dim",
            (F.floor(F.col("x") * 1000 + 0.5)).cast("bigint").alias("x"),
        )
    )
    coarse = comp.where((F.col("vec_id") >= 26) & (F.col("vec_id") < 34)).select(
        (F.col("vec_id") - 26).alias("cell"), "dim", F.col("x").alias("cx")
    )
    d2c = (
        comp.join(F.broadcast(coarse), "dim")
        .groupBy("vec_id", "cell")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d"))
    )
    ranked_cells = shared(
        d2c.select(
            "vec_id",
            "cell",
            F.row_number()
            .over(W.partitionBy("vec_id").orderBy("d", "cell"))
            .alias("crn"),
        )
    )
    assign = ranked_cells.where(F.col("crn") == 1).select("vec_id", "cell")
    qc = comp.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("x").alias("qx")
    )
    d2all = shared(
        comp.join(F.broadcast(qc), "dim")
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum((F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))).alias("d2"))
    )
    truth = (
        d2all.select(
            "query_id",
            "neighbor_id",
            F.row_number()
            .over(W.partitionBy("query_id").orderBy("d2", "neighbor_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= _RECALL_K)
        .select("query_id", "neighbor_id")
    )
    nps = spark.createDataFrame([(p,) for p in _NPROBES], "nprobe int")
    cand = shared(
        F.broadcast(nps)
        .join(
            ranked_cells.where(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("query_id"), "cell", "crn"
            ),
            F.col("crn") <= F.col("nprobe"),
        )
        .join(assign, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("nprobe", "query_id", F.col("vec_id").alias("neighbor_id"))
    )
    approx = (
        cand.join(d2all, ["query_id", "neighbor_id"])
        .select(
            "nprobe",
            "query_id",
            "neighbor_id",
            F.row_number()
            .over(
                W.partitionBy("nprobe", "query_id").orderBy(
                    "d2", "neighbor_id"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= _RECALL_K)
    )
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    volume = cand.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.countDistinct("query_id").cast("bigint").alias("n_queries"),
    )
    return (
        volume.join(hits, "nprobe", "left")
        .select(
            "nprobe",
            "n_queries",
            F.expr("CAST(n_cand div n_queries AS BIGINT)").alias(
                "avg_candidates"
            ),
            F.expr(
                f"CAST(COALESCE(n_hit, 0) * 1000000"
                f" div (n_queries * {_RECALL_K}) AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# ANN tuning: recall@k vs table-count frontier over the portable LSH
# ---------------------------------------------------------------------------

_BAND_LS = (1, 2, 3, 4)
_BANDS_K = 10

def _bands_oracle() -> str:
    from data_lake_with_spark_spark.plans.llm_ops import _LSHP_VALUES

    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS ix
  FROM e
), dots AS (
  SELECT c.vec_id, w.t, w.p, SUM(c.ix * w.wt) AS s
  FROM comp c JOIN (VALUES {_LSHP_VALUES}) AS w(t, p, dim, wt) ON c.dim = w.dim
  GROUP BY c.vec_id, w.t, w.p
), sig AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN s >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, t
), q AS (
  SELECT vec_id AS query_id, t, bucket FROM sig WHERE vec_id < 10
), ls AS (
  SELECT UNNEST([{", ".join(str(x) for x in _BAND_LS)}]) AS n_tables
), cand AS (
  SELECT DISTINCT l.n_tables, q.query_id, s.vec_id AS neighbor_id
  FROM ls l
  JOIN q ON q.t < l.n_tables
  JOIN sig s ON s.t = q.t AND s.bucket = q.bucket
  WHERE s.vec_id <> q.query_id
), scoreall AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         FLOOR(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) * 1e6 + 0.5) AS sc
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 10
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sc DESC, neighbor_id) AS rn
    FROM scoreall) WHERE rn <= {_BANDS_K}
), approx AS (
  SELECT n_tables, query_id, neighbor_id FROM (
    SELECT c.n_tables, c.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY c.n_tables, c.query_id
                              ORDER BY s.sc DESC, c.neighbor_id) AS rn
    FROM cand c JOIN scoreall s
      ON s.query_id = c.query_id AND s.neighbor_id = c.neighbor_id
  ) WHERE rn <= {_BANDS_K}
), hits AS (
  SELECT a.n_tables, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM approx a JOIN truth t
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY a.n_tables
), volume AS (
  SELECT n_tables, CAST(COUNT(*) AS BIGINT) AS n_cand,
         CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
  FROM cand GROUP BY n_tables
)
SELECT v.n_tables, v.n_queries,
       CAST(v.n_cand // v.n_queries AS BIGINT) AS avg_candidates,
       CAST(COALESCE(h.n_hit, 0) * 1000000
            // (v.n_queries * {_BANDS_K}) AS BIGINT) AS recall_ppm
FROM volume v LEFT JOIN hits h ON h.n_tables = v.n_tables
ORDER BY v.n_tables
"""


@register(
    "ann_recall_bands_frontier",
    oracle=_bands_oracle(),
    tags=("vector", "llm", "approx", "lsh", "eval"),
)
def ann_recall_bands_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 vs TABLE COUNT for the portable hyperplane LSH — the
    banding twin of ann_recall_nprobe_frontier, grading the
    vector_topk_lsh_portable pipeline's candidate sets at L=1..4
    tables against exact-cosine ground truth. Candidate sets are
    nested in L (a pair co-bucketed in table t collides at every
    L > t), so recall is monotone non-decreasing while avg_candidates
    prices each step — exactly the tables-vs-work trade
    operators/similarity.lsh_near_pairs's docstring reasons about,
    here as a hash-checked cross-engine artifact. Scoring is the
    portable floor-micro cosine; all ranks id-tie-broken.

    Scale shape: signatures are one scan + two keyed aggs; the L
    sweep fans out the 40-row query-signature frame, not the corpus;
    ground truth is the fixed 10-query panel against the corpus (O(n)
    with a broadcast query side).
    """
    from data_lake_with_spark_spark.functions.vector import dot, norm
    from data_lake_with_spark_spark.plans.llm_ops import (
        LSHP_DIM,
        LSHP_PLANES,
        LSHP_TABLES,
        _lshp_weight,
    )

    emb = _t(spark, sf_dir, "embeddings")
    planes = spark.createDataFrame(
        [
            (t, p, d, _lshp_weight(t, p, d))
            for t in range(LSHP_TABLES)
            for p in range(LSHP_PLANES)
            for d in range(LSHP_DIM)
        ],
        "t int, p int, dim int, wt int",
    )
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "vec_id", "dim", F.floor(F.col("x") * 1000 + 0.5).cast("bigint").alias("ix")
    )
    dots = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "t", "p")
        .agg(F.sum(F.col("ix") * F.col("wt")).alias("s"))
    )
    sig = shared(
        dots.groupBy("vec_id", "t").agg(
            F.sum(
                F.when(
                    F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("bucket")
        )
    )
    q = sig.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "t", "bucket"
    )
    ls = spark.createDataFrame([(x,) for x in _BAND_LS], "n_tables int")
    cand = shared(
        F.broadcast(ls)
        .join(q, F.col("t") < F.col("n_tables"))
        .join(sig, ["t", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("n_tables", "query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    b = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    sc = F.floor(
        dot(F.col("qv"), F.col("cv"))
        / (norm(F.col("qv")) * norm(F.col("cv")))
        * 1e6
        + 0.5
    )
    scoreall = shared(
        b.crossJoin(F.broadcast(a))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sc.alias("sc"))
    )
    truth = (
        scoreall.select(
            "query_id",
            "neighbor_id",
            F.row_number()
            .over(W.partitionBy("query_id").orderBy(F.desc("sc"), "neighbor_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= _BANDS_K)
        .select("query_id", "neighbor_id")
    )
    approx = (
        cand.join(scoreall, ["query_id", "neighbor_id"])
        .select(
            "n_tables",
            "query_id",
            "neighbor_id",
            F.row_number()
            .over(
                W.partitionBy("n_tables", "query_id").orderBy(
                    F.desc("sc"), "neighbor_id"
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= _BANDS_K)
    )
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"])
        .groupBy("n_tables")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    volume = cand.groupBy("n_tables").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.countDistinct("query_id").cast("bigint").alias("n_queries"),
    )
    return (
        volume.join(hits, "n_tables", "left")
        .select(
            "n_tables",
            "n_queries",
            F.expr("CAST(n_cand div n_queries AS BIGINT)").alias(
                "avg_candidates"
            ),
            F.expr(
                f"CAST(COALESCE(n_hit, 0) * 1000000"
                f" div (n_queries * {_BANDS_K}) AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("n_tables")
    )


# ---------------------------------------------------------------------------
# Training-data quality: per-source Kneser-Ney log-probability
# ---------------------------------------------------------------------------

PERPLEXITY_BY_SOURCE_ORACLE = r"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS t
  FROM documents WHERE len(trim(text)) > 0
), bg AS (
  SELECT source, t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), bgs AS (
  SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
  FROM bg GROUP BY 1, 2, 3
), c12 AS (
  SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c FROM bgs GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n_succ
  FROM c12 GROUP BY w1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_pred FROM c12 GROUP BY w2
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c12
), scored AS (
  -- logp in micro-nats via the lq difference idiom (the
  -- graph_assortativity / JS-divergence pattern): identical double
  -- trees on both engines, floored BEFORE the subtraction.
  SELECT s.w1, s.w2,
         CAST(FLOOR(ln(CAST((CAST(4 * s.c - 3 AS HUGEINT) * t.b
                              + CAST(3 AS HUGEINT) * x.n_succ * n.n_pred)
                            AS DOUBLE)) * 1000000) AS BIGINT)
         - CAST(FLOOR(ln(CAST(CAST(4 AS HUGEINT) * x.c1 * t.b AS DOUBLE))
                      * 1000000) AS BIGINT) AS logp_micro
  FROM c12 s JOIN ctx x USING (w1) JOIN cont n USING (w2) CROSS JOIN tot t
)
SELECT g.source,
       CAST(SUM(g.k) AS BIGINT) AS n_bigrams,
       CAST(FLOOR(CAST(SUM(CAST(g.k AS HUGEINT) * p.logp_micro) AS DOUBLE)
                  / SUM(g.k)) AS BIGINT) AS mean_logprob_micro
FROM bgs g JOIN scored p ON p.w1 = g.w1 AND p.w2 = g.w2
GROUP BY g.source
ORDER BY g.source
"""


@register(
    "training_perplexity_by_source",
    oracle=PERPLEXITY_BY_SOURCE_ORACLE,
    tags=("training", "llm", "text", "quality"),
)
def training_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based corpus-slice quality readout (the CCNet /
    Wenzek et al. 2020 filter, per source): mean interpolated-KN
    bigram log-probability over every bigram occurrence in each
    source — the number a data-mixing pipeline thresholds on to drop
    low-likelihood slices before training. Builds on
    text_kneser_ney_bigram's exact rational
    P = ((4c−3)B + 3·N1+(w1·)·N1+(·w2)) / (4·c1·B), taking logs via
    the lq-difference idiom (floor(ln·1e6) per side, identical double
    trees cross-engine, integer arithmetic after) so the per-source
    mean is deterministic to the micro-nat: more-negative means the
    source's word transitions are rarer under the corpus model.

    Scale shape: ONE tokenization — the per-(source, bigram) count
    frame is the tracked shared() root; the corpus-wide KN stats
    (c12/ctx/cont) aggregate FROM it (word-grain shuffles), and the
    readout joins the ≤|bigram-type| scored frame back to the
    per-source counts keyed on the bigram. Accumulators widened to
    decimal(38,0)/HUGEINT; the only division is one floored double
    per source.
    """
    from data_lake_with_spark_spark.functions import text as TXT

    docs = _t(spark, sf_dir, "documents")
    toked = docs.where(F.length(F.trim("text")) > 0).select(
        "source", TXT.tokens("text").alias("tk")
    )
    bg = toked.where(F.size("tk") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.struct(
                    F.element_at("tk", i + 1).alias("w1"),
                    F.element_at("tk", i + 2).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("source", "p.w1", "p.w2")
    bgs = shared(
        bg.groupBy("source", "w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("k")
        )
    )
    c12 = shared(
        bgs.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("c"))
    )
    ctx = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_succ"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pred")
    )
    tot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("b"))

    def lq(col):
        return F.floor(F.log(col.cast("double")) * 1e6).cast("long")

    num = (
        F.expr("CAST(4 * c - 3 AS DECIMAL(38,0))") * F.col("b")
        + F.expr("CAST(3 AS DECIMAL(38,0))") * F.col("n_succ") * F.col("n_pred")
    )
    den = F.expr("CAST(4 AS DECIMAL(38,0))") * F.col("c1") * F.col("b")
    scored = (
        c12.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", (lq(num) - lq(den)).alias("logp_micro"))
    )
    return (
        bgs.join(scored, ["w1", "w2"])
        .groupBy("source")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.floor(
                F.sum(
                    F.col("k").cast("decimal(38,0)") * F.col("logp_micro")
                ).cast("double")
                / F.sum("k")
            )
            .cast("bigint")
            .alias("mean_logprob_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ANN tuning: PQ distortion vs subspace-count frontier (memory/quality)
# ---------------------------------------------------------------------------

_PQ_MS = (2, 4, 8, 16)
_PQ_DIM = 64

PQ_DISTORTION_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS x
  FROM e
), lm AS (
  SELECT vec_id - 10 AS c, dim, x AS lx FROM comp
  WHERE vec_id >= 10 AND vec_id < 26
), ms AS (
  SELECT UNNEST([{", ".join(str(m) for m in _PQ_MS)}]) AS m
), d2 AS (
  SELECT ms.m, comp.vec_id, lm.c,
         comp.dim // ({_PQ_DIM} // ms.m) AS j,
         SUM((comp.x - lm.lx) * (comp.x - lm.lx)) AS d
  FROM comp JOIN lm ON comp.dim = lm.dim CROSS JOIN ms
  GROUP BY ms.m, comp.vec_id, lm.c, comp.dim // ({_PQ_DIM} // ms.m)
), best AS (
  SELECT m, vec_id, j, MIN(d) AS dmin FROM d2 GROUP BY m, vec_id, j
), per_vec AS (
  SELECT m, vec_id, CAST(SUM(dmin) AS BIGINT) AS dist FROM best GROUP BY m, vec_id
)
SELECT CAST(m AS BIGINT) AS n_subspaces,
       CAST(m * 4 AS BIGINT) AS bits_per_vector,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(FLOOR(CAST(SUM(CAST(dist AS HUGEINT)) AS DOUBLE) / COUNT(*))
            AS BIGINT) AS mean_distortion
FROM per_vec
GROUP BY m
ORDER BY m
"""


@register(
    "ann_pq_distortion_frontier",
    oracle=PQ_DISTORTION_ORACLE,
    tags=("vector", "llm", "approx", "pq", "eval"),
)
def ann_pq_distortion_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ's memory-vs-quality FRONTIER — the third classic ANN tuning
    curve beside the nprobe and bands frontiers: mean quantization
    distortion (exact integer L2 between each vector and its best
    product code) as the subspace count m sweeps 2→16 over the
    portable 16-landmark codebook (vec_id 10-25, the
    vector_topk_pq_portable idiom). More subspaces = finer codes =
    monotonically lower distortion at 4·m bits/vector — the row a
    deployment reads to pick its code budget. Landmark slicing reuses
    the SAME 16 landmark vectors at every m (subspace width 64/m), so
    the sweep isolates the granularity effect.

    Scale shape: one exploded-component scan (tracked shared());
    the per-(m, vector, landmark, subspace) distance agg is keyed on
    the vector id — map-side combinable, broadcast landmark side, and
    the m-sweep multiplies the BROADCAST side only, never shuffling
    the corpus more than once; everything after the per-vector
    distortion is ≤|m| rows.
    """
    emb = _t(spark, sf_dir, "embeddings")
    comp = shared(
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        ).select(
            "vec_id",
            "dim",
            (F.floor(F.col("x") * 1000 + 0.5)).cast("bigint").alias("x"),
        )
    )
    lm = comp.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 26)).select(
        (F.col("vec_id") - 10).alias("c"), "dim", F.col("x").alias("lx")
    )
    ms = spark.createDataFrame([(m,) for m in _PQ_MS], "m int")
    d2 = (
        comp.join(F.broadcast(lm), "dim")
        .crossJoin(F.broadcast(ms))
        .groupBy(
            "m",
            "vec_id",
            "c",
            F.expr(f"dim div ({_PQ_DIM} div m)").alias("j"),
        )
        .agg(
            F.sum((F.col("x") - F.col("lx")) * (F.col("x") - F.col("lx"))).alias(
                "d"
            )
        )
    )
    best = d2.groupBy("m", "vec_id", "j").agg(F.min("d").alias("dmin"))
    per_vec = best.groupBy("m", "vec_id").agg(
        F.sum("dmin").cast("bigint").alias("dist")
    )
    return (
        per_vec.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.floor(
                F.sum(F.col("dist").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("mean_distortion"),
        )
        .select(
            F.col("m").cast("bigint").alias("n_subspaces"),
            (F.col("m") * 4).cast("bigint").alias("bits_per_vector"),
            "n_vectors",
            "mean_distortion",
        )
        .orderBy("n_subspaces")
    )
