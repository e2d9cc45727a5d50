"""Lakehouse-maintenance + training-prep queries: physical-layout
planning (z-order locality, compaction bin packing), feature
engineering (target encoding, CV fold assignment), time-series
smoothing (EWMA), two-sample drift testing (KS), diversified
retrieval (MMR), and connected components over the near-dup graph.

These extend the reference's ETL surface (/root/reference/etl.py
writes hive-partitioned parquet, 241-294) with the table-maintenance
and trainset-shaping operations a 100 TB lake needs around that same
data model. Every query here is fully DuckDB-oracled; float outputs
go through the parity helpers (plans/parity.py) so both engines land
on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import multimodal as MM
from data_lake_with_spark_spark.operators import similarity as SIM
from data_lake_with_spark_spark.operators.zorder import morton_from_buckets
from data_lake_with_spark_spark.functions.vector import cosine
from data_lake_with_spark_spark.plans.parity import (
    dsum,
    dsum_sql,
    pround,
    pround_sql,
)
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Physical layout: z-order locality audit
# ---------------------------------------------------------------------------

_ZBITS = 6  # 64 buckets per dimension, 4096 morton cells, 64 "files"


def _morton_sql(bp: str, bs: str, bits: int) -> str:
    """Bit-interleave SQL twin of operators/zorder.py:_interleave —
    bit j of dim 0 lands at 2j, of dim 1 at 2j+1."""
    parts = []
    for j in range(bits):
        parts.append(f"((({bp} >> {j}) & 1) << {2 * j})")
        parts.append(f"((({bs} >> {j}) & 1) << {2 * j + 1})")
    return " | ".join(parts)


ZORDER_LOCALITY_ORACLE = f"""
WITH r AS (
  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
  FROM lineitem
), b AS (
  SELECT l_partkey, l_suppkey,
         ((l_partkey - pmin) * {1 << _ZBITS}) // (pmax - pmin + 1) AS bp,
         ((l_suppkey - smin) * {1 << _ZBITS}) // (smax - smin + 1) AS bs
  FROM lineitem, r
), m AS (
  SELECT l_partkey, l_suppkey, ({_morton_sql('bp', 'bs', _ZBITS)}) AS morton
  FROM b
)
SELECT morton >> {_ZBITS} AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MAX(l_partkey) - MIN(l_partkey) AS p_span,
       MAX(l_suppkey) - MIN(l_suppkey) AS s_span
FROM m GROUP BY file_id ORDER BY file_id
"""


@register(
    "layout_zorder_locality",
    oracle=ZORDER_LOCALITY_ORACLE,
    tags=("layout", "lakehouse"),
)
def layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering audit — what Delta's
    ``OPTIMIZE ZORDER BY`` decides, as a query: bucket (l_partkey,
    l_suppkey) into 64 value-space cells each, interleave the bucket
    bits into a morton key, split the curve into 64 "files" (morton
    >> 6), and report each file's min-max span per dimension. Tight
    spans on BOTH columns are the proof the layout prunes parquet
    row groups for filters on EITHER key — the data-skipping payoff.

    Scale shape: value-space bucketing means the whole key assignment
    is MAP-SIDE — one 1-row min/max stats broadcast, zero window
    sorts (the rank-space variant in operators/zorder.py pays one
    sort per dimension; at 100 TB you'd swap in approx quantile
    boundaries). One hash-agg shuffle on file_id ends the audit."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    rng = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    nb = 1 << _ZBITS
    b = li.crossJoin(F.broadcast(rng)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"((l_partkey - pmin) * {nb}) div (pmax - pmin + 1)").alias("bp"),
        F.expr(f"((l_suppkey - smin) * {nb}) div (smax - smin + 1)").alias("bs"),
    )
    m = b.withColumn(
        "morton", morton_from_buckets([F.col("bp"), F.col("bs")], bits=_ZBITS)
    )
    return (
        m.groupBy(F.shiftright("morton", _ZBITS).alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("p_span"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("s_span"),
        )
        .orderBy("file_id")
    )


# ---------------------------------------------------------------------------
# Physical layout: compaction bin packing
# ---------------------------------------------------------------------------

_BIN_TARGET = 16384  # target bytes per compacted output file

COMPACTION_ORACLE = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         CAST(COALESCE(SUM(n_chars) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum
  FROM documents
)
SELECT cum // {_BIN_TARGET} AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY bin_id ORDER BY bin_id
"""


@register(
    "layout_compaction_bins", oracle=COMPACTION_ORACLE, tags=("layout", "lakehouse")
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-packing step
    every parquet lake runs: treat each document as a file of
    ``n_chars`` bytes, walk the manifest in id order, and assign files
    to output bins by cumulative-size div target (a bin closes once
    the running size crosses the target — the same streaming coalesce
    Spark's own file-splitting uses). Output: per-bin file count,
    total bytes, and id range — the compaction job manifest.

    Scale shape: this runs over the FILE MANIFEST, not the data —
    one row per file (~800k rows for 100 TB at 128 MB files), so the
    single ordered window is metadata-sized by construction; the
    actual rewrite each bin describes is embarrassingly parallel."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    planned = docs.withColumn(
        "cum", F.coalesce(F.sum("n_chars").over(w), F.lit(0).cast("bigint"))
    ).withColumn("bin_id", F.expr(f"cum div {_BIN_TARGET}"))
    return (
        planned.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# Feature engineering: deterministic CV folds
# ---------------------------------------------------------------------------

CV_FOLDS_ORACLE = f"""
SELECT ((c_custkey * 2654435761) % 4294967296) % 5 AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {pround_sql("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal)", 4)} AS avg_acctbal,
       CAST(COUNT_IF(c_mktsegment = 'BUILDING') AS BIGINT) AS n_building
FROM customer GROUP BY fold ORDER BY fold
"""


@register("training_cv_folds", oracle=CV_FOLDS_ORACLE, tags=("training", "llm"))
def training_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation /
    train-test splitting: fold = multiplicative hash (Knuth's 2654435761
    mod 2³²) of the entity key, mod k — content-addressed, so the split
    is reproducible across runs, engines, and re-partitions (no RNG, no
    row order dependence; the same property training_split relies on).
    The readout checks fold balance: row count, mean balance, and one
    segment's share per fold — the leakage/imbalance audit run before
    training. Pure map-side hash + one k-group agg; no shuffle grows
    with k at 100 TB."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = pround(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
        / F.count("c_acctbal"),
        4,
    )
    return (
        cust.groupBy(
            F.expr("((c_custkey * 2654435761) % 4294967296) % 5").alias("fold")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            avg_bal.alias("avg_acctbal"),
            F.count_if(F.col("c_mktsegment") == "BUILDING")
            .cast("bigint")
            .alias("n_building"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Feature engineering: smoothed target encoding
# ---------------------------------------------------------------------------

TARGET_ENC_ORACLE = """
WITH j AS (
  SELECT p_brand, l_returnflag FROM lineitem JOIN part ON p_partkey = l_partkey
), g AS (
  SELECT COUNT(*) AS gn, COUNT_IF(l_returnflag = 'R') AS gr FROM j
), per AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         COUNT_IF(l_returnflag = 'R') AS r
  FROM j GROUP BY p_brand
)
SELECT p_brand, n_lines,
       FLOOR((r / n_lines) * 1000000.0 + 0.5) / 1000000.0 AS return_rate,
       FLOOR(((r + 50.0 * (gr / gn)) / (n_lines + 50.0)) * 1000000.0 + 0.5)
         / 1000000.0 AS target_enc
FROM per, g ORDER BY p_brand
"""


@register(
    "feature_target_encoding", oracle=TARGET_ENC_ORACLE, tags=("training", "llm")
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate (Bayesian-smoothed) target encoding of a categorical
    feature: encode each part brand by its return rate shrunk toward
    the global prior, enc = (returns + m·prior) / (n + m) with m = 50 —
    the standard leakage-safe categorical encoder for tabular training
    sets (rare brands collapse to the prior, frequent brands keep
    their empirical rate). Plan: broadcast the part dim onto lineitem
    (no fact shuffle), ONE hash-agg per brand + ONE 1-row global agg
    broadcast back — two shuffles total regardless of data size."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("p_brand", "l_returnflag")
    is_ret = F.col("l_returnflag") == "R"
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_if(is_ret).alias("r"),
    )
    glob = j.agg(
        F.count(F.lit(1)).alias("gn"), F.count_if(is_ret).alias("gr")
    )
    prior = F.col("gr") / F.col("gn")
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "p_brand",
            "n_lines",
            pround(F.col("r") / F.col("n_lines"), 6).alias("return_rate"),
            pround(
                (F.col("r") + F.lit(50.0) * prior)
                / (F.col("n_lines") + F.lit(50.0)),
                6,
            ).alias("target_enc"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Time series: EWMA smoothing (finite-memory, halflife = 1 step)
# ---------------------------------------------------------------------------

_EWMA_LAGS = 7  # truncate the exponential tail at 2^-7 (<1% weight)


def _ewma_oracle() -> str:
    lag_cols = ", ".join(
        f"LAG(rev, {k}) OVER (ORDER BY day) AS l{k}"
        for k in range(1, _EWMA_LAGS + 1)
    )
    num = "rev" + "".join(
        f" + COALESCE(l{k}, 0.0) * {0.5 ** k!r}" for k in range(1, _EWMA_LAGS + 1)
    )
    den = "1.0" + "".join(
        f" + CASE WHEN l{k} IS NULL THEN 0.0 ELSE {0.5 ** k!r} END"
        for k in range(1, _EWMA_LAGS + 1)
    )
    return f"""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         {dsum_sql('o_totalprice', 2)} AS rev
  FROM orders GROUP BY day
), l AS (
  SELECT day, rev, {lag_cols} FROM d
)
SELECT day, rev, {pround_sql(f'({num}) / ({den})', 4)} AS ewma
FROM l ORDER BY day
"""


@register(
    "timeseries_ewma_halflife", oracle=_ewma_oracle(), tags=("timeseries", "window")
)
def timeseries_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue with a
    one-day halflife, truncated at 7 lags (tail weight < 1%): the
    smoothing pandas' ``ewm(halflife=1)`` computes, recast as a
    FINITE window so it is expressible with lag() on both engines and
    renormalized over the lags actually present (warm-up rows use
    only their real history — no zero-padding bias). Halflife weights
    are dyadic (2⁻ᵏ — exponent shifts, exact in doubles), and both
    engines fold the 8 terms in the same left-to-right order, so the
    smoothed series is bit-identical. Scale shape: the window runs
    over the DAILY aggregate (one row per calendar day — bounded by
    time, not data); the raw-fact pass is one hash-agg."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(dsum(F.col("o_totalprice"), 2).alias("rev"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "rev",
        *[
            F.lag("rev", k).over(w).alias(f"l{k}")
            for k in range(1, _EWMA_LAGS + 1)
        ],
    )
    num = F.col("rev")
    den = F.lit(1.0)
    for k in range(1, _EWMA_LAGS + 1):
        wt = 0.5**k
        num = num + F.coalesce(F.col(f"l{k}"), F.lit(0.0)) * F.lit(wt)
        den = den + F.when(F.col(f"l{k}").isNull(), F.lit(0.0)).otherwise(
            F.lit(wt)
        )
    return lagged.select(
        "day", "rev", pround(num / den, 4).alias("ewma")
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Statistics: two-sample Kolmogorov-Smirnov drift test
# ---------------------------------------------------------------------------

KS_ORACLE = """
WITH ev AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('purchase', 'view')
), g AS (
  SELECT value,
         COUNT_IF(event_type = 'purchase') AS a,
         COUNT_IF(event_type = 'view') AS b
  FROM ev GROUP BY value
), c AS (
  SELECT CAST(SUM(a) OVER (ORDER BY value) AS BIGINT) AS c1,
         CAST(SUM(b) OVER (ORDER BY value) AS BIGINT) AS c2
  FROM g
), t AS (
  SELECT CAST(COUNT_IF(event_type = 'purchase') AS BIGINT) AS n1,
         CAST(COUNT_IF(event_type = 'view') AS BIGINT) AS n2
  FROM ev
)
SELECT n1, n2,
       CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_scaled,
       FLOOR((CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) / (n1 * n2))
             * 1000000.0 + 0.5) / 1000000.0 AS ks_d
FROM c, t GROUP BY n1, n2
"""


@register("stats_ks_two_sample", oracle=KS_ORACLE, tags=("stats", "quality"))
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase
    and view value distributions — the standard drift test a feature
    pipeline runs between training and serving windows. D = max over
    the merged support of |ECDF₁ − ECDF₂|, computed in SCALED INTEGERS
    (|c1·n2 − c2·n1|, exact — the float division happens once, on the
    final 1-row readout), so the max is tie-proof across engines.
    Plan: one hash-agg collapses rows to distinct values, one ordered
    window over the distinct-value spine, one 1-row totals broadcast.
    At 100 TB with a continuous metric you'd pre-bin values to a fixed
    grid first (same shape, bounded spine); here the support is small
    so the exact ECDF is the better oracle."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select("value", "event_type")
    )
    is_p = F.col("event_type") == "purchase"
    is_v = F.col("event_type") == "view"
    g = ev.groupBy("value").agg(
        F.count_if(is_p).alias("a"), F.count_if(is_v).alias("b")
    )
    w = Window.orderBy("value")
    c = g.select(
        F.sum("a").over(w).alias("c1"), F.sum("b").over(w).alias("c2")
    )
    t = ev.agg(
        F.count_if(is_p).cast("bigint").alias("n1"),
        F.count_if(is_v).cast("bigint").alias("n2"),
    )
    d = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(F.max(d).cast("bigint").alias("d_scaled"))
        .select(
            "n1",
            "n2",
            "d_scaled",
            pround(F.col("d_scaled") / (F.col("n1") * F.col("n2")), 6).alias(
                "ks_d"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval: maximal marginal relevance (diversified top-k)
# ---------------------------------------------------------------------------

_MMR_K = 5
_MMR_POOL = 20
_MMR_LAM = 0.7
_MMR_BETA = 0.3


def _cos6_sql(a: str, b: str) -> str:
    return (
        f"FLOOR((list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
        f" * 1000000.0 + 0.5) / 1000000.0"
    )


def _mmr_oracle(k: int = _MMR_K, pool: int = _MMR_POOL) -> str:
    head = f"""WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv,
         {_cos6_sql('embedding::DOUBLE[]', 'qv')} AS rel
  FROM embeddings, q WHERE vec_id > 0
), c20 AS (
  SELECT * FROM c ORDER BY rel DESC, vec_id LIMIT {pool}
), p1 AS (
  SELECT vec_id, cv, rel FROM c20 ORDER BY rel DESC, vec_id LIMIT 1
)"""
    ctes = [head]
    for i in range(2, k + 1):
        sims = ",\n         ".join(
            f"{_cos6_sql('c.cv', f'p{j}.cv')} AS m{j}" for j in range(1, i)
        )
        tables = ", ".join(f"p{j}" for j in range(1, i))
        notin = ", ".join(f"p{j}.vec_id" for j in range(1, i))
        names = ", ".join(f"m{j}" for j in range(1, i))
        maxm = f"GREATEST({names})" if i > 2 else "m1"
        ctes.append(
            f""", s{i} AS (
  SELECT c.vec_id, c.cv, c.rel,
         {sims}
  FROM c20 c, {tables}
  WHERE c.vec_id NOT IN ({notin})
), p{i} AS (
  SELECT vec_id, cv, rel FROM s{i}
  ORDER BY ({_MMR_LAM} * rel - {_MMR_BETA} * {maxm}) DESC, vec_id LIMIT 1
)"""
        )
    tail = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS rank, vec_id, rel FROM p{i}"
        for i in range(1, k + 1)
    )
    return "".join(ctes) + "\nSELECT rank, vec_id, rel FROM (\n" + tail + "\n) ORDER BY rank"


@register(
    "search_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("vector", "llm", "topk", "iterative"),
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversified top-k every RAG retriever bolts onto raw
    cosine ranking: greedily pick argmax of λ·rel(d,q) −
    (1−λ)·max_sim(d, selected), λ=0.7, from a 20-candidate pool.
    Candidate generation is the scalable part (per-partition top-k
    merge via sort+limit → TakeOrderedAndProject, no single-partition
    shuffle; swap in lsh_topk for ANN candidates at 100 TB); the
    greedy loop is k bounded argmax actions over the 20-row pool —
    the k-means/codebook bounded-driver-artifact pattern (each
    iteration collects ONE row; like the other iterative queries this
    evaluates eagerly at construction). All similarities are
    portable-rounded doubles, so the unrolled 5-step SQL twin picks
    identical vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    cands = (
        emb.where(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "embedding",
            pround(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("rel"),
        )
    )
    pool = (
        cands.orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
        .localCheckpoint(eager=True)
    )
    # Greedy loop in ONE driver action over the bounded pool (round-14
    # optimization): the previous form ran k separate limit(1).collect()
    # jobs, each rebuilding 64-literal vector expressions (heavy py4j
    # chatter) to score 20 rows. The pool is already the documented
    # bounded driver artifact; the Python arithmetic below is
    # bit-identical to the JVM expressions it replaces — sequential
    # double dot/norm folds (same IEEE order as the zip_with+aggregate
    # form) and the same floor(x·1e6+0.5)/1e6 portable rounding — so
    # the picked ids match the unrolled SQL twin exactly (driver-sim
    # re-verified at sf0.01; pinned tests unchanged). 6 jobs → 2,
    # measured ~2.0s → ~0.8s at sf0.1.
    import math

    rows = sorted(pool.collect(), key=lambda r: (-r["rel"], r["vec_id"]))
    # Zero-norm guard (round-15 ADVICE): the JVM expression this loop
    # replaced yields NaN on a zero-norm embedding and still completes;
    # Python float division would raise ZeroDivisionError deep in the
    # greedy loop instead, and NaN mis-sorts under Python comparisons.
    # A zero-norm vector in the pool is corrupt input — fail loudly and
    # name it before the loop rather than either silent behavior.
    for r in rows:
        if not any(float(x) != 0.0 for x in r["embedding"]):
            raise ValueError(
                f"search_mmr_rerank: zero-norm embedding vec_id={r['vec_id']}"
            )

    def _pcos(a: list, b: list) -> float:
        dp = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dp += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        c = dp / (math.sqrt(na) * math.sqrt(nb))
        return math.floor(c * 1e6 + 0.5) / 1e6

    picked: list = []
    for _ in range(_MMR_K):
        best = None
        best_key = None
        for r in rows:
            if any(p["vec_id"] == r["vec_id"] for p in picked):
                continue
            if picked:
                maxsim = max(_pcos(p["embedding"], r["embedding"]) for p in picked)
                score = _MMR_LAM * r["rel"] - _MMR_BETA * maxsim
            else:
                score = r["rel"]
            key = (-score, r["vec_id"])
            if best_key is None or key < best_key:
                best, best_key = r, key
        picked.append(best)
    rank_col = F.lit(None).cast("int")
    for i, r in enumerate(picked, start=1):
        rank_col = F.when(
            F.col("vec_id") == r["vec_id"], F.lit(i).cast("int")
        ).otherwise(rank_col)
    return (
        pool.where(F.col("vec_id").isin([r["vec_id"] for r in picked]))
        .select(rank_col.alias("rank"), "vec_id", "rel")
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Graph: connected components over the near-dup graph
# ---------------------------------------------------------------------------


def _cc_oracle(n_iter: int = 4, pair_filter: str = "") -> str:
    # Each round references the previous labels THREE times (self,
    # pointer jump, neighbor lookup) — without MATERIALIZED the CTE
    # inliner would expand 3^n_iter copies of the whole chain.
    # ``pair_filter``: optional extra SQL predicate on (a_id, b_id)
    # ANDed into the pairs CTE — the retraction twin
    # (graph_cc_retraction_equivalence) floods only the SURVIVING
    # edges; "" leaves the generated SQL byte-identical to before.
    head = """WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM ed
), l0 AS MATERIALIZED (
  SELECT id, id AS lab FROM nodes
)"""
    if pair_filter:
        head = head.replace(
            ">= 0.35\n), ed AS",
            f">= 0.35\n    AND {pair_filter}\n), ed AS",
        )
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", l{i} AS MATERIALIZED (
  SELECT l.id, LEAST(LEAST(l.lab, pj.lab), MIN(n.lab)) AS lab
  FROM l{i - 1} l
  JOIN l{i - 1} pj ON pj.id = l.lab
  JOIN ed ON ed.src = l.id
  JOIN l{i - 1} n ON n.id = ed.dst
  GROUP BY l.id, l.lab, pj.lab
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT lab AS component, CAST(COUNT(*) AS BIGINT) AS n_members"
        f"\nFROM l{n_iter} GROUP BY lab"
        "\nORDER BY n_members DESC, component"
    )


@register(
    "graph_connected_components",
    oracle=_cc_oracle(8),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the near-dup graph by synchronous
    min-label flooding with pointer jumping (8 rounds):
    the canonical duplicate-CLUSTER extraction — transitive closure
    of pairwise near-dup edges, so "A≈B, B≈C" lands A, B, C in one
    component even when A and C are not directly similar (the
    grouping MinHash-dedup pipelines need before keep-first).
    Deterministic (min is a total order) hence value-verified against
    the unrolled 8-step SQL twin; the pytest additionally pins full
    convergence against a driver-side union-find at the local and
    driver gate scales (a production run would instead iterate to
    fixpoint — stop when a round changes zero labels). Per round: one
    edge→label join + min-agg + one label self-join (the jump),
    shuffles keyed on node id (operators/graph.py:
    min_label_components has the round kernel and the
    MapReduce-CC citation)."""
    from data_lake_with_spark_spark.operators.graph import min_label_components

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    labels = min_label_components(pairs, n_iter=8)
    return (
        labels.groupBy(F.col("lab").alias("component"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "component")
    )


# ---------------------------------------------------------------------------
# CDC: SCD2 merge application (the MERGE INTO analog as a query)
# ---------------------------------------------------------------------------

SCD2_APPLY_ORACLE = """
WITH f AS (
  SELECT o_custkey AS c_key, o_orderpriority AS prio, o_orderdate AS vf
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
), l AS (
  SELECT o_custkey AS c_key, o_orderpriority AS uprio, o_orderdate AS uts
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
)
SELECT f.c_key, f.prio, CAST(f.vf AS TIMESTAMP) AS valid_from,
       CAST(CASE WHEN l.uprio <> f.prio THEN l.uts END AS TIMESTAMP) AS valid_to
FROM f JOIN l USING (c_key)
UNION ALL
SELECT l.c_key, l.uprio AS prio, CAST(l.uts AS TIMESTAMP) AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM f JOIN l USING (c_key) WHERE l.uprio <> f.prio
ORDER BY c_key, valid_from, prio
"""


def _order_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 priority history per customer: first order seeds the open
    row, the latest order is applied as an update batch through
    operators/cdc.py:scd2_apply. Shared by cdc_scd2_apply (which
    verifies the merge itself) and join_pointintime_scd2 (which
    consumes the history)."""
    from data_lake_with_spark_spark.operators.cdc import scd2_apply

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    wf = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wl = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    cur = (
        orders.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_key"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    upd = (
        orders.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_key"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    return scd2_apply(cur, upd, key="c_key", attrs=["prio"], ts_col="ts")


@register("cdc_scd2_apply", oracle=SCD2_APPLY_ORACLE, tags=("cdc", "lakehouse", "join"))
def cdc_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE application as a value-verified query: seed each
    customer's history with their FIRST order's priority (open row
    from that order date), then apply the LATEST order as an update
    batch through ``operators/cdc.py:scd2_apply`` — changed keys get
    the open row closed at the update timestamp plus a new open
    version; unchanged keys pass through untouched (idempotent, the
    property the reference's append-only upsert lacked — reference
    etl.py:105-128). Both window picks tie-break on o_orderkey, so
    the batch reduction inside scd2_apply sees exactly one
    deterministic row per key. This is what ``MERGE INTO`` compiles
    to on immutable parquet: anti/outer join + union — per-key
    shuffles only; at 100 TB the history table would be bucketed by
    key so the join co-locates."""
    hist = _order_priority_history(spark, sf_dir)
    return hist.orderBy("c_key", "valid_from", "prio")


# ---------------------------------------------------------------------------
# Feature engineering: decile binning from two-phase exact percentiles
# ---------------------------------------------------------------------------

QUANTILE_BINS_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
), n AS (
  SELECT COUNT(*) AS n FROM v
), o AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v
), p AS (
  SELECT * FROM (VALUES (10),(20),(30),(40),(50),(60),(70),(80),(90)) AS t(pct)
), b AS (
  SELECT p.pct, o.c AS bval
  FROM p CROSS JOIN n
  JOIN o ON o.rn = CAST((p.pct * n.n + 99) // 100 AS BIGINT)
), binned AS (
  SELECT v.c, 1 + (SELECT COUNT(*) FROM b WHERE b.bval < v.c) AS bin FROM v
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(c) / 100.0 AS min_value,
       MAX(c) / 100.0 AS max_value
FROM binned GROUP BY bin ORDER BY bin
"""


@register(
    "feature_quantile_bins", oracle=QUANTILE_BINS_ORACLE, tags=("training", "stats")
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile discretization of order value — quantile feature binning
    WITHOUT a global sort: the two-phase count-offset machinery of
    stats_exact_percentiles finds the 9 exact decile boundaries (one
    map-side-combinable bucket histogram + ONE re-scan of the ≤9 hit
    buckets; the naive ROW_NUMBER-over-everything form survives only
    as the DuckDB oracle), then bin assignment is PURE MAP-SIDE — 9
    broadcast literal comparisons summed — and one final hash-agg
    reads out per-bin counts and ranges. Strictly-greater semantics
    put boundary ties in the lower bin on both engines; integer cents
    end to end. Eager phase-1 actions at construction (histogram +
    9-row boundary collect — bounded driver artifacts, the k-means
    codebook pattern)."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("c")
    )
    hist = (
        o.groupBy(F.expr("c div 10000").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
        .collect()
    )
    n = sum(r["cnt"] for r in hist)
    targets = []
    for pct in range(10, 100, 10):
        rank = (pct * n + 99) // 100
        cum = 0
        for r in hist:
            if cum + r["cnt"] >= rank:
                targets.append((pct, rank, int(r["bucket"]), rank - cum))
                break
            cum += r["cnt"]
    tdf = spark.createDataFrame(
        targets, "pct int, rank bigint, bucket bigint, resid bigint"
    )
    wp = Window.partitionBy("pct").orderBy("c")
    bounds = [
        r["c"]
        for r in (
            o.withColumn("bucket", F.expr("c div 10000"))
            .join(F.broadcast(tdf), "bucket")
            .withColumn("rn", F.row_number().over(wp))
            .where(F.col("rn") == F.col("resid"))
            .select("c")
            .collect()
        )
    ]
    bin_col = F.lit(1).cast("bigint")
    for b in bounds:
        bin_col = bin_col + (F.col("c") > F.lit(b)).cast("bigint")
    return (
        o.select("c", bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.min("c") / F.lit(100.0)).alias("min_value"),
            (F.max("c") / F.lit(100.0)).alias("max_value"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Scans: hidden file-metadata column
# ---------------------------------------------------------------------------

FILE_METADATA_ORACLE = """
SELECT 'lineitem.parquet' AS file_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_orderkey) AS min_orderkey,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem
"""


@register(
    "scan_file_metadata", oracle=FILE_METADATA_ORACLE, tags=("scan", "lakehouse")
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-input-file statistics via Spark's hidden ``_metadata``
    column — the provenance/manifest readout (which file holds which
    key range) that file-level data skipping and incremental-ingest
    bookkeeping are built from, with zero extra I/O (the scan already
    knows its file). The oracle pins the basename and the per-file
    rollup analytically (one file per table in the testdata; on a
    multi-file table the same query yields the real manifest). Key
    min/max per file is exactly what ``sources/versioned.py`` records
    in its stats manifests — this is the query-side view of it."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("_metadata.file_name").alias("file_name"), "l_orderkey"
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# Statistics: Welch's t-test (unequal-variance two-sample mean test)
# ---------------------------------------------------------------------------

WELCH_ORACLE = """
WITH ev AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('purchase', 'view')
), a AS (
  SELECT
    CAST(COUNT_IF(event_type = 'purchase') AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s1,
    CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value * value AS DECIMAL(18,6)) END) AS DOUBLE) AS q1,
    CAST(COUNT_IF(event_type = 'view') AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s2,
    CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(value * value AS DECIMAL(18,6)) END) AS DOUBLE) AS q2
  FROM ev
), v AS (
  SELECT n1, n2,
         s1 / n1 - s2 / n2 AS mean_diff,
         ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1 AS se1,
         ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2 AS se2
  FROM a
)
SELECT n1, n2,
       FLOOR((mean_diff) * 10000.0 + 0.5) / 10000.0 AS mean_diff,
       FLOOR((mean_diff / sqrt(se1 + se2)) * 10000.0 + 0.5) / 10000.0 AS t_stat,
       FLOOR(((se1 + se2) * (se1 + se2)
              / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))) * 100.0 + 0.5)
         / 100.0 AS df
FROM v
"""


@register("stats_welch_ttest", oracle=WELCH_ORACLE, tags=("stats", "quality"))
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the purchase and view
    value distributions — the mean-shift companion to the KS shape
    test (stats_ks_two_sample): t statistic and Welch-Satterthwaite
    degrees of freedom from ONE conditional-aggregation scan. Moments
    are exact decimal sums (order-independent across engines); every
    double expression after that is written in the identical
    operation order on both engines, so t and df agree bit-for-bit
    before the final portable rounding. Map-side-combinable single
    agg — the 100 TB shape for any moment-based test."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select("value", "event_type")
    )
    dec = "decimal(18,6)"
    is_p = F.col("event_type") == "purchase"
    is_v = F.col("event_type") == "view"
    val = F.col("value")
    a = ev.agg(
        F.count_if(is_p).cast("bigint").alias("n1"),
        F.sum(F.when(is_p, val).cast(dec)).cast("double").alias("s1"),
        F.sum(F.when(is_p, val * val).cast(dec)).cast("double").alias("q1"),
        F.count_if(is_v).cast("bigint").alias("n2"),
        F.sum(F.when(is_v, val).cast(dec)).cast("double").alias("s2"),
        F.sum(F.when(is_v, val * val).cast(dec)).cast("double").alias("q2"),
    )
    v = a.select(
        "n1",
        "n2",
        (F.col("s1") / F.col("n1") - F.col("s2") / F.col("n2")).alias("md"),
        (
            ((F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1))
            / F.col("n1")
        ).alias("se1"),
        (
            ((F.col("q2") - F.col("s2") * F.col("s2") / F.col("n2")) / (F.col("n2") - 1))
            / F.col("n2")
        ).alias("se2"),
    )
    se = F.col("se1") + F.col("se2")
    return v.select(
        "n1",
        "n2",
        pround(F.col("md"), 4).alias("mean_diff"),
        pround(F.col("md") / F.sqrt(se), 4).alias("t_stat"),
        pround(
            (se * se)
            / (
                F.col("se1") * F.col("se1") / (F.col("n1") - 1)
                + F.col("se2") * F.col("se2") / (F.col("n2") - 1)
            ),
            2,
        ).alias("df"),
    )


# ---------------------------------------------------------------------------
# Feature engineering: group-mean imputation
# ---------------------------------------------------------------------------

IMPUTE_ORACLE = """
WITH c AS (
  SELECT c_nationkey,
         c_acctbal,
         c_custkey % 7 = 0 AS is_missing
  FROM customer
), g AS (
  SELECT c_nationkey,
         CAST(COUNT_IF(is_missing) AS BIGINT) AS n_missing,
         CAST(COUNT_IF(NOT is_missing) AS BIGINT) AS n_present,
         CAST(SUM(CASE WHEN NOT is_missing
                       THEN CAST(c_acctbal AS DECIMAL(18,6)) END) AS DOUBLE) AS s
  FROM c GROUP BY c_nationkey
)
SELECT c_nationkey,
       n_missing, n_present,
       FLOOR((s / n_present) * 10000.0 + 0.5) / 10000.0 AS mean_present,
       FLOOR(((s + n_missing * (s / n_present)) / (n_missing + n_present))
             * 10000.0 + 0.5) / 10000.0 AS mean_imputed
FROM g ORDER BY c_nationkey
"""


@register(
    "feature_impute_group_mean", oracle=IMPUTE_ORACLE, tags=("training", "quality")
)
def feature_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation audit — the standard missing-value fill
    for tabular features, as a per-group readout: rows flagged missing
    by a deterministic rule (custkey % 7 — the testdata has no real
    nulls, so missingness is simulated content-addressed) are imputed
    with their nation's present-value mean; the query reports each
    nation's missing/present counts, donor mean, and post-imputation
    mean. One hash-agg per group, exact decimal sums, identical
    double-op order on both engines. (The per-ROW imputed table is
    the same plan minus the final rollup — a broadcast join of g back
    onto c.)"""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_acctbal",
        (F.col("c_custkey") % 7 == 0).alias("is_missing"),
    )
    g = cust.groupBy("c_nationkey").agg(
        F.count_if("is_missing").cast("bigint").alias("n_missing"),
        F.count_if(~F.col("is_missing")).cast("bigint").alias("n_present"),
        F.sum(F.when(~F.col("is_missing"), F.col("c_acctbal")).cast("decimal(18,6)"))
        .cast("double")
        .alias("s"),
    )
    mean_present = F.col("s") / F.col("n_present")
    return g.select(
        "c_nationkey",
        "n_missing",
        "n_present",
        pround(mean_present, 4).alias("mean_present"),
        pround(
            (F.col("s") + F.col("n_missing") * mean_present)
            / (F.col("n_missing") + F.col("n_present")),
            4,
        ).alias("mean_imputed"),
    ).orderBy("c_nationkey")


# ---------------------------------------------------------------------------
# Statistics: KL divergence of event mix by weekday
# ---------------------------------------------------------------------------

KL_DOW_ORACLE = """
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
  SELECT CAST(SUM(gc) AS BIGINT) AS gn FROM gl
), scored AS (
  SELECT cell.dow, cell.c,
         CAST(FLOOR((ln(CAST(cell.c AS DOUBLE)) - ln(CAST(nd.n AS DOUBLE)))
                    * 1e6) AS BIGINT)
         - CAST(FLOOR((ln(CAST(gl.gc AS DOUBLE)) - ln(CAST(tot.gn AS DOUBLE)))
                      * 1e6) AS BIGINT) AS dlp
  FROM cell
  JOIN nd USING (dow)
  JOIN gl USING (event_type)
  CROSS JOIN tot
)
SELECT CAST(dow AS INTEGER) AS dow,
       CAST(SUM(c) AS BIGINT) AS n_events,
       FLOOR(CAST(SUM(c * dlp) AS BIGINT) * 1.0 / SUM(c) / 1e6 * 1e6 + 0.5) / 1e6
         AS kl_divergence
FROM scored GROUP BY dow ORDER BY dow
"""


@register("stats_kl_weekday", oracle=KL_DOW_ORACLE, tags=("stats", "quality"))
def stats_kl_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each weekday's event-type mix from the overall
    mix — the distribution-drift monitor a feature store runs per
    segment: KL(P_dow ‖ P_overall) = Σᵢ pᵢ·(ln pᵢ − ln qᵢ), computed
    as Σ c·Δlnq / n with per-cell log-probabilities QUANTIZED to
    integers before any summation (the text_unigram_logprob
    transcendental-portability trick), so the aggregate is
    order-independent and engine-identical. Monday=0 weekday
    normalization absorbs the Spark/DuckDB dayofweek base drift.
    Plan: one (dow, type) hash-agg, two tiny re-aggregates, broadcast
    joins back — nothing scales with rows except the first agg."""
    ev = _t(spark, sf_dir, "events").select(
        ((F.dayofweek("ts") + 5) % 7).alias("dow"), "event_type"
    )
    cell = ev.groupBy("dow", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nd = cell.groupBy("dow").agg(F.sum("c").cast("bigint").alias("n"))
    glob = cell.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("gc")
    )
    tot = glob.agg(F.sum("gc").cast("bigint").alias("gn"))
    lnq = lambda a, b: F.floor(  # noqa: E731
        (F.log(F.col(a).cast("double")) - F.log(F.col(b).cast("double"))) * 1e6
    ).cast("long")
    scored = (
        cell.join(F.broadcast(nd), "dow")
        .join(F.broadcast(glob), "event_type")
        .crossJoin(F.broadcast(tot))
        .select("dow", "c", (lnq("c", "n") - lnq("gc", "gn")).alias("dlp"))
    )
    return (
        scored.groupBy("dow")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            (
                F.floor(
                    F.sum(F.col("c") * F.col("dlp")).cast("bigint")
                    * 1.0
                    / F.sum("c")
                    / 1e6
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("kl_divergence"),
        )
        .select(
            F.col("dow").cast("int").alias("dow"), "n_events", "kl_divergence"
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# Graph: modularity of the LPA communities
# ---------------------------------------------------------------------------


def _modularity_oracle(n_iter: int = 3) -> str:
    head = """WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM ed
), l0 AS MATERIALIZED (
  SELECT id, id AS lab FROM nodes
)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", s{i} AS MATERIALIZED (
  SELECT ed.src AS id, l.lab, COUNT(*) AS c
  FROM ed JOIN l{i - 1} l ON ed.dst = l.id
  GROUP BY ed.src, l.lab
), l{i} AS MATERIALIZED (
  SELECT id, lab FROM (
    SELECT id, lab,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
    FROM s{i}
  ) WHERE rn = 1
)"""
        )
    return "".join(ctes) + f""", lab AS MATERIALIZED (
  SELECT id, lab FROM l{n_iter}
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(COUNT_IF(la.lab = lb.lab) AS BIGINT) AS intra
  FROM pairs p
  JOIN lab la ON la.id = p.a_id
  JOIN lab lb ON lb.id = p.b_id
), deg AS (
  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree FROM ed GROUP BY src
), dc AS (
  SELECT l.lab, CAST(SUM(d.degree) AS BIGINT) AS d_c
  FROM deg d JOIN lab l ON l.id = d.id GROUP BY l.lab
), a2 AS (
  SELECT CAST(SUM(d_c * d_c) AS BIGINT) AS sum_dc2,
         CAST(COUNT(*) AS BIGINT) AS n_communities
  FROM dc
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lab
)
SELECT m AS n_edges, n_nodes, n_communities, intra AS n_intra_edges,
       FLOOR((intra / m - sum_dc2 / (4.0 * m * m)) * 1e6 + 0.5) / 1e6
         AS modularity
FROM st, a2, nn"""


@register(
    "graph_community_modularity",
    oracle=_modularity_oracle(3),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities — the
    quality score that says whether the near-dup graph's community
    structure is real: Q = Σ_c[e_c/m − (d_c/2m)²], computed as TWO
    integer sums (intra-community edge count; Σ of squared community
    degree totals) and two final divisions — no per-community float
    summation, so engines agree regardless of community enumeration
    order. Labels come from the same deterministic 3-round LPA the
    graph_label_propagation query verifies; the oracle unrolls those
    rounds then replays the modularity arithmetic."""
    from data_lake_with_spark_spark.operators.graph import (
        degrees,
        label_propagation,
    )

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    labels = label_propagation(pairs, n_iter=3).localCheckpoint(eager=True)
    la = labels.select(F.col("id").alias("a_id"), F.col("lab").alias("la"))
    lb = labels.select(F.col("id").alias("b_id"), F.col("lab").alias("lb"))
    st = (
        pairs.join(la, "a_id")
        .join(lb, "b_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.count_if(F.col("la") == F.col("lb")).cast("bigint").alias("intra"),
        )
    )
    dc = (
        degrees(pairs)
        .join(labels, "id")
        .groupBy("lab")
        .agg(F.sum("degree").cast("bigint").alias("d_c"))
    )
    a2 = dc.agg(
        F.sum(F.col("d_c") * F.col("d_c")).cast("bigint").alias("sum_dc2"),
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
    )
    nn = labels.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        st.crossJoin(F.broadcast(a2))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("m").alias("n_edges"),
            "n_nodes",
            "n_communities",
            F.col("intra").alias("n_intra_edges"),
            pround(
                F.col("intra") / F.col("m")
                - F.col("sum_dc2") / (F.lit(4.0) * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# Data quality: freshness lag per source
# ---------------------------------------------------------------------------

FRESHNESS_ORACLE = """
SELECT event_type,
       CAST(MAX(ts) AS TIMESTAMP) AS latest_ts,
       CAST(FLOOR((999302400.0 - epoch(MAX(ts))) / 3600) AS BIGINT) AS lag_hours,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("dq_freshness_by_type", oracle=FRESHNESS_ORACLE, tags=("quality", "events"))
def dq_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness monitoring — the first SLA check any lake
    dashboard runs: latest event timestamp per type and its lag (in
    whole hours) behind a fixed reference instant (2001-09-01 UTC =
    epoch 999302400; a wall-clock 'now' would be nondeterministic —
    production substitutes current_timestamp for the literal).
    Timestamps are compared in fractional epoch seconds on both
    engines (cast-to-double, not unix_timestamp, which truncates
    sub-second parts). One map-side-combinable max/count agg."""
    ev = _t(spark, sf_dir, "events")
    latest = F.max("ts")
    return (
        ev.groupBy("event_type")
        .agg(
            latest.alias("latest_ts"),
            F.floor(
                (F.lit(999302400.0) - latest.cast("double")) / 3600
            )
            .cast("bigint")
            .alias("lag_hours"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Sketch algebra × multidimensional rollup: HLL over a cube
# ---------------------------------------------------------------------------

HLL_CUBE_ORACLE = """
WITH e AS (
  SELECT event_type, CAST((dayofweek(ts) + 6) % 7 AS VARCHAR) AS dow, user_id
  FROM events
), cells AS (
  SELECT event_type || '|' || dow AS gk, user_id FROM e
  UNION ALL SELECT event_type || '|ALL', user_id FROM e
  UNION ALL SELECT 'ALL|' || dow, user_id FROM e
  UNION ALL SELECT 'ALL|ALL', user_id FROM e
), h AS (
  SELECT gk,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'hll1'), 1, 8)
              AS BIGINT) AS h
  FROM cells
), r AS (
  SELECT gk, h // 268435456 AS reg, h % 268435456 AS suffix FROM h
), rho AS (
  SELECT gk, reg,
         CASE WHEN suffix = 0 THEN 29 ELSE 29 - length(bin(suffix)) END AS rho
  FROM r
), base AS (
  SELECT gk, reg, MAX(rho) AS m FROM rho GROUP BY 1, 2
), keys AS (
  SELECT DISTINCT gk FROM base
), fullreg AS (
  SELECT k.gk, g.reg, COALESCE(b.m, 0) AS m
  FROM keys k CROSS JOIN (SELECT UNNEST(range(16)) AS reg) g
  LEFT JOIN base b ON b.gk = k.gk AND b.reg = g.reg
), s AS (
  SELECT gk,
         FLOOR((0.673 * 256.0 * 4294967296.0)
               / SUM(CAST(1 AS BIGINT) << CAST(32 - m AS INTEGER))
               * 1e4 + 0.5) / 1e4 AS users_est,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_registers
  FROM fullreg GROUP BY gk
), ex AS (
  SELECT gk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM cells GROUP BY gk
)
SELECT split_part(s.gk, '|', 1) AS event_type,
       split_part(s.gk, '|', 2) AS dow,
       s.users_est, s.n_zero_registers, ex.exact_users
FROM s JOIN ex USING (gk)
ORDER BY event_type, dow
"""


@register(
    "sketch_hll_cube", oracle=HLL_CUBE_ORACLE, tags=("sketch", "approx", "agg", "cube")
)
def sketch_hll_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL distinct users over the FULL CUBE of (event_type ×
    weekday) — sketch algebra composed with multidimensional rollup:
    each register observation is relabeled into the 4 cube cells it
    belongs to (type×dow, type×ALL, ALL×dow, ALL×ALL — the bounded ×4
    fan-out), and because HLL registers merge by MAX, the duplicate
    observations are free; one estimate pass serves every grouping
    set. Exact distincts ride along per cell for error context. This
    is the 100 TB dashboard shape: one scan, mergeable state, every
    rollup level materialized from the same registers (a plain
    GROUP BY CUBE + COUNT(DISTINCT) re-shuffles raw user ids per
    grouping set instead)."""
    from data_lake_with_spark_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        ((F.dayofweek("ts") + 5) % 7).cast("string").alias("dow"),
        "user_id",
    )
    cells = ev.select(
        F.explode(
            F.array(
                F.concat("event_type", F.lit("|"), "dow"),
                F.concat("event_type", F.lit("|ALL")),
                F.concat(F.lit("ALL|"), "dow"),
                F.lit("ALL|ALL"),
            )
        ).alias("gk"),
        "user_id",
    )
    est = hll_estimate(hll_registers(cells, "user_id", "gk"))
    exact = cells.groupBy("gk").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        est.join(exact, "gk")
        .select(
            F.substring_index("gk", "|", 1).alias("event_type"),
            F.substring_index("gk", "|", -1).alias("dow"),
            "users_est",
            "n_zero_registers",
            "exact_users",
        )
        .orderBy("event_type", "dow")
    )


# ---------------------------------------------------------------------------
# Sorting: keyset pagination (the OFFSET-free page fetch)
# ---------------------------------------------------------------------------

KEYSET_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register("sort_keyset_pagination", oracle=KEYSET_ORACLE, tags=("sort", "topk"))
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 (rows 41-60) of orders by price — fetched the way a
    100 TB pager must: KEYSET pagination. The anchor is the last key
    of the previous page ((price, orderkey) of row 40 — here derived
    by a TakeOrdered top-40 and a bounded collect; in an API server
    the client passes it back); the page itself is a pushed-down
    strict-after predicate `price < aₚ OR (price = aₚ AND key > aₖ)`
    plus another TakeOrdered — both per-partition top-k merges, no
    single-partition sort, no OFFSET scan-and-discard (which reads
    and sorts all preceding pages; it survives only as the oracle).
    The composite tie-break key makes every page boundary
    deterministic under duplicate prices."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    top40 = (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(40).collect()
    )
    a_p, a_k = top40[-1]["o_totalprice"], top40[-1]["o_orderkey"]
    after_anchor = (F.col("o_totalprice") < F.lit(a_p)) | (
        (F.col("o_totalprice") == F.lit(a_p)) & (F.col("o_orderkey") > F.lit(a_k))
    )
    return (
        o.where(after_anchor)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Joins: point-in-time (feature-store correctness) join against SCD2
# ---------------------------------------------------------------------------

PIT_ORACLE = """
WITH f AS (
  SELECT o_custkey AS c_key, o_orderpriority AS prio, o_orderdate AS vf
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
), l AS (
  SELECT o_custkey AS c_key, o_orderpriority AS uprio, o_orderdate AS uts
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
), hist AS (
  SELECT f.c_key, f.prio, f.vf AS valid_from,
         CASE WHEN l.uprio <> f.prio THEN l.uts END AS valid_to
  FROM f JOIN l USING (c_key)
  UNION ALL
  SELECT l.c_key, l.uprio, l.uts, NULL
  FROM f JOIN l USING (c_key) WHERE l.uprio <> f.prio
)
SELECT h.prio AS prio_at_order,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN hist h ON h.c_key = o.o_custkey
           AND h.valid_from <= o.o_orderdate
           AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
GROUP BY h.prio ORDER BY prio_at_order
"""


@register(
    "join_pointintime_scd2", oracle=PIT_ORACLE, tags=("join", "cdc", "training")
)
def join_pointintime_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct enrichment — THE feature-store join: every
    order picks the SCD2 priority version that was valid AT ITS OWN
    DATE (no leakage from future versions), then revenue rolls up by
    that as-was attribute. Implementation: as-of join on valid_from
    (one interleaved-stream window, operators/joins.py:asof_join — no
    interval explosion) after dropping zero-length versions
    (valid_to = valid_from covers nothing and would tie the as-of
    pick); gap-free SCD2 intervals make as-of ≡ the between-join the
    oracle runs. Shuffles: one window keyed on customer — same cost
    as any per-key sort at 100 TB; history bucketing co-locates it."""
    from data_lake_with_spark_spark.operators.joins import asof_join

    hist = _order_priority_history(spark, sf_dir).where(
        F.col("valid_to").isNull()
        | (F.col("valid_to") != F.col("valid_from"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_key"), "o_orderdate", "o_totalprice"
    )
    pit = asof_join(
        orders,
        hist,
        by="c_key",
        left_ts="o_orderdate",
        right_ts="valid_from",
        right_cols=["prio"],
    )
    return (
        pit.groupBy(F.col("prio_asof").alias("prio_at_order"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("prio_at_order")
    )


# ---------------------------------------------------------------------------
# Graph: k-core membership (iterative peeling)
# ---------------------------------------------------------------------------


def _kcore_oracle(k: int = 2, n_iter: int = 6) -> str:
    head = """WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), n0 AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM ed
)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", d{i} AS MATERIALIZED (
  SELECT ed.src AS id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM ed
  JOIN n{i - 1} a ON a.id = ed.src
  JOIN n{i - 1} b ON b.id = ed.dst
  GROUP BY ed.src
), n{i} AS MATERIALIZED (
  SELECT id FROM d{i} WHERE degree >= {k}
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT d.id AS vec_id, d.degree AS core_degree"
        f"\nFROM d{n_iter} d JOIN n{n_iter} USING (id)"
        "\nORDER BY vec_id"
    )


@register(
    "graph_kcore_membership",
    oracle=_kcore_oracle(2, 6),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup graph by iterative peeling (6 unrolled
    rounds): nodes that remain after repeatedly shedding degree-<2
    nodes — the dense-cluster skeleton that separates true duplicate
    GROUPS from incidental pairwise matches (a chain's endpoints peel
    off; a clique survives). Deterministic predicate per round, so it
    unrolls into a SQL twin like the other iterative operators
    (operators/graph.py:kcore has the per-round semi-join + degree
    kernel); the pytest pins the 6-round fixpoint against an exact
    driver-side peel."""
    from data_lake_with_spark_spark.operators.graph import kcore

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    core = kcore(pairs, k=2, n_iter=6)
    return core.select(
        F.col("id").alias("vec_id"), F.col("degree").cast("bigint").alias("core_degree")
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Statistics: higher moments and association strength
# ---------------------------------------------------------------------------

SKEW_KURT_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(value * value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS s4
  FROM events GROUP BY event_type
), c AS (
  SELECT event_type, n,
         s1 / n AS mean,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n)
           + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n)
           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM m
)
SELECT event_type, n,
       FLOOR(mean * 10000.0 + 0.5) / 10000.0 AS mean,
       FLOOR((m3 / (m2 * sqrt(m2))) * 10000.0 + 0.5) / 10000.0 AS skewness,
       FLOOR((m4 / (m2 * m2) - 3.0) * 10000.0 + 0.5) / 10000.0 AS kurtosis
FROM c ORDER BY event_type
"""


@register("stats_skew_kurtosis", oracle=SKEW_KURT_ORACLE, tags=("stats", "agg"))
def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per event type from exact
    decimal power sums (Σx..Σx⁴ in DECIMAL(38,6) — x⁴ overflows the
    (18,6) default) — one map-side-combinable agg, then central
    moments written in the IDENTICAL operation order on both engines.
    sqrt(m2)·m2 replaces pow(m2, 1.5): sqrt is IEEE-correctly-rounded
    everywhere, pow's last ulp is libm-specific — the same
    transcendental discipline as the quantized-log queries."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    dec = "decimal(38,6)"
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v.cast(dec)).cast("double").alias("s1"),
        F.sum((v * v).cast(dec)).cast("double").alias("s2"),
        F.sum((v * v * v).cast(dec)).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast(dec)).cast("double").alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mean * (F.col("s2") / F.col("n"))
        + 2 * mean * mean * mean
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * mean * mean * (F.col("s2") / F.col("n"))
        - 3 * mean * mean * mean * mean
    )
    c = m.select("event_type", "n", mean.alias("mean"), m2.alias("m2"),
                 m3.alias("m3"), m4.alias("m4"))
    return c.select(
        "event_type",
        "n",
        pround(F.col("mean"), 4).alias("mean"),
        pround(F.col("m3") / (F.col("m2") * F.sqrt("m2")), 4).alias("skewness"),
        pround(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 4).alias(
            "kurtosis"
        ),
    ).orderBy("event_type")


CRAMERS_ORACLE = """
WITH o AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
  FROM documents GROUP BY 1, 2
), rt AS (SELECT lang, SUM(obs) AS r FROM o GROUP BY lang),
ct AS (SELECT source, SUM(obs) AS c FROM o GROUP BY source),
n AS (SELECT SUM(obs) AS n FROM o),
q AS (
  SELECT CAST(FLOOR(((o.obs - rt.r * ct.c * 1.0 / n.n)
                     * (o.obs - rt.r * ct.c * 1.0 / n.n)
                     / (rt.r * ct.c * 1.0 / n.n)) * 1e6) AS BIGINT) AS cq
  FROM o JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
), dims AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS nr,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS nc,
         (SELECT CAST(n AS BIGINT) FROM n) AS n
)
SELECT n, nr AS n_rows_dim, nc AS n_cols_dim,
       FLOOR((CAST(SUM(cq) AS BIGINT) / 1e6) * 10000.0 + 0.5) / 10000.0
         AS chi_square,
       FLOOR(sqrt((CAST(SUM(cq) AS BIGINT) / 1e6)
                  / (n * LEAST(nr - 1, nc - 1))) * 1000000.0 + 0.5) / 1000000.0
         AS cramers_v
FROM q CROSS JOIN dims
GROUP BY n, nr, nc
"""


@register("stats_cramers_v", oracle=CRAMERS_ORACLE, tags=("stats", "agg"))
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength for lang × source — the
    normalized effect size on top of stats_chi_square_cells' per-cell
    contributions: V = √(χ²/(n·min(r−1,c−1))). Per-cell χ²
    contributions are QUANTIZED to integers before the total (float
    summation over cells would be enumeration-order-dependent; the
    quantized sum is exact — the same trick as the KL and log-prob
    queries), then one sqrt at readout. Contingency table + two tiny
    marginal re-aggregations, nothing else scales with rows."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    docs = _t(spark, sf_dir, "documents")
    # shared(): the tiny contingency table feeds both marginals, the
    # grand total and the per-cell join — uncached, the documents scan
    # re-derived 7x (round-10 scan audit).
    o = shared(
        docs.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("bigint").alias("obs")
        )
    )
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    e = F.col("r") * F.col("c") * F.lit(1.0) / F.col("n")
    cq = F.floor(
        ((F.col("obs") - e) * (F.col("obs") - e) / e) * 1e6
    ).cast("long")
    q = (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(cq.alias("cq"))
    )
    dims = (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).cast("bigint").alias("nc")))
        .crossJoin(n.select(F.col("n").cast("bigint").alias("n")))
    )
    chi = F.sum("cq").cast("bigint") / 1e6
    return (
        q.crossJoin(F.broadcast(dims))
        .groupBy("n", "nr", "nc")
        .agg(
            pround(chi, 4).alias("chi_square"),
            pround(
                F.sqrt(
                    (F.sum("cq").cast("bigint") / 1e6)
                    / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
        .select(
            "n",
            F.col("nr").alias("n_rows_dim"),
            F.col("nc").alias("n_cols_dim"),
            "chi_square",
            "cramers_v",
        )
    )


AHASH_ORACLE = """
WITH lead AS (
  SELECT doc_id, doc_id - doc_id % 25 AS lead_id FROM documents
), base AS (
  SELECT doc_id AS lead_id, md5(text) || md5(text || 'x') AS h FROM documents
), m AS (
  SELECT l.doc_id, b.h FROM lead l JOIN base b USING (lead_id)
), by AS (
  SELECT doc_id, i,
         CASE WHEN i = doc_id % 32
              THEN ((strpos('0123456789abcdef', substr(h, 2 * i + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(h, 2 * i + 2, 1)) - 1)
                  + (doc_id % 7) * 16) % 256
              ELSE (strpos('0123456789abcdef', substr(h, 2 * i + 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(h, 2 * i + 2, 1)) - 1)
         END AS b
  FROM m, UNNEST(range(32)) AS u(i)
), tot AS (
  SELECT doc_id, CAST(SUM(b) AS BIGINT) AS s FROM by GROUP BY doc_id
), bits AS (
  SELECT by.doc_id,
         CAST(SUM(CASE WHEN by.b * 32 > tot.s
                       THEN (CAST(1 AS BIGINT) << by.i) ELSE 0 END) AS BIGINT)
           AS ah
  FROM by JOIN tot USING (doc_id) GROUP BY by.doc_id
), bands AS (
  SELECT doc_id, ah, k.k, (ah >> (8 * k.k)) & 255 AS key
  FROM bits CROSS JOIN (SELECT UNNEST(range(4)) AS k) k
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.ah AS ha, b.ah AS hb
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
ORDER BY a_id, b_id
"""


@register(
    "dedup_image_ahash",
    oracle=AHASH_ORACLE,
    tags=("dedup", "multimodal", "llm", "approx"),
)
def dedup_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE dedup by average hash (aHash): 32-bit
    fingerprint sets bit i when pixel i is above the image mean --
    compared in INTEGERS (pixel*32 > sum, no division), so the
    perceptual hash is bit-portable; candidates come from the
    4x8-bit pigeonhole band join (lossless for hamming <= 3, the
    simhash blocking argument) and verify by exact popcount. The
    corpus is a synthetic near-dup image family -- 20 base rasters
    (md5-derived, one per 25-doc group) each with 25 single-pixel-
    perturbed variants -- so the screen finds real matches that
    exact byte dedup misses (the brightness-noise robustness aHash
    exists for). Pixels are hex arithmetic JVM-side; no decode stage
    is needed for the hash, and the no-cartesian scale shape matches
    the text near-dup family."""
    docs = _t(spark, sf_dir, "documents")
    lead = docs.select(
        "doc_id", F.expr("doc_id - doc_id % 25").alias("lead_id")
    )
    base = docs.select(
        F.col("doc_id").alias("lead_id"),
        F.concat(F.md5("text"), F.md5(F.concat("text", F.lit("x")))).alias("h"),
    )
    m = lead.join(F.broadcast(base), "lead_id").select("doc_id", "h")
    # per-byte values + single-pixel perturbation, via the expr form
    # (dynamic substr positions -- python F.substring takes ints)
    by = m.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 31), i -> CAST(IF(i = doc_id % 32, "
            "(conv(substr(h, 2 * i + 1, 2), 16, 10) + (doc_id % 7) * 16) % 256, "
            "conv(substr(h, 2 * i + 1, 2), 16, 10)) AS BIGINT))"
        ).alias("bs"),
    )
    s = F.aggregate("bs", F.lit(0).cast("bigint"), lambda a, x: a + x)
    # python F.shiftleft wants a literal shift count; the SQL form
    # accepts a column, so the bit packing lives in expr()
    ah = F.expr(
        "aggregate(zip_with(bs, sequence(0, 31), (b, i) -> "
        "IF(b * 32 > s, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    # shared() barrier (round-14 optimization, guide §4.4's duplicated-
    # expression trap in its JVM form): the final hamming filter lets
    # constraint inference derive isnotnull(ah) for BOTH join inputs,
    # and filter pushdown substitutes the ENTIRE aHash expression into
    # each scan branch — with the per-element pixel-sum sub-aggregate
    # re-inlined, an O(32×32) conv per row per side, evaluated on top
    # of the two branches each re-deriving the hash pipeline from
    # parquet. Caching the (doc_id, ah) table makes ah a plain cached
    # column: the hash computes once, the null check is a column test.
    # Measured at sf0.1: 4.3s → ~1.3s, identical rows.
    from data_lake_with_spark_spark.operators.plan_cache import shared

    bits = shared(by.withColumn("s", s).select("doc_id", ah.alias("ah")))
    bands = bits.select(
        "doc_id",
        "ah",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("ah", 8 * k).bitwiseAND(F.lit(255))
                    for k in range(4)
                ]
            )
        ).alias("k", "key"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.ah").alias("ha"),
            F.col("b.ah").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("a_id", "b_id")
    )


COVERAGE_GAPS_ORACLE = """
WITH bounds AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
  FROM events
), spine AS (
  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), observed AS (
  SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), grid AS (
  SELECT t.event_type, s.day, o.day AS seen
  FROM types t CROSS JOIN spine s
  LEFT JOIN observed o ON o.event_type = t.event_type AND o.day = s.day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT_IF(seen IS NULL) AS BIGINT) AS n_missing_days,
       strftime(MIN(CASE WHEN seen IS NULL THEN day END), '%Y-%m-%d')
         AS first_gap_day
FROM grid GROUP BY event_type ORDER BY event_type
"""


@register("dq_coverage_gaps", oracle=COVERAGE_GAPS_ORACLE, tags=("quality", "events"))
def dq_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal completeness check -- days with ZERO events per type
    inside the table's own [min, max] day range: the silent-ingest-
    failure detector (a missing partition shows up as a gap day, not
    an error). The day spine is generated from two scalars
    (sequence + explode -- bounded by calendar, the
    dim_calendar_spine shape), crossed with the distinct type
    dimension, and anti-checked against the observed (type, day)
    pairs; nothing scales with raw events except one distinct
    collapse."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    types = ev.select("event_type").distinct()
    observed = ev.select(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    grid = types.crossJoin(spine).join(
        observed.select(
            F.col("event_type").alias("o_type"), F.col("day").alias("o_day")
        ),
        (F.col("event_type") == F.col("o_type"))
        & (F.col("day") == F.col("o_day")),
        "left",
    )
    return (
        grid.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.count_if(F.col("o_day").isNull()).cast("bigint").alias(
                "n_missing_days"
            ),
            F.date_format(
                F.min(F.when(F.col("o_day").isNull(), F.col("day"))),
                "yyyy-MM-dd",
            ).alias("first_gap_day"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Statistics: randomness and tail risk of the daily revenue series
# ---------------------------------------------------------------------------

RUNS_TEST_ORACLE = f"""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         {dsum_sql('o_totalprice', 2)} AS rev
  FROM orders GROUP BY day
), g AS (
  SELECT day, rev,
         CASE WHEN rev > LAG(rev) OVER (ORDER BY day) THEN 1
              WHEN rev < LAG(rev) OVER (ORDER BY day) THEN -1
         END AS sgn
  FROM d
), s AS (
  SELECT sgn,
         CASE WHEN sgn <> LAG(sgn) OVER (ORDER BY day) THEN 1 ELSE 0 END AS brk
  FROM g WHERE sgn IS NOT NULL
), a AS (
  SELECT CAST(COUNT_IF(sgn = 1) AS BIGINT) AS n_up,
         CAST(COUNT_IF(sgn = -1) AS BIGINT) AS n_down,
         CAST(1 + SUM(brk) AS BIGINT) AS n_runs
  FROM s
)
SELECT n_up, n_down, n_runs,
       FLOOR((2.0 * n_up * n_down / (n_up + n_down) + 1.0) * 10000.0 + 0.5)
         / 10000.0 AS expected_runs,
       FLOOR(((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
              / sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
                     / ((n_up + n_down) * (n_up + n_down) * (n_up + n_down - 1.0))))
             * 10000.0 + 0.5) / 10000.0 AS z_score
FROM a
"""


@register("stats_runs_test", oracle=RUNS_TEST_ORACLE, tags=("stats", "timeseries"))
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue up/down sequence
    -- the randomness check that catches trending or oscillating
    series a mean test misses: count maximal runs of same-sign
    day-over-day moves, compare against the expected run count
    2·n₊·n₋/n + 1 with its exact variance. Signs and run breaks are
    integers from two lag passes over the CALENDAR-sized daily
    aggregate; the z-score's float expression is written in the
    identical operation order on both engines (ties/zero-change days
    are dropped, the standard treatment). One decimal-exact daily
    rollup, two tiny windows, a 1-row readout."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice"), 2).alias("rev"))
    )
    w = Window.orderBy("day")
    g = daily.select(
        "day",
        F.when(F.col("rev") > F.lag("rev").over(w), 1)
        .when(F.col("rev") < F.lag("rev").over(w), -1)
        .alias("sgn"),
    )
    sflt = g.where(F.col("sgn").isNotNull())
    s2 = sflt.select(
        "sgn",
        F.when(F.col("sgn") != F.lag("sgn").over(w), 1).otherwise(0).alias("brk"),
    )
    a = s2.agg(
        F.count_if(F.col("sgn") == 1).cast("bigint").alias("n_up"),
        F.count_if(F.col("sgn") == -1).cast("bigint").alias("n_down"),
        (F.lit(1) + F.sum("brk")).cast("bigint").alias("n_runs"),
    )
    nu, nd, nr = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    exp_runs = F.lit(2.0) * nu * nd / (nu + nd) + F.lit(1.0)
    var_num = (
        F.lit(2.0) * nu * nd * (F.lit(2.0) * nu * nd - nu - nd)
    )
    var_den = (nu + nd) * (nu + nd) * (nu + nd - F.lit(1.0))
    return a.select(
        "n_up",
        "n_down",
        "n_runs",
        pround(exp_runs, 4).alias("expected_runs"),
        pround((nr - exp_runs) / F.sqrt(var_num / var_den), 4).alias("z_score"),
    )


VAR_ORACLE = f"""
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         {dsum_sql('o_totalprice', 2)} AS rev
  FROM orders GROUP BY day
), r AS (
  SELECT day, rev,
         FLOOR((rev - LAG(rev) OVER (ORDER BY day)) * 100.0 + 0.5) AS chg_cents
  FROM d
), v AS (
  SELECT chg_cents, ROW_NUMBER() OVER (ORDER BY chg_cents) AS rn,
         COUNT(*) OVER () AS n
  FROM r WHERE chg_cents IS NOT NULL
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST((5 * n + 99) // 100 AS BIGINT) AS var_rank,
       chg_cents / 100.0 AS var_95
FROM v WHERE rn = CAST((5 * n + 99) // 100 AS BIGINT)
"""


@register("finance_var_historical", oracle=VAR_ORACLE, tags=("finance", "stats"))
def finance_var_historical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% Value-at-Risk of the day-over-day revenue
    change: the 5th-percentile worst daily move, selected by exact
    integer rank ceil(0.05·n) over the change distribution in CENTS
    (changes pre-rounded to integers so the order statistic is
    tie-proof). The series is the CALENDAR-sized daily aggregate, so
    the ranking window is metadata-sized — the raw scan is one
    decimal-exact rollup; drawdown (finance_max_drawdown) reads the
    same series' path risk, this reads its tail risk."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice"), 2).alias("rev"))
    )
    w = Window.orderBy("day")
    r = daily.select(
        F.floor((F.col("rev") - F.lag("rev").over(w)) * 100.0 + 0.5).alias(
            "chg_cents"
        )
    ).where(F.col("chg_cents").isNotNull())
    wv = Window.orderBy("chg_cents")
    v = r.select(
        "chg_cents",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return (
        v.where(F.col("rn") == F.expr("(5 * n + 99) div 100"))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.expr("(5 * n + 99) div 100").cast("bigint").alias("var_rank"),
            (F.col("chg_cents") / F.lit(100.0)).alias("var_95"),
        )
    )


# ---------------------------------------------------------------------------
# Relational: skyline (Pareto frontier) operator
# ---------------------------------------------------------------------------

SKYLINE_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_orderdate,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS d
  FROM orders
), m AS (
  SELECT o_orderkey, o_orderdate, price_cents, d,
         MAX(d) OVER (ORDER BY price_cents
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS maxd_cheaper,
         MAX(d) OVER (PARTITION BY price_cents) AS maxd_same
  FROM o
)
SELECT o_orderkey, price_cents / 100.0 AS price,
       CAST(o_orderdate AS TIMESTAMP) AS order_date
FROM m
WHERE (maxd_cheaper IS NULL OR d > maxd_cheaper) AND d = maxd_same
ORDER BY price_cents, o_orderkey
"""


@register("skyline_pareto_orders", oracle=SKYLINE_ORACLE, tags=("relational", "window"))
def skyline_pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-frontier) operator — the multi-objective
    dominance query (Borzsony/Kossmann/Stocker 2001) the relational
    family lacked: orders minimizing price while maximizing recency;
    a row survives iff no other order is cheaper-or-equal AND
    newer-or-equal with one strict. The 2-D frontier reduces to TWO
    window maxima instead of the O(n²) dominance join: the newest
    date among STRICTLY cheaper rows (integer-keyed RANGE frame) and
    the newest within the same price — keep rows newer than the
    former and tied with the latter (exact-duplicate frontier points
    all survive, per the one-strict rule). Integer cents / epoch
    seconds, so the frontier is tie-proof. At 100 TB the price order
    becomes a two-level band partition (per-band partials + carry —
    the segment_abc_distributed shape); the dominance-join form never
    exists on either engine."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
        # day-integer key (datediff), not cast-to-epoch: o_orderdate
        # arrives as TIMESTAMP_NTZ under vanilla driver sessions,
        # which refuses numeric casts
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    )
    w_cheaper = (
        Window.orderBy("price_cents").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_cents")
    m = o.select(
        "o_orderkey",
        "o_orderdate",
        "price_cents",
        "d",
        F.max("d").over(w_cheaper).alias("maxd_cheaper"),
        F.max("d").over(w_same).alias("maxd_same"),
    )
    return (
        m.where(
            (F.col("maxd_cheaper").isNull() | (F.col("d") > F.col("maxd_cheaper")))
            & (F.col("d") == F.col("maxd_same"))
        )
        .select(
            "o_orderkey",
            (F.col("price_cents") / F.lit(100.0)).alias("price"),
            F.col("o_orderdate").alias("order_date"),
        )
        .orderBy("price", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Corpus: n-gram novelty curve
# ---------------------------------------------------------------------------

NOVELTY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT_IF(f.first_doc = s.doc_id) AS BIGINT) AS n_novel,
       FLOOR((COUNT_IF(f.first_doc = s.doc_id) * 1.0 / COUNT(*))
             * 1000000.0 + 0.5) / 1000000.0 AS novelty_ratio
FROM sh s JOIN firsts f USING (shingle)
GROUP BY s.doc_id ORDER BY s.doc_id
"""


@register(
    "text_ngram_novelty", oracle=NOVELTY_ORACLE, tags=("text", "llm", "dedup")
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram NOVELTY in corpus id order — the fraction
    of a doc's shingles never seen in any earlier doc: the dedup-ROI
    curve (novelty collapsing toward 0 says additional data is
    re-treading old text — the signal that decides when to stop
    crawling a source). One shingle inverted index (min doc_id per
    shingle — the same index dedup_ngram_jaccard builds), one join
    back, integer ratios. Sub-linear at 100 TB when the first-seen
    index is maintained incrementally (an IVM min-fold, like the
    bitmap/HLL states)."""
    from data_lake_with_spark_spark.operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    sh = DD.shingle_table(docs, id_col="doc_id", text_col="text", n=3)
    firsts = sh.groupBy("shingle").agg(F.min("id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count_if(F.col("first_doc") == F.col("id"))
            .cast("bigint")
            .alias("n_novel"),
            pround(
                F.count_if(F.col("first_doc") == F.col("id"))
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Audience analysis: exact pairwise overlap (the theta sketch's truth)
# ---------------------------------------------------------------------------

AUDIENCE_OVERLAP_ORACLE = """
WITH a AS (
  SELECT DISTINCT event_type, user_id FROM events
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY event_type
), p AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY x.event_type, y.event_type
)
SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
       FLOOR((p.n_both * 1.0 / (sa.n + sb.n - p.n_both)) * 1000000.0 + 0.5)
         / 1000000.0 AS jaccard
FROM p JOIN s sa ON sa.event_type = p.type_a
JOIN s sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


@register(
    "audience_overlap_exact",
    oracle=AUDIENCE_OVERLAP_ORACLE,
    tags=("agg", "events", "sketch"),
)
def audience_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap between event types — the
    ground truth the KMV theta sketch (sketch_theta_overlap)
    estimates: distinct (type, user) collapse, then a user-keyed
    self-join counts co-membership per type pair (the shuffle is keyed
    on user, never a type-pair cartesian; per-user fan-out is bounded
    by the type count). Integer sizes and intersections, one rounded
    Jaccard per pair. At 100 TB this exact form is the periodic
    calibration job run against the always-on sketch."""
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    s = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    x = ev.select(F.col("event_type").alias("type_a"), "user_id")
    y = ev.select(F.col("event_type").alias("type_b"), "user_id")
    p = (
        x.join(y, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        p.join(
            F.broadcast(s.select(F.col("event_type").alias("type_a"),
                                 F.col("n").alias("n_a"))), "type_a"
        )
        .join(
            F.broadcast(s.select(F.col("event_type").alias("type_b"),
                                 F.col("n").alias("n_b"))), "type_b"
        )
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            pround(
                F.col("n_both") * F.lit(1.0)
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Relational: division (the "for all" join)
# ---------------------------------------------------------------------------

DIVISION_ORACLE = """
WITH yrs AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS yr FROM orders
), cy AS (
  SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr
  FROM orders
), qual AS (
  SELECT o_custkey
  FROM cy GROUP BY o_custkey
  HAVING COUNT(*) = (SELECT COUNT(*) FROM yrs)
)
SELECT q.o_custkey AS c_custkey, c.c_mktsegment,
       CAST(n.n_years AS BIGINT) AS n_years
FROM qual q
JOIN customer c ON c.c_custkey = q.o_custkey
CROSS JOIN (SELECT COUNT(*) AS n_years FROM yrs) n
ORDER BY c_custkey
"""


@register(
    "join_relational_division", oracle=DIVISION_ORACLE, tags=("join", "relational")
)
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION — the "for all" join the classic algebra
    names and SQL lacks a keyword for: customers with at least one
    order in EVERY year the table covers (suppliers-supplying-all-
    parts shape). Implemented the count-matching way: distinct
    (customer, year) collapse, per-customer year count equal to the
    1-row broadcast universe count — two hash-aggs and a broadcast,
    never a per-element anti-join loop. The double-NOT-EXISTS
    formulation survives only in textbooks; the oracle uses the same
    counting form."""
    orders = _t(spark, sf_dir, "orders")
    cy = orders.select(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).distinct()
    yrs = cy.select("yr").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_years")
    )
    qual = (
        cy.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ny"))
        .crossJoin(F.broadcast(yrs))
        .where(F.col("ny") == F.col("n_years"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        qual.join(cust, qual["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("n_years").cast("bigint").alias("n_years"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Data quality: content checksums / replica diff
# ---------------------------------------------------------------------------

TABLE_DIFF_ORACLE = """
WITH a AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         o_orderkey, o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), b AS (
  SELECT yr, o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 9973 = 0 THEN cents + 100 ELSE cents END AS cents
  FROM a
), ha AS (
  SELECT yr,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST('0x' || substring(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || CAST(cents AS VARCHAR)), 1, 8) AS BIGINT)) AS BIGINT)
           AS checksum_a
  FROM a GROUP BY yr
), hb AS (
  SELECT yr,
         CAST(SUM(CAST('0x' || substring(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || CAST(cents AS VARCHAR)), 1, 8) AS BIGINT)) AS BIGINT)
           AS checksum_b
  FROM b GROUP BY yr
)
SELECT ha.yr, ha.n_rows, ha.checksum_a, hb.checksum_b,
       ha.checksum_a = hb.checksum_b AS is_match
FROM ha JOIN hb USING (yr)
ORDER BY yr
"""


@register(
    "dq_table_diff_checksums", oracle=TABLE_DIFF_ORACLE, tags=("quality", "lakehouse")
)
def dq_table_diff_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level content checksums + replica diff — the
    migration/replication verifier: each row hashes to a portable
    32-bit md5 integer over its INTEGER-rendered key columns (floats
    enter as exact cents — float-to-string formatting is the one
    cross-engine trap this avoids), per-partition checksum = plain
    SUM (order-independent, mergeable), and two replicas compare by
    (n_rows, checksum) per partition. Replica B here is the same
    table with a deterministic simulated corruption (cents+100 on
    orderkey % 9973 = 0), so exactly the partitions containing those
    keys flag is_match = false. Map-side hash + one hash-agg per
    replica — the cheapest possible full-content comparison at
    100 TB (one pass, 16 bytes of state per partition)."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    b = o.withColumn(
        "cents",
        F.when(F.col("o_orderkey") % 9973 == 0, F.col("cents") + 100).otherwise(
            F.col("cents")
        ),
    )

    def _h(df):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    ha = o.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(_h(o)).cast("bigint").alias("checksum_a"),
    )
    hb = b.groupBy("yr").agg(F.sum(_h(b)).cast("bigint").alias("checksum_b"))
    return (
        ha.join(hb, "yr")
        .select(
            "yr",
            "n_rows",
            "checksum_a",
            "checksum_b",
            (F.col("checksum_a") == F.col("checksum_b")).alias("is_match"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Time series: rolling correlation between two daily series
# ---------------------------------------------------------------------------

ROLLING_CORR_ORACLE = """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(FLOOR(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(COALESCE(SUM(CASE WHEN event_type = 'view'
                                      THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    * 100 + 0.5) AS BIGINT) AS y
  FROM events GROUP BY day
), w AS (
  SELECT day,
         CAST(COUNT(*) OVER fr AS BIGINT) AS n,
         CAST(SUM(x) OVER fr AS BIGINT) AS sx,
         CAST(SUM(y) OVER fr AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER fr AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER fr AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER fr AS BIGINT) AS syy
  FROM d
  WINDOW fr AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day, n AS n_obs,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
             AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
            THEN FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
                       * 1000000.0 + 0.5) / 1000000.0
       END AS rolling_corr
FROM w ORDER BY day
"""


@register(
    "timeseries_rolling_corr",
    oracle=ROLLING_CORR_ORACLE,
    tags=("timeseries", "window", "stats"),
)
def timeseries_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-observation rolling Pearson correlation between the daily
    purchase and view revenue series — the co-movement monitor.
    Determinism under sliding frames is the hard part: engines
    aggregate frames with different association orders (DuckDB's
    segment tree vs Spark's running accumulation), so double window
    sums drift in the last ulp — here every WINDOW SUM is an exact
    BIGINT (daily values pre-floored to cents; products fit 2⁶³), and
    the correlation is assembled from those integers in identical
    double-op order, sqrt-only. Zero-variance frames yield NULL on
    both engines. The window runs over the CALENDAR-sized daily
    rollup; readout products are computed in doubles on BOTH engines
    (a bigint multiply would overflow ANSI Spark / promote to hugeint
    in DuckDB at extreme magnitudes — doubles keep the two engines on
    the same arithmetic)."""
    ev = _t(spark, sf_dir, "events")
    dec = "decimal(18,6)"
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.floor(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x"),
        F.floor(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("y"),
    )
    fr = Window.orderBy("day").rowsBetween(-29, 0)
    w = d.select(
        "day",
        F.count(F.lit(1)).over(fr).cast("bigint").alias("n"),
        F.sum("x").over(fr).cast("bigint").alias("sx"),
        F.sum("y").over(fr).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    corr = pround(num / (F.sqrt(vx) * F.sqrt(vy)), 6)
    return w.select(
        "day",
        F.col("n").alias("n_obs"),
        F.when((vx > 0) & (vy > 0), corr).alias("rolling_corr"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Statistics: Spearman rank correlation (completes the correlation family)
# ---------------------------------------------------------------------------

SPEARMAN_ORACLE = """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(FLOOR(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    * 100 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(COALESCE(SUM(CASE WHEN event_type = 'view'
                                      THEN CAST(value AS DECIMAL(18,6)) END), 0)
                    * 100 + 0.5) AS BIGINT) AS y
  FROM events GROUP BY day
), gx AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cumb
  FROM d GROUP BY x
), gy AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cumb
  FROM d GROUP BY y
), r AS (
  SELECT d.day,
         2 * gx.cumb + gx.cnt + 1 AS rx,
         2 * gy.cumb + gy.cnt + 1 AS ry
  FROM d JOIN gx USING (x) JOIN gy USING (y)
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy
  FROM r
)
SELECT n AS n_days,
       FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             * 1000000.0 + 0.5) / 1000000.0 AS spearman_rho
FROM s
"""


@register("stats_spearman_corr", oracle=SPEARMAN_ORACLE, tags=("stats", "timeseries"))
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily purchase and view
    revenue series — the monotone-association companion of Pearson
    (timeseries_rolling_corr) and the robust choice under outliers:
    Pearson over AVERAGE RANKS, with ranks as doubled integers
    (2·cum_before + cnt + 1, the ml_auc_rank_sum tie device) from the
    distinct-value spine of each series, so every sum is an exact
    BIGINT; the final assembly is identical-order double math with
    one sqrt per variance. Two tiny spine windows over the
    calendar-sized daily rollup, one join back by day, a 1-row
    readout."""
    ev = _t(spark, sf_dir, "events")
    dec = "decimal(18,6)"
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.floor(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x"),
        F.floor(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("y"),
    )

    def spine(col: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            d.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .select(
                col,
                "cnt",
                F.coalesce(F.sum("cnt").over(w), F.lit(0))
                .cast("bigint")
                .alias("cumb"),
            )
        )

    gx = spine("x").select(
        "x", (2 * F.col("cumb") + F.col("cnt") + 1).alias("rx")
    )
    gy = spine("y").select(
        "y", (2 * F.col("cumb") + F.col("cnt") + 1).alias("ry")
    )
    r = d.join(gx, "x").join(gy, "y")
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        F.col("n").alias("n_days"),
        pround(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Markov predictability and fulfillment latency
# ---------------------------------------------------------------------------

TRANSITION_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), c AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
), tot AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY event_type
), scored AS (
  SELECT c.event_type, c.n,
         CAST(FLOOR((ln(CAST(c.n AS DOUBLE)) - ln(CAST(tot.t AS DOUBLE)))
                    * 1e6) AS BIGINT) AS lp
  FROM c JOIN tot USING (event_type)
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_next_states,
       FLOOR((-(CAST(SUM(n * lp) AS BIGINT) * 1.0 / SUM(n) / 1e6))
             * 10000.0 + 0.5) / 10000.0 AS entropy_nats
FROM scored GROUP BY event_type ORDER BY event_type
"""


@register(
    "events_transition_entropy",
    oracle=TRANSITION_ENTROPY_ORACLE,
    tags=("analytics", "events", "stats"),
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state Markov transition entropy — how PREDICTABLE the next
    event is from each current event type (the uncertainty readout on
    top of events_transition_matrix's probabilities: 0 nats = a
    deterministic funnel step, ln|types| = anything can follow).
    Entropy uses the quantized-integer log-prob discipline (floor of
    ln-ratio at 1e-6 BEFORE the weighted sum), so it is bit-identical
    across engines and partitionings. One user-keyed lead window over
    raw events, then |types|²-row arithmetic."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("t"))
    lp = F.floor(
        (F.log(F.col("n").cast("double")) - F.log(F.col("t").cast("double"))) * 1e6
    ).cast("long")
    scored = c.join(F.broadcast(tot), "event_type").select(
        "event_type", "n", lp.alias("lp")
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_transitions"),
            F.count(F.lit(1)).cast("bigint").alias("n_next_states"),
            (
                F.floor(
                    (
                        -(
                            F.sum(F.col("n") * F.col("lp")).cast("bigint")
                            * 1.0
                            / F.sum("n")
                            / 1e6
                        )
                    )
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("entropy_nats"),
        )
        .orderBy("event_type")
    )


SHIP_DELAY_ORACLE = """
WITH j AS (
  SELECT o.o_orderpriority,
         datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
           AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(delay_days) AS BIGINT) AS min_days,
       CAST(MAX(delay_days) AS BIGINT) AS max_days,
       FLOOR((CAST(SUM(CAST(delay_days AS BIGINT)) AS DOUBLE) / COUNT(*))
             * 10000.0 + 0.5) / 10000.0 AS avg_days,
       CAST(COUNT_IF(delay_days > 60) AS BIGINT) AS n_late
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register(
    "orders_ship_delay_stats", oracle=SHIP_DELAY_ORACLE, tags=("analytics", "join")
)
def orders_ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment latency by order priority — ship date minus order
    date per lineitem, the ops-SLA readout (does 1-URGENT actually
    ship faster?): integer day deltas via datediff (timestamp-NTZ-safe
    — no numeric casts on raw parquet timestamps), exact BIGINT sums,
    one rounded mean, plus a >60-day late counter. The orders side
    broadcasts if small or hash-joins on orderkey — the same
    fact-to-fact equi-join every q-series analog plans."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.min("delay_days").cast("bigint").alias("min_days"),
            F.max("delay_days").cast("bigint").alias("max_days"),
            pround(
                F.sum(F.col("delay_days").cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_days"),
            F.count_if(F.col("delay_days") > 60).cast("bigint").alias("n_late"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Time series: linear gap interpolation and autocorrelation
# ---------------------------------------------------------------------------

INTERP_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,6))) * 100 + 0.5) AS BIGINT)
           AS cents
  FROM events GROUP BY day
), b AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
), d AS (
  SELECT day, cents,
         CAST(datediff('day', CAST(b.d0 AS DATE), CAST(day AS DATE)) AS BIGINT)
           AS idx,
         datediff('day', CAST(b.d0 AS DATE), CAST(day AS DATE)) % 9 = 3
           AND day <> b.d1 AS dropped
  FROM daily CROSS JOIN b
), w AS (
  SELECT day, cents, idx, dropped,
         LAST_VALUE(CASE WHEN NOT dropped THEN cents END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
         LAST_VALUE(CASE WHEN NOT dropped THEN idx END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ip,
         FIRST_VALUE(CASE WHEN NOT dropped THEN cents END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn,
         FIRST_VALUE(CASE WHEN NOT dropped THEN idx END IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxi
  FROM d
)
SELECT day, cents / 100.0 AS true_rev,
       FLOOR(((CAST(vp AS DOUBLE)
               + (CAST(vn AS DOUBLE) - CAST(vp AS DOUBLE))
                 * ((CAST(idx AS DOUBLE) - CAST(ip AS DOUBLE))
                    / (CAST(nxi AS DOUBLE) - CAST(ip AS DOUBLE)))) / 100.0)
             * 10000.0 + 0.5) / 10000.0 AS interp_rev,
       FLOOR(ABS((CAST(vp AS DOUBLE)
               + (CAST(vn AS DOUBLE) - CAST(vp AS DOUBLE))
                 * ((CAST(idx AS DOUBLE) - CAST(ip AS DOUBLE))
                    / (CAST(nxi AS DOUBLE) - CAST(ip AS DOUBLE)))) / 100.0
               - cents / 100.0)
             * 10000.0 + 0.5) / 10000.0 AS abs_err
FROM w WHERE dropped ORDER BY day
"""


@register(
    "timeseries_interpolate_linear",
    oracle=INTERP_ORACLE,
    tags=("timeseries", "window"),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR gap interpolation -- the resampling mode LOCF
    (timeseries_resample_locf) cannot express: daily revenue with a
    deterministic simulated sensor dropout (every 9th day index,
    endpoints exempt so both neighbors exist) reconstructed from its
    surviving neighbors, vp + (vn-vp)*(d-dp)/(dn-dp), and graded
    against the held-out truth (abs_err per dropped day -- the
    imputation-audit pattern of feature_impute_group_mean applied to
    time). Neighbor lookup is two ignore-nulls window fills over the
    calendar-sized daily series; interpolation arithmetic runs in
    identical double order from exact cent integers."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.floor(F.sum(F.col("value").cast("decimal(18,6)")) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents")
    )
    b = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    d = daily.crossJoin(F.broadcast(b)).select(
        "day",
        "cents",
        F.datediff(F.to_date("day"), F.to_date("d0")).cast("bigint").alias("idx"),
        (
            (F.datediff(F.to_date("day"), F.to_date("d0")) % 9 == 3)
            & (F.col("day") != F.col("d1"))
        ).alias("dropped"),
    )
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    wn = Window.orderBy("day").rowsBetween(1, Window.unboundedFollowing)
    keep = lambda c: F.when(~F.col("dropped"), F.col(c))  # noqa: E731
    w = d.select(
        "day",
        "cents",
        "idx",
        "dropped",
        F.last(keep("cents"), ignorenulls=True).over(wp).alias("vp"),
        F.last(keep("idx"), ignorenulls=True).over(wp).alias("ip"),
        F.first(keep("cents"), ignorenulls=True).over(wn).alias("vn"),
        F.first(keep("idx"), ignorenulls=True).over(wn).alias("nxi"),
    )
    interp = (
        F.col("vp").cast("double")
        + (F.col("vn").cast("double") - F.col("vp").cast("double"))
        * (
            (F.col("idx").cast("double") - F.col("ip").cast("double"))
            / (F.col("nxi").cast("double") - F.col("ip").cast("double"))
        )
    ) / 100.0
    true_rev = F.col("cents") / F.lit(100.0)
    return (
        w.where("dropped")
        .select(
            "day",
            true_rev.alias("true_rev"),
            pround(interp, 4).alias("interp_rev"),
            pround(F.abs(interp - true_rev), 4).alias("abs_err"),
        )
        .orderBy("day")
    )


ACF_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,6))) * 100 + 0.5) AS BIGINT) AS x
  FROM events GROUP BY day
), l AS (
  SELECT day, x,
         __LAG_COLS__
  FROM daily
), p AS (
  SELECT * FROM (
    SELECT NULL::INTEGER AS k, NULL::BIGINT AS x, NULL::BIGINT AS y WHERE FALSE
__LAG_UNIONS__
  )
), s AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM p GROUP BY k
)
SELECT k AS lag_days, n AS n_pairs,
       FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             * 1000000.0 + 0.5) / 1000000.0 AS acf
FROM s ORDER BY lag_days
""".replace("__LAG_COLS__", '''LAG(x, 1) OVER (ORDER BY day) AS l1,
         LAG(x, 2) OVER (ORDER BY day) AS l2,
         LAG(x, 3) OVER (ORDER BY day) AS l3,
         LAG(x, 4) OVER (ORDER BY day) AS l4,
         LAG(x, 5) OVER (ORDER BY day) AS l5,
         LAG(x, 6) OVER (ORDER BY day) AS l6,
         LAG(x, 7) OVER (ORDER BY day) AS l7''').replace("__LAG_UNIONS__", '''  UNION ALL SELECT 1 AS k, x, l1 AS y FROM l WHERE l1 IS NOT NULL
  UNION ALL SELECT 2 AS k, x, l2 AS y FROM l WHERE l2 IS NOT NULL
  UNION ALL SELECT 3 AS k, x, l3 AS y FROM l WHERE l3 IS NOT NULL
  UNION ALL SELECT 4 AS k, x, l4 AS y FROM l WHERE l4 IS NOT NULL
  UNION ALL SELECT 5 AS k, x, l5 AS y FROM l WHERE l5 IS NOT NULL
  UNION ALL SELECT 6 AS k, x, l6 AS y FROM l WHERE l6 IS NOT NULL
  UNION ALL SELECT 7 AS k, x, l7 AS y FROM l WHERE l7 IS NOT NULL''')


@register(
    "timeseries_autocorrelation", oracle=ACF_ORACLE, tags=("timeseries", "stats")
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1-7 -- the
    seasonality detector (a weekly cycle surfaces as an ACF spike at
    lag 7) feeding model-order choices. Per lag: Pearson between the
    series and its shifted self over the overlapping pairs, with the
    lagged pairs STACKED into one (lag, x, y) frame so a single
    hash-agg computes all seven correlations -- exact BIGINT sums
    over cent integers, identical-order double readout (the
    timeseries_rolling_corr discipline, pair-generated by 7 lag
    columns + stack instead of a frame)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.floor(F.sum(F.col("value").cast("decimal(18,6)")) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in range(1, 8)],
    )
    stack_expr = "stack(7, " + ", ".join(
        f"{k}, l{k}" for k in range(1, 8)
    ) + ") AS (k, y)"
    p = lagged.select("x", F.expr(stack_expr)).where(F.col("y").isNotNull())
    s = p.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        F.col("k").cast("int").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        pround(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("acf"),
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# Graph: degree assortativity; training: length-bucket padding waste
# ---------------------------------------------------------------------------

ASSORT_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), deg AS (
  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY src
), de AS (
  SELECT da.d AS x, db.d AS y
  FROM ed JOIN deg da ON da.id = ed.src JOIN deg db ON db.id = ed.dst
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM de
)
SELECT n AS n_directed_edges,
       FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             * 1000000.0 + 0.5) / 1000000.0 AS assortativity
FROM s
"""


@register(
    "graph_assortativity", oracle=ASSORT_ORACLE, tags=("graph", "dedup", "stats")
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the near-dup graph (Newman 2002):
    Pearson correlation between the endpoint degrees over all
    directed edges — positive means duplicate hubs connect to hubs
    (one big boilerplate blob), negative means hub-and-spoke template
    families; it changes how aggressively cluster-survivor dedup can
    prune. Degrees are integers, every sum an exact BIGINT over the
    edge list (both directions, the standard convention), readout in
    identical double order. One degree hash-agg + two broadcast-sized
    joins back onto the edge list.

    The LSH near-pair frame feeds both the edge list and the degree
    table; a lazy ``shared`` cache keeps the candidate generator from
    running once per consumer (was 24 effective FileScans — round-8
    scan audit). The degree table joins back twice, so it caches
    too."""
    from data_lake_with_spark_spark.operators.graph import (
        degrees,
        undirected_edges,
    )
    from data_lake_with_spark_spark.operators.plan_cache import shared

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = shared(SIM.lsh_near_pairs(emb, threshold=0.35))
    ed = undirected_edges(pairs)
    deg = shared(
        degrees(pairs).select("id", F.col("degree").cast("bigint").alias("d"))
    )
    de = (
        ed.join(deg.select(F.col("id").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    s = de.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        F.col("n").alias("n_directed_edges"),
        pround(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("assortativity"),
    )


LENGTH_BUCKETS_ORACLE = r"""
WITH t AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tok
  FROM documents
), b AS (
  SELECT doc_id, n_tok,
         CAST(POWER(2, CEIL(ln(CAST(GREATEST(n_tok, 1) AS DOUBLE)) / ln(2.0)))
              AS BIGINT) AS bucket
  FROM t
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(bucket - n_tok) AS BIGINT) AS padding_tokens,
       FLOOR((CAST(SUM(bucket - n_tok) AS DOUBLE)
              / (SUM(n_tok) + SUM(bucket - n_tok))) * 1000000.0 + 0.5)
         / 1000000.0 AS waste_ratio
FROM b GROUP BY bucket ORDER BY bucket
"""


@register(
    "training_length_buckets",
    oracle=LENGTH_BUCKETS_ORACLE,
    tags=("training", "llm", "text"),
)
def training_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length bucketing with padding-waste accounting —
    the batching diagnostic behind dynamic-shape training: each doc
    rounds up to the next 2^k token bucket, and the per-bucket waste
    ratio (padding / padded total) quantifies what naive bucketing
    burns vs sequence packing (training_pack_sequences is the cure;
    this measures the disease). Bucket = 2^ceil(log2 n) — the one
    transcendental is ln(integer)/ln 2 fed to CEIL, where a whole-ulp
    error would be needed to flip the integer result, so it is safe
    cross-engine (and the power-of-two result is exact). Map-side
    bucket math + one hash-agg."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("doc_id", TXT.token_count(F.col("text")).alias("n_tok"))
    bucket = F.expr(
        "CAST(POWER(2, CEIL(ln(CAST(GREATEST(n_tok, 1) AS DOUBLE)) / ln(2.0))) AS BIGINT)"
    )
    b = t.select("doc_id", "n_tok", bucket.alias("bucket"))
    pad = F.sum(F.col("bucket") - F.col("n_tok"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            pad.cast("bigint").alias("padding_tokens"),
            pround(
                pad.cast("double") / (F.sum("n_tok") + pad),
                6,
            ).alias("waste_ratio"),
        )
        .orderBy("bucket")
    )
