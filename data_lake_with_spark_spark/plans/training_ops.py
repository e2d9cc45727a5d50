"""Training-data shaping queries (the pipeline steps after cleaning:
split, pack) — SURVEY §2.10 extension family, same contract as the
other EXT operators: Spark implementation + DuckDB oracle.

Both are fully deterministic (content-addressed md5 split, integer
prefix-sum packing), so they oracle exactly — no rows-only fallback
needed despite being "ML pipeline" ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import sampling as SMP
from data_lake_with_spark_spark.operators import training as TR
from data_lake_with_spark_spark.plans.parity import pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


SPLIT_ORACLE = r"""
SELECT
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'e6'
       THEN 'test' ELSE 'train' END AS split,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


@register("training_split_counts", oracle=SPLIT_ORACLE, tags=("training", "llm"))
def training_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/test split (10% test by
    md5-prefix bucket) with per-split token accounting. The split is a
    row-local expression — zero shuffles beyond the final aggregate —
    and stable under corpus growth/repartitioning, which is the
    property that prevents train/test leakage across pipeline runs."""
    docs = TR.train_test_split(_t(spark, sf_dir, "documents"), "doc_id", 0.1)
    return (
        docs.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TXT.token_count("text").cast("long")).alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


# Target corpus mix for the resampling query. Normalized here exactly
# as operators/sampling.mixture_resample normalizes internally (same
# insertion order, same float ops) so the oracle can embed the
# identical double literals.
MIX_WEIGHTS = {"de": 0.15, "en": 0.4, "es": 0.15, "fr": 0.15, "zh": 0.15}
_MIX_TOTAL = sum(MIX_WEIGHTS.values())
_MIX_NORM = {k: v / _MIX_TOTAL for k, v in MIX_WEIGHTS.items()}

MIXTURE_ORACLE = f"""
WITH wt(lang, w) AS (
  VALUES {", ".join(f"('{k}', CAST({v!r} AS DOUBLE))" for k, v in _MIX_NORM.items())}
), counts AS (
  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
), cw AS (
  SELECT c.lang, c.cnt, wt.w FROM counts c JOIN wt USING (lang)
), binding AS (
  SELECT MIN(CAST(cnt AS DOUBLE) / w) AS ratio FROM cw
), bounds AS (
  SELECT lang, cnt,
         CASE WHEN FLOOR(256.0 * ratio * w / CAST(cnt AS DOUBLE) + 0.5) >= 256
              THEN 'zz'
              ELSE printf('%02x',
                   CAST(FLOOR(256.0 * ratio * w / CAST(cnt AS DOUBLE) + 0.5)
                        AS INTEGER)) END AS keep_below
  FROM cw, binding
), keptc AS (
  SELECT d.lang, COUNT(*) AS n_after
  FROM documents d JOIN bounds b USING (lang)
  WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < b.keep_below
  GROUP BY d.lang
)
SELECT b.lang,
       b.cnt AS n_before,
       COALESCE(k.n_after, 0) AS n_after,
       {pround_sql(
           'CAST(COALESCE(k.n_after, 0) AS DOUBLE)'
           ' / CAST(SUM(COALESCE(k.n_after, 0)) OVER () AS DOUBLE)',
           6,
       )} AS share_after
FROM bounds b LEFT JOIN keptc k USING (lang)
ORDER BY b.lang
"""


@register("sample_domain_mixture", oracle=MIXTURE_ORACLE, tags=("training", "llm", "sampling"))
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the corpus to a target language mix (40% en, 15% each
    of de/es/fr/zh) — the domain-reweighting step of a training-data
    pipeline. The kept set is content-addressed (md5 buckets), so the
    mix is reproducible across engines and partitionings; the binding
    domain is kept whole and the rest are thinned to match. Reports
    per-language before/after counts and the achieved share. One
    data-sized scan + a broadcast of the 5-row boundary table; the
    achieved share tracks the target up to the 1/256 bucket grid and
    per-bucket population noise."""
    docs = _t(spark, sf_dir, "documents")
    kept = SMP.mixture_resample(docs, MIX_WEIGHTS, "lang", "doc_id")
    keptc = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after"))
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    joined = (
        before.join(keptc, "lang", "left")
        .withColumn("n_after", F.coalesce("n_after", F.lit(0)))
    )
    total_after = F.sum("n_after").over(W.partitionBy())
    return (
        joined.select(
            "lang",
            "n_before",
            "n_after",
            pround(
                F.col("n_after").cast("double") / total_after.cast("double"), 6
            ).alias("share_after"),
        )
        .orderBy("lang")
    )


PACK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), packed AS (
  SELECT lang, doc_id, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
           AS INTEGER) AS pack_id
  FROM toks
)
SELECT lang, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc
FROM packed
GROUP BY lang, pack_id
ORDER BY lang, pack_id
"""


@register("training_pack_sequences", oracle=PACK_ORACLE, tags=("training", "llm", "window"))
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing: documents packed into 2048-token
    training sequences per language shard via one windowed prefix sum
    (no driver loop, no state) — per-pack size/occupancy stats. At
    scale the shard key parallelizes packing; integer arithmetic makes
    the assignment bit-identical on any engine."""
    docs = _t(spark, sf_dir, "documents")
    packed = TR.pack_sequences(
        docs,
        TXT.token_count("text").cast("long"),
        budget=2048,
        shard_col="lang",
        order_col="doc_id",
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "pack_id")
    )


GLOBAL_SHUFFLE_ORACLE = r"""
WITH keyed AS (
  SELECT doc_id,
         md5('shuf42#' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
), sharded AS (
  SELECT doc_id, shuffle_key,
         CAST(('0x' || substr(shuffle_key, 1, 2))::BIGINT % 8 AS INT) AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) - 1
            AS BIGINT) AS pos_in_shard
FROM sharded
ORDER BY doc_id
"""


@register(
    "training_global_shuffle",
    oracle=GLOBAL_SHUFFLE_ORACLE,
    tags=("training", "llm", "sampling"),
)
def training_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training readers: each document
    gets a content-addressed pseudo-random shard and position — change
    the seed string and the whole corpus reshuffles reproducibly, on
    any engine, with no RNG state. Scale shape: shard assignment is a
    map-only md5 bucket; ordering is a row_number per SHARD partition
    (never a global single-partition window), so 8 shards → 8
    independent sorts that scale out. Shard-local order is exactly
    what a multi-worker training reader consumes (one worker per
    shard)."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf42#"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    sharded = keyed.withColumn(
        "shard",
        (F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("long") % 8).cast("int"),
    )
    w = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        sharded.select(
            "doc_id",
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("pos_in_shard"),
        )
        .orderBy("doc_id")
    )


MLM_MASK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), m AS (
  SELECT doc_id,
         list_transform(
           list_zip(t, range(len(t))),
           p -> CASE WHEN CAST('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR) || ':'
                            || CAST(p[2] AS VARCHAR)), 1, 8) AS BIGINT)
                      < 644245094
                THEN '[MASK]' ELSE p[1] END
         ) AS masked
  FROM toks
)
SELECT doc_id,
       array_to_string(masked, ' ') AS masked_text,
       CAST(len(list_filter(masked, x -> x = '[MASK]')) AS BIGINT)
         AS n_masked,
       CAST(len(masked) AS BIGINT) AS n_tokens
FROM m ORDER BY doc_id
"""


@register(
    "training_mlm_mask",
    oracle=MLM_MASK_ORACLE,
    tags=("training", "llm", "text"),
)
def training_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLM corruption (the BERT-style 15% token masking stage of a
    training-data pipeline), content-addressed: a token masks iff its
    md5(doc:pos) 32-bit hash falls under floor(0.15·2³²) — an INTEGER
    threshold, so the mask pattern is bit-reproducible on any engine,
    any partitioning, any epoch re-run, yet statistically uniform.
    Pure per-row HOFs over the projected token array; zero shuffles
    before the presentation sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    )
    h = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), i.cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    masked = F.transform(
        F.col("t"),
        lambda x, i: F.when(h(i) < F.lit(644245094), F.lit("[MASK]")).otherwise(x),
    )
    m = toks.select("doc_id", masked.alias("masked"))
    return m.select(
        "doc_id",
        F.array_join("masked", " ").alias("masked_text"),
        F.size(F.filter("masked", lambda x: x == "[MASK]"))
        .cast("bigint")
        .alias("n_masked"),
        F.size("masked").cast("bigint").alias("n_tokens"),
    ).orderBy("doc_id")


QUALITY_MIXTURE_ORACLE = r"""
WITH q AS (
  SELECT doc_id,
         (LEAST(length(text) / 400.0, 1.0)
          + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
          + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                         / length(text) * 4, 1.0))) / 3.0 AS score
  FROM documents
), banded AS (
  SELECT doc_id,
         CASE WHEN score >= 0.75 THEN 'high'
              WHEN score >= 0.5  THEN 'mid'
              ELSE 'low' END AS band,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8)
              AS BIGINT) % 4 AS shard
  FROM q
)
SELECT CAST(shard AS BIGINT) AS shard, band,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM banded GROUP BY shard, band
ORDER BY shard, band
"""


@register(
    "training_quality_mixture",
    oracle=QUALITY_MIXTURE_ORACLE,
    tags=("training", "llm", "quality", "sampling"),
)
def training_quality_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-banded shard mixture audit: docs band into
    high/mid/low by FIXED score cutoffs (fixed thresholds, not
    quantiles — a doc's band never depends on the rest of the corpus,
    so bands are stable under corpus growth and shard-local
    recomputation) and shard by the content-addressed md5 family;
    per-(shard, band) counts verify every shard sees the same quality
    mix — the invariant a curriculum or mixture-weighted training run
    asserts before burning GPU hours. One scan, one hash-agg."""
    from data_lake_with_spark_spark.plans.llm_ops import _quality_raw

    docs = _t(spark, sf_dir, "documents")
    score = _quality_raw("text")
    band = (
        F.when(score >= 0.75, F.lit("high"))
        .when(score >= 0.5, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    shard = F.expr(
        "pmod(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), 'mix1')),"
        " 1, 8), 16, 10) AS BIGINT), 4)"
    )
    return (
        docs.select(shard.cast("bigint").alias("shard"), band.alias("band"))
        .groupBy("shard", "band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("shard", "band")
    )


AUC_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM s GROUP BY score
), r AS (
  SELECT p,
         cnt,
         CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
  FROM g
)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(cnt) - SUM(p) AS BIGINT) AS n_neg,
       FLOOR(((CAST(SUM(p * (2 * cumb + cnt + 1)) AS BIGINT) - SUM(p) * (SUM(p) + 1))
              / (2 * SUM(p) * (SUM(cnt) - SUM(p)))) * 1000000.0 + 0.5) / 1000000.0
         AS auc
FROM r
"""


@register("ml_auc_rank_sum", oracle=AUC_ORACLE, tags=("training", "stats", "llm"))
def ml_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank-sum identity — the
    model-eval readout every training pipeline ends with, computed
    without materializing the ROC curve: AUC = (R⁺ − n⁺(n⁺+1)/2) /
    (n⁺·n⁻) with AVERAGE ranks over score ties (the scikit-learn
    semantics), all in scaled integers — doubled average ranks
    (2·cum_before + cnt + 1) keep ties exact, one float division at
    the end. Plan: one hash-agg collapses rows to distinct scores
    (the 100 TB move — ranks come from the distinct-score spine, not
    a global per-row sort), one ordered window over that spine, one
    1-row readout. Scores here: first embedding component predicting
    label<5 — the engine contract is the rank math, not the toy
    scores."""
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
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    r = g.select(
        "p",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("cumb"),
    )
    np_ = F.sum("p").cast("bigint")
    nn = (F.sum("cnt") - F.sum("p")).cast("bigint")
    r2 = F.sum(F.col("p") * (2 * F.col("cumb") + F.col("cnt") + 1)).cast("bigint")
    return r.agg(
        np_.alias("n_pos"),
        nn.alias("n_neg"),
        pround(
            (r2 - F.sum("p") * (F.sum("p") + 1))
            / (2 * F.sum("p") * (F.sum("cnt") - F.sum("p"))),
            6,
        ).alias("auc"),
    )


THRESHOLD_ORACLE = """
WITH s AS (
  SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
), t AS (
  SELECT * FROM (VALUES (-200000), (-100000), (0), (100000), (200000)) AS v(thr)
), m AS (
  SELECT thr,
         CAST(COUNT_IF(score >= thr AND pos = 1) AS BIGINT) AS tp,
         CAST(COUNT_IF(score >= thr AND pos = 0) AS BIGINT) AS fp,
         CAST(COUNT_IF(score < thr AND pos = 1) AS BIGINT) AS fn,
         CAST(COUNT_IF(score < thr AND pos = 0) AS BIGINT) AS tn
  FROM s, t GROUP BY thr
)
SELECT thr, tp, fp, fn, tn,
       FLOOR((tp / (tp + fp)) * 1000000.0 + 0.5) / 1000000.0 AS precision,
       FLOOR((tp / (tp + fn)) * 1000000.0 + 0.5) / 1000000.0 AS recall
FROM m ORDER BY thr
"""


@register(
    "ml_threshold_metrics", oracle=THRESHOLD_ORACLE, tags=("training", "stats", "llm")
)
def ml_threshold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix sweep over 5 decision thresholds —
    precision/recall operating points from ONE scan: each row fans out
    to the 5-row literal threshold frame (map-side ×5, no data
    shuffle grows with thresholds), one hash-agg per threshold builds
    tp/fp/fn/tn in integers, ratios divide once at readout. The
    companion of ml_auc_rank_sum (threshold-free ranking quality vs
    thresholded operating points)."""
    emb = _t(spark, sf_dir, "embeddings")
    s = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 1e6)
        .cast("long")
        .alias("score"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("pos"),
    )
    thr = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in (-200000, -100000, 0, 100000, 200000)])
        ).alias("thr")
    )
    hit = F.col("score") >= F.col("thr")
    is_p = F.col("pos") == 1
    m = (
        s.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.count_if(hit & is_p).cast("bigint").alias("tp"),
            F.count_if(hit & ~is_p).cast("bigint").alias("fp"),
            F.count_if(~hit & is_p).cast("bigint").alias("fn"),
            F.count_if(~hit & ~is_p).cast("bigint").alias("tn"),
        )
    )
    return m.select(
        "thr",
        "tp",
        "fp",
        "fn",
        "tn",
        pround(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        pround(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("recall"),
    ).orderBy("thr")
