"""Training-data shaping queries (the pipeline steps after cleaning:
split, pack) — SURVEY §2.10 extension family, same contract as the
other EXT operators: Spark implementation + DuckDB oracle.

Both are fully deterministic (content-addressed md5 split, integer
prefix-sum packing), so they oracle exactly — no rows-only fallback
needed despite being "ML pipeline" ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import training as TR
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
