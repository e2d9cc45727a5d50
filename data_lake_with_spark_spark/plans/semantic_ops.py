"""Semantic-clustering queries over the embeddings table (E2/E3
extension): nearest-centroid assignment and SemDeDup within-cluster
near-dedup.

Both queries are fully oracled. Exactness rests on the contract
documented in operators/clustering.py: scaled-integer components,
unnormalized sum-vector centroids (cosine is scale-invariant), and
sequential pos-ordered dot products that are bit-identical between
Spark's aggregate() and DuckDB's list_dot_product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators import clustering as CL
from data_lake_with_spark_spark.plans.parity import pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


CENTROID_ASSIGN_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         UNNEST(range(len(embedding))) AS pos,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS sv
  FROM embeddings
), cent AS (
  SELECT label AS clabel, list(CAST(s AS DOUBLE) ORDER BY pos) AS cv
  FROM (SELECT label, pos, SUM(sv) AS s FROM ex GROUP BY label, pos)
  GROUP BY clabel
), vecs AS (
  SELECT vec_id, label, list(CAST(sv AS DOUBLE) ORDER BY pos) AS v
  FROM ex GROUP BY vec_id, label
), scored AS (
  SELECT vec_id, label, clabel,
         list_dot_product(v, cv)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cos
  FROM vecs, cent
), best AS (
  SELECT vec_id, label, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, clabel ASC) AS rn
  FROM scored
)
SELECT label, clabel AS assigned, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM best WHERE rn = 1
GROUP BY label, assigned
ORDER BY label, assigned
"""


@register("vector_centroid_assign", oracle=CENTROID_ASSIGN_ORACLE, tags=("vector", "llm", "cluster"))
def vector_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment confusion matrix: build per-label
    sum-vector centroids, assign every vector to its max-cosine
    centroid (ties → smaller label), count (true label, assigned)
    cells. The centroid table is k rows → broadcast nested-loop
    scoring, no data-sized shuffle beyond the posexplode aggregation
    that builds the centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = CL.label_centroids(emb)
    assigned = CL.assign_nearest_centroid(emb, centroids, keep_cols=("label",))
    return (
        assigned.groupBy("label", "assigned")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("label", "assigned")
    )


SEMDEDUP_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         UNNEST(range(len(embedding))) AS pos,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS sv
  FROM embeddings
), cent AS (
  SELECT label AS clabel, list(CAST(s AS DOUBLE) ORDER BY pos) AS cv
  FROM (SELECT label, pos, SUM(sv) AS s FROM ex GROUP BY label, pos)
  GROUP BY clabel
), vecs AS (
  SELECT vec_id, list(CAST(sv AS DOUBLE) ORDER BY pos) AS v
  FROM ex GROUP BY vec_id
), best AS (
  SELECT vec_id, v, clabel AS assigned,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v))
                         * sqrt(list_dot_product(cv, cv))) DESC,
                    clabel ASC) AS rn
  FROM vecs, cent
), members AS (
  SELECT vec_id, v, assigned FROM best WHERE rn = 1
), dupes AS (
  SELECT DISTINCT b.vec_id
  FROM members a JOIN members b
    ON a.assigned = b.assigned AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.35
)
SELECT m.vec_id, m.assigned
FROM members m
WHERE m.vec_id NOT IN (SELECT vec_id FROM dupes)
ORDER BY m.vec_id
"""


@register("semdedup_within_cluster", oracle=SEMDEDUP_ORACLE, tags=("dedup", "vector", "llm", "cluster"))
def semdedup_within_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup that only compares
    vectors INSIDE their assigned centroid cluster — the global O(n²)
    pair problem becomes Σ(cluster²) keyed on the cluster id, which is
    exactly the shuffle key, so clusters dedup in parallel. Keep-first
    greedy: a vector is dropped iff a smaller-id member of the same
    cluster sits at cosine ≥ 0.35."""
    emb = load_table(spark, sf_dir, "embeddings")
    return CL.semdedup_survivors(emb, threshold=0.35).orderBy("vec_id")
