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
from data_lake_with_spark_spark.plans.parity import davg_sql, pround, pround_sql
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
    # scan-audit waiver: 9 scans = multi-stage clustering — the
    # k-means init/assign/update stages each genuinely re-read the
    # embeddings table (Lloyd iterations are data passes by
    # definition), not a re-derived shared subtree.
    emb = load_table(spark, sf_dir, "embeddings")
    return CL.semdedup_survivors(emb, threshold=0.35).orderBy("vec_id")


KMEANS_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[], x -> FLOOR(x * 1e6)) AS sv
  FROM embeddings
), init AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         v AS c
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
), a1 AS (
  SELECT vec_id, cluster, sv FROM (
    SELECT e.vec_id, i.cluster, e.sv,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY FLOOR((list_dot_product(e.v, e.v)
                             - 2 * list_dot_product(e.v, i.c)
                             + list_dot_product(i.c, i.c)) * 1e6 + 0.5) / 1e6 ASC,
                      i.cluster ASC) AS rn
    FROM e CROSS JOIN init i
  ) WHERE rn = 1
), sums AS (
  SELECT cluster, pos, SUM(CAST(x AS BIGINT)) AS s
  FROM (SELECT cluster, UNNEST(range(len(sv))) AS pos, UNNEST(sv) AS x FROM a1)
  GROUP BY cluster, pos
), cnt AS (
  SELECT cluster, COUNT(*) AS n FROM a1 GROUP BY cluster
), c1 AS (
  SELECT s.cluster, list(s.s / (c.n * 1e6) ORDER BY s.pos) AS c
  FROM sums s JOIN cnt c USING (cluster)
  GROUP BY s.cluster, c.n
), a2 AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT e.vec_id, i.cluster,
           FLOOR((list_dot_product(e.v, e.v)
                  - 2 * list_dot_product(e.v, i.c)
                  + list_dot_product(i.c, i.c)) * 1e6 + 0.5) / 1e6 AS d2,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY FLOOR((list_dot_product(e.v, e.v)
                             - 2 * list_dot_product(e.v, i.c)
                             + list_dot_product(i.c, i.c)) * 1e6 + 0.5) / 1e6 ASC,
                      i.cluster ASC) AS rn
    FROM e CROSS JOIN c1 i
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, d2
FROM a2 ORDER BY vec_id
"""


@register(
    "vector_kmeans_lloyd",
    oracle=KMEANS_ORACLE,
    tags=("vector", "llm", "cluster", "iterative"),
)
def vector_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=4, two assignment passes, one
    centroid update) with engine-portable arithmetic — scaled-integer
    centroid sums make the update order-independent, portable-rounded
    d² makes the argmin total, so a genuinely ITERATIVE distributed
    algorithm hash-matches a SQL oracle (the oracle unrolls the two
    passes). See operators/clustering.py:kmeans_lloyd for the
    k-row-broadcast / driver-side-update scale shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    return CL.kmeans_lloyd(emb, k=4, n_iter=2).orderBy("vec_id")


SILHOUETTE_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[], x -> FLOOR(x * 1e6)) AS sv
  FROM embeddings
), init AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         v AS c
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
), a1 AS (
  SELECT vec_id, cluster, sv FROM (
    SELECT e.vec_id, i.cluster, e.sv,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY FLOOR((list_dot_product(e.v, e.v)
                             - 2 * list_dot_product(e.v, i.c)
                             + list_dot_product(i.c, i.c)) * 1e6 + 0.5) / 1e6 ASC,
                      i.cluster ASC) AS rn
    FROM e CROSS JOIN init i
  ) WHERE rn = 1
), sums AS (
  SELECT cluster, pos, SUM(CAST(x AS BIGINT)) AS s
  FROM (SELECT cluster, UNNEST(range(len(sv))) AS pos, UNNEST(sv) AS x FROM a1)
  GROUP BY cluster, pos
), cnt AS (
  SELECT cluster, COUNT(*) AS n FROM a1 GROUP BY cluster
), c1 AS (
  SELECT s.cluster, list(s.s / (c.n * 1e6) ORDER BY s.pos) AS c
  FROM sums s JOIN cnt c USING (cluster)
  GROUP BY s.cluster, c.n
), al AS (
  SELECT e.vec_id, i.cluster,
         FLOOR((list_dot_product(e.v, e.v)
                - 2 * list_dot_product(e.v, i.c)
                + list_dot_product(i.c, i.c)) * 1e6 + 0.5) / 1e6 AS d2r
  FROM e CROSS JOIN c1 i
), own AS (
  SELECT vec_id, cluster AS own, d2r AS d2_own FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d2r ASC, cluster ASC) AS rn
    FROM al
  ) WHERE rn = 1
), oth AS (
  SELECT a.vec_id, o.own, o.d2_own, MIN(a.d2r) AS d2_other
  FROM al a JOIN own o ON a.vec_id = o.vec_id AND a.cluster != o.own
  GROUP BY 1, 2, 3
), sil AS (
  SELECT own AS cluster,
         FLOOR((sqrt(d2_other) - sqrt(d2_own))
               / GREATEST(sqrt(d2_own), sqrt(d2_other)) * 1e6 + 0.5) / 1e6 AS s
  FROM oth
)
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
       {mean_s} AS mean_silhouette
FROM sil GROUP BY cluster ORDER BY cluster
""".format(mean_s=davg_sql("s", 6))


@register(
    "vector_kmeans_silhouette",
    oracle=SILHOUETTE_ORACLE,
    tags=("vector", "llm", "cluster", "stats"),
)
def vector_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette evaluation of the Lloyd's fit
    (vector_kmeans_lloyd, same k=4 / 2-pass config): per cluster, the
    mean of (b−a)/max(a,b) with a = distance to own centroid, b =
    distance to nearest other centroid. The evaluation metric — not
    just the fit — is engine-exact: rounded d² under the sqrt,
    rounded per-point s, decimal-exact mean. One extra k-row
    broadcast compare over the scan. operators/clustering.py:
    kmeans_silhouette."""
    emb = load_table(spark, sf_dir, "embeddings")
    return CL.kmeans_silhouette(emb, k=4, n_iter=2).orderBy("cluster")
