"""Vector similarity search over ``array<float>`` embeddings (E3).

Two strategies:

- **Brute force** (the correctness baseline): broadcast the query set,
  score every (query, candidate) pair with a double-precision JVM dot
  product, rank per query. Cost O(|Q|·n) — right whenever |Q| is small
  or n fits a partition sweep; at 100 TB the candidate scan is
  embarrassingly parallel and shuffle-free (ranking shuffles |Q|·n
  rows hash-partitioned by query).
- **LSH-bucketed** (the scale path): random-hyperplane signatures on
  both sides; candidates = equal bucket (multi-probe: hamming-1
  neighbors too), then exact scoring. Bucket id doubles as a physical
  partition key for a pre-bucketed table layout, turning ANN into a
  partition-pruned scan (SURVEY §4.2).

Plane matrices are generated driver-side from a fixed seed →
deterministic plans, no RNG inside executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.vector import cosine, dot, hyperplane_bucket


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank,
    score). Ties break on neighbor_id so the result is a total order.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    score = (
        cosine(F.col("q_vec"), F.col("c_vec"))
        if metric == "cosine"
        else dot(F.col("q_vec"), F.col("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(score, 6).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with 1-bit
    multi-probe. Same output shape as brute_force_topk; recall < 1 by
    construction (approximate — rows-only correctness check)."""
    planes = random_planes(n_planes, dim, seed)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("q_bucket"),
    )
    # multi-probe: query's own bucket plus all hamming-1 buckets
    probes = F.array(
        F.col("q_bucket"),
        *[F.col("q_bucket").bitwiseXOR(F.lit(2**i)) for i in range(n_planes)],
    )
    q = q_base.select(
        "query_id", "q_vec", F.explode(probes).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup, E2's
    vector flavor). O(n²) scoring — callers bound the input or use
    lsh_topk for the scale path."""
    a = embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
