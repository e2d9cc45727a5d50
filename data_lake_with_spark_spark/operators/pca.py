"""Distributed PCA over an embedding column — the dimension-reduction
stage a training/ANN pipeline runs before indexing (shorter vectors →
cheaper distance math, denser LSH/IVF buckets; OPQ-style rotations
start from exactly this decomposition).

Spark split of the work at 100 TB:
- the d×d scatter matrix is ONE distributed aggregation: each row
  contributes its d² outer-product terms via two posexplodes, and
  partial map-side combine reduces the shuffle to (#partitions · d²)
  rows. For d=64 that is 4096 cells — trivially collectable however
  large n grows (the data-dependent part never leaves the executors
  un-aggregated).
- the eigendecomposition is a d×d driver-side numpy call (microseconds;
  this is the textbook "small dense algebra on the driver, big sums on
  the cluster" split — same shape as kmeans_centroids / pq_train).
- projection is a broadcast-literal dot product per component, pure
  JVM HOF math, no Python in the row path.

Sign convention: each eigenvector is flipped so its
largest-absolute-value coordinate is positive — removes the inherent
sign ambiguity, making projections reproducible across runs/libraries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scatter_matrix(embeddings: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(S, mean, n): S[i][j] = Σ x_i·x_j over all vectors (raw second
    moment, d×d), the per-dimension mean, and the row count — one
    distributed agg + one bounded d²-cell collect."""
    cells = (
        embeddings.select(F.posexplode(vec_col).alias("i", "xi"), F.col(vec_col).alias("_v"))
        .select("i", "xi", F.posexplode("_v").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi").cast("double") * F.col("xj").cast("double")).alias("s"))
    )
    sums = (
        embeddings.select(F.posexplode(vec_col).alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(F.col("xi").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    d = len(sums)
    n = int(sums[0]["n"])
    mean = np.zeros(d)
    for r in sums:
        mean[r["i"]] = r["s"] / n
    S = np.zeros((d, d))
    for r in cells.collect():
        S[r["i"], r["j"]] = r["s"]
    return S, mean, n


def pca_components(embeddings: DataFrame, k: int, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal components of the embedding column:
    (components [k×d], explained_variance [k], mean [d]). Covariance
    from the scatter matrix: C = S/(n−1) − n/(n−1)·mean·meanᵀ
    (sample convention)."""
    S, mean, n = scatter_matrix(embeddings, vec_col)
    cov = S / (n - 1) - np.outer(mean, mean) * (n / (n - 1))
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k×d
    # deterministic sign: largest-|coordinate| positive
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, vals[order], mean


def _dot_literal(vec_col: str, weights: np.ndarray, mean: np.ndarray) -> Column:
    """Σ (x_i − mean_i)·w_i as a JVM HOF over the array column with the
    weights/mean baked in as literals (no Python in the row path)."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    m = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), m, lambda x, mu: x - mu)
    return F.aggregate(
        F.zip_with(centered, w, lambda x, wi: x * wi),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    embeddings: DataFrame, k: int, vec_col: str = "embedding", out_col: str = "pc"
) -> DataFrame:
    """embeddings + ``out_col`` = array of the k principal-component
    scores per row (centered projection). Components are fit on the
    input itself; pass precomputed ones via ``project_onto`` to apply
    a frozen basis (train-fit, full-corpus-apply)."""
    comps, _, mean = pca_components(embeddings, k, vec_col)
    return project_onto(embeddings, comps, mean, vec_col, out_col)


def project_onto(
    embeddings: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Apply a fixed PCA basis: one literal-weight dot product per
    component, all JVM-side."""
    return embeddings.withColumn(
        out_col,
        F.array(*[_dot_literal(vec_col, c, mean) for c in components]),
    )
