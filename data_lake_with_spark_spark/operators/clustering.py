"""Semantic clustering over embedding columns (E2/E3 extension).

Nearest-centroid assignment and SemDeDup-style within-cluster
near-dedup — the pattern behind semantic dedup of training corpora
(Abbas et al., "SemDeDup", 2023): cluster the embedding space first,
then do pairwise similarity ONLY within a cluster. That turns the
global O(n²) pair problem into Σ(cluster_size²) with an embarrassingly
parallel per-cluster stage — the shuffle key IS the cluster id, so a
1000-executor cluster processes clusters independently.

Engine-portability design (everything here is oracle-checkable):

- Components are scaled to exact integers: sv = floor(v·1e6). Integer
  sums are order-independent, so centroid construction (a groupBy SUM)
  is deterministic on any engine and any partitioning.
- Centroids are UNNORMALIZED per-dimension sums. Cosine is
  scale-invariant — cos(v, mean) == cos(v, sum) — so dividing by the
  member count (which would leave exact-integer space) is never
  needed.
- Dot products run sequentially over pos-ordered arrays (zip_with +
  aggregate here, list_dot_product in DuckDB). Identical operation
  sequences produce bit-identical doubles even when a product exceeds
  2^53, so argmax assignments and threshold cuts agree exactly.

Reference scope note: the reference ETL (etl.py) has no vector ops at
all; this module is part of the EXT training-data surface mandated by
SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions import vector as VEC

SCALE = 1e6


def _scaled(vec_col: Column | str) -> Column:
    """array<double> of exact integer-valued components floor(v·1e6)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(SCALE)).cast("double")
    )


def scaled_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, sv) with sv the scaled exact-integer component array."""
    return emb.select(F.col(id_col), _scaled(vec_col).alias("sv"))


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label unnormalized centroid: the per-dimension SUM of scaled
    components, rebuilt into a pos-ordered array.

    Plan: posexplode → (label, pos) bigint sums (map-side combined; the
    shuffle carries k·dim rows regardless of corpus size) → ordered
    collect bounded by dim. Returns (centroid_label, centroid)."""
    ex = emb.select(
        F.col(label_col).alias("centroid_label"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).withColumn(
        "s", F.floor(F.col("v").cast("double") * F.lit(SCALE)).cast("long")
    )
    per_dim = ex.groupBy("centroid_label", "pos").agg(F.sum("s").alias("s"))
    return per_dim.groupBy("centroid_label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "s"))),
            lambda x: x["s"].cast("double"),
        ).alias("centroid")
    )


def assign_nearest_centroid(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each vector to its max-cosine centroid.

    The centroid table is k rows → broadcast; scoring is a map-side
    nested-loop over k with JVM array math (no shuffle for the scan),
    and the only exchange is the per-vector argmax window, which AQE
    coalesces. Ties break toward the smaller centroid_label so the
    choice is total. Returns (id, *keep_cols, assigned, cos_sim)."""
    vecs = emb.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], _scaled(vec_col).alias("sv")
    )
    scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "cos_sim",
        VEC.dot(F.col("sv"), F.col("centroid"))
        / (VEC.norm(F.col("sv")) * VEC.norm(F.col("centroid"))),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cos_sim"), F.asc("centroid_label")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.col("centroid_label").alias("assigned"),
            "cos_sim",
        )
    )


def semdedup_survivors(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """SemDeDup: drop every vector with a smaller-id neighbor at
    cosine ≥ threshold INSIDE its assigned cluster; keep the rest.

    The pair join is keyed on the assigned cluster, so candidate
    generation shuffles each vector once and the quadratic stage is
    per-cluster (Σ nc² work, parallel across clusters) — never a global
    cross join. Returns surviving (id, assigned) rows."""
    centroids = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    assigned = assign_nearest_centroid(emb, centroids, id_col=id_col, vec_col=vec_col)
    vecs = scaled_vectors(emb, id_col=id_col, vec_col=vec_col).join(
        assigned.select(id_col, "assigned"), id_col
    )
    a = vecs.select(
        F.col("assigned"),
        F.col(id_col).alias("a_id"),
        F.col("sv").alias("a_sv"),
    )
    b = vecs.select(
        F.col("assigned"),
        F.col(id_col).alias("b_id"),
        F.col("sv").alias("b_sv"),
    )
    dupes = (
        a.join(b, "assigned")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            VEC.dot(F.col("a_sv"), F.col("b_sv"))
            / (VEC.norm(F.col("a_sv")) * VEC.norm(F.col("b_sv")))
            >= F.lit(threshold)
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return vecs.join(dupes, id_col, "left_anti").select(id_col, "assigned")


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means with fully deterministic,
    engine-portable arithmetic: ``n_iter`` assignment passes with a
    centroid update between passes.

    - **Init**: the first ``k`` vectors by id (deterministic; k-means||
      is the quality init at scale — swap the seed list, nothing else
      changes).
    - **Assignment**: squared L2 to each of the k broadcast centroids
      (d² = v·v − 2·v·c + c·c, sequential double folds), portable-
      rounded to 1e−6, argmin with cluster-id tie-break — a k-row
      broadcast join, no shuffle of the vectors.
    - **Update**: per-dimension sums of the floor(v·1e6) scaled-integer
      components — exact BIGINT accumulation, order-independent across
      partitions — collected as k×dim driver-side rows (tiny, the PCA
      scatter pattern), new component = s/(n·1e6) computed once on the
      driver. An emptied cluster keeps its previous centroid.

    Every iteration launches from the base vectors plus literal
    centroids, so lineage stays flat without checkpoints and the
    per-iteration cost is one scan + one k-way broadcast compare +
    one hash agg. Returns (id_col, cluster, d2) for the final pass.
    """
    if int(n_iter) < 1:
        raise ValueError("n_iter must be >= 1")
    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        _scaled(vec_col).alias("sv"),
    )
    seed = base.orderBy("id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r["v"]]) for i, r in enumerate(seed)
    ]
    assigned = None
    for it in range(int(n_iter)):
        cdf = spark.createDataFrame(cents, "cluster int, c array<double>")
        d2 = (
            VEC.dot(F.col("v"), F.col("v"))
            - F.lit(2.0) * VEC.dot(F.col("v"), F.col("c"))
            + VEC.dot(F.col("c"), F.col("c"))
        )
        scored = base.crossJoin(F.broadcast(cdf)).withColumn(
            "d2r", F.floor(d2 * 1e6 + F.lit(0.5)) / 1e6
        )
        w = Window.partitionBy("id").orderBy(F.asc("d2r"), F.asc("cluster"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", "cluster", "d2r", "sv")
        )
        if it < int(n_iter) - 1:
            sums = (
                assigned.select(
                    "cluster", F.posexplode("sv").alias("pos", "x")
                )
                .groupBy("cluster", "pos")
                .agg(F.sum(F.col("x").cast("long")).alias("s"))
                .collect()
            )
            counts = {
                r["cluster"]: r["n"]
                for r in assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            by_cluster: dict[int, dict[int, int]] = {}
            for r in sums:
                by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"]
            new_cents = []
            for cid, old in cents:
                if cid in by_cluster and counts.get(cid, 0) > 0:
                    comp = by_cluster[cid]
                    n = counts[cid]
                    new_cents.append(
                        (cid, [comp[p] / (n * SCALE) for p in range(len(old))])
                    )
                else:
                    new_cents.append((cid, old))
            cents = new_cents
    return assigned.select(
        F.col("id").alias(id_col), "cluster", F.col("d2r").alias("d2")
    )


def kmeans_silhouette(
    vectors: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid-based (simplified) silhouette for the kmeans_lloyd
    clustering: per point, a = distance to its OWN centroid, b =
    distance to the nearest OTHER centroid, s = (b−a)/max(a,b); the
    per-cluster mean s scores cluster separation (→1 tight/isolated,
    →0 boundary). Same arithmetic discipline as the fit: d² is
    portable-rounded before sqrt, per-point s is portable-rounded
    before the decimal-exact mean, so the evaluation metric — not just
    the fit — is engine-exact. Cost: one extra k-row broadcast compare
    over the scan; no new shuffle beyond the per-cluster agg."""
    from data_lake_with_spark_spark.plans.parity import davg

    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        _scaled(vec_col).alias("sv"),
    )
    seed = base.orderBy("id").limit(k).collect()
    cents = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seed)]
    # replay the fit to its final centroids (same code path as
    # kmeans_lloyd, n_iter-1 updates)
    for it in range(int(n_iter) - 1):
        cdf = spark.createDataFrame(cents, "cluster int, c array<double>")
        d2 = (
            VEC.dot(F.col("v"), F.col("v"))
            - F.lit(2.0) * VEC.dot(F.col("v"), F.col("c"))
            + VEC.dot(F.col("c"), F.col("c"))
        )
        scored = base.crossJoin(F.broadcast(cdf)).withColumn(
            "d2r", F.floor(d2 * 1e6 + F.lit(0.5)) / 1e6
        )
        w = Window.partitionBy("id").orderBy(F.asc("d2r"), F.asc("cluster"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", "cluster", "sv")
        )
        sums = (
            assigned.select("cluster", F.posexplode("sv").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum(F.col("x").cast("long")).alias("s"))
            .collect()
        )
        counts = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        by_cluster: dict[int, dict[int, int]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"]
        cents = [
            (
                cid,
                [by_cluster[cid][p] / (counts[cid] * SCALE) for p in range(len(old))]
                if cid in by_cluster and counts.get(cid, 0) > 0
                else old,
            )
            for cid, old in cents
        ]
    cdf = spark.createDataFrame(cents, "cluster int, c array<double>")
    d2 = (
        VEC.dot(F.col("v"), F.col("v"))
        - F.lit(2.0) * VEC.dot(F.col("v"), F.col("c"))
        + VEC.dot(F.col("c"), F.col("c"))
    )
    al = base.crossJoin(F.broadcast(cdf)).select(
        "id", "cluster", (F.floor(d2 * 1e6 + F.lit(0.5)) / 1e6).alias("d2r")
    )
    w_own = Window.partitionBy("id").orderBy(F.asc("d2r"), F.asc("cluster"))
    own = (
        al.withColumn("rn", F.row_number().over(w_own))
        .where(F.col("rn") == 1)
        .select("id", F.col("cluster").alias("own"), F.col("d2r").alias("d2_own"))
    )
    other = (
        al.join(own, "id")
        .where(F.col("cluster") != F.col("own"))
        .groupBy("id", "own", "d2_own")
        .agg(F.min("d2r").alias("d2_other"))
    )
    a, b = F.sqrt("d2_own"), F.sqrt("d2_other")
    s = F.floor((b - a) / F.greatest(a, b) * 1e6 + F.lit(0.5)) / 1e6
    return (
        other.select(F.col("own").alias("cluster"), s.alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            davg(F.col("s"), 6).alias("mean_silhouette"),
        )
    )
