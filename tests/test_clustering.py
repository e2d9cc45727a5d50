"""Property tests for operators/clustering.py (nearest-centroid +
SemDeDup) on synthetic embeddings with known structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from data_lake_with_spark_spark.functions import vector as VEC
from data_lake_with_spark_spark.operators import clustering as CL

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _synthetic(spark):
    """Three well-separated directions with small per-member jitter;
    vectors 0/1 and 2/3 are near-duplicates inside their clusters."""
    base = {
        0: [1.0, 0.05, 0.0, 0.0],
        1: [0.0, 1.0, 0.05, 0.0],
        2: [0.0, 0.0, 0.05, 1.0],
    }
    rows = []
    for vid in range(12):
        lab = vid % 3
        vec = list(base[lab])
        # jitter one off-axis component deterministically; ids 0-5 get
        # tiny jitter (near-dups of each other within a cluster)
        jitter = 0.01 if vid < 6 else 0.4
        vec[(lab + 2) % 4] += jitter * (1 + vid // 3)
        rows.append((vid, [float(x) for x in vec], lab))
    return spark.createDataFrame(rows, SCHEMA)


def test_assignment_recovers_separated_clusters(spark):
    emb = _synthetic(spark)
    cents = CL.label_centroids(emb)
    assigned = CL.assign_nearest_centroid(emb, cents, keep_cols=("label",))
    rows = assigned.collect()
    assert len(rows) == 12
    # well-separated directions: every vector lands on its own label's
    # centroid
    for r in rows:
        assert r["assigned"] == r["label"], (r["vec_id"], r["assigned"], r["label"])
        assert 0.0 < r["cos_sim"] <= 1.0 + 1e-12


def test_assignment_exactly_one_per_vector(spark):
    emb = _synthetic(spark)
    cents = CL.label_centroids(emb)
    assigned = CL.assign_nearest_centroid(emb, cents)
    assert assigned.groupBy("vec_id").count().where(F.col("count") != 1).count() == 0


def test_semdedup_drops_only_within_cluster_neighbors(spark):
    emb = _synthetic(spark)
    survivors = CL.semdedup_survivors(emb, threshold=0.995)
    kept = {r["vec_id"] for r in survivors.collect()}
    # near-identical pairs within a cluster: the smaller id survives
    assert 0 in kept and 1 in kept and 2 in kept
    # survivors contain NO same-cluster pair at/above the threshold —
    # the keep-first greedy invariant
    vecs = CL.scaled_vectors(emb).join(
        survivors.withColumnRenamed("vec_id", "vid"),
        F.col("vec_id") == F.col("vid"),
    )
    a = vecs.select(
        F.col("assigned"), F.col("vec_id").alias("a_id"), F.col("sv").alias("a_sv")
    )
    b = vecs.select(
        F.col("assigned"), F.col("vec_id").alias("b_id"), F.col("sv").alias("b_sv")
    )
    bad = (
        a.join(b, "assigned")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            VEC.dot(F.col("a_sv"), F.col("b_sv"))
            / (VEC.norm(F.col("a_sv")) * VEC.norm(F.col("b_sv")))
            >= 0.995
        )
    )
    assert bad.count() == 0


def test_semdedup_pair_join_is_cluster_keyed(spark):
    """The quadratic stage must be keyed on the cluster id — no
    cartesian product between the two data-sized sides."""
    emb = _synthetic(spark)
    plan = CL.semdedup_survivors(emb, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_kmeans_lloyd_inertia_monotone(spark, sf_dir):
    """Lloyd's update never increases total inertia: 3 assignment
    passes end with total d² ≤ the 1-pass assignment against the seed
    centroids (tolerance covers the 1e-6 presentation rounding)."""
    from data_lake_with_spark_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    i1 = CL.kmeans_lloyd(emb, k=4, n_iter=1).agg(F.sum("d2")).first()[0]
    i3 = CL.kmeans_lloyd(emb, k=4, n_iter=3).agg(F.sum("d2")).first()[0]
    assert i3 <= i1 + 1e-3, (i1, i3)


def test_kmeans_lloyd_empty_cluster_keeps_seed(spark):
    """A cluster that captures no members keeps its previous centroid
    instead of vanishing: with two coincident far-apart groups and
    k=3, the third seed (a duplicate of a group member) empties after
    pass 1 yet the result still has exactly k distinct labels ≤ k."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [0.05, 0.0]),   # seed 2 ~ duplicate of group A → empties
        (10, [9.0, 9.0]),
        (11, [9.1, 9.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = CL.kmeans_lloyd(emb, k=3, n_iter=3).collect()
    assert len(out) == 5
    assert {r["cluster"] for r in out} <= {0, 1, 2}
