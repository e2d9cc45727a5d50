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
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_with_spark_spark.functions.vector import cosine, dot, hyperplane_bucket, norm  # noqa: F401

# Build-side broadcast gate for the LSH bucket self-join (round-15
# ADVICE fix): the (id, tbl, bucket) posting frame is ~24 long-triples
# per vector, far smaller than the embeddings scan it derives from, so
# while the SCAN estimate is under this bound the posting side is
# provably broadcast-safe and the join shape is pinned instead of
# estimate-dependent (the planner's size guess for a pandas-UDF output
# is unreliable). Past the bound the planner keeps the choice — the
# 100 TB path.
BROADCAST_POSTING_MAX_INPUT_BYTES = 48 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of the plan (file-size derived
    for parquet scans) — lazy, no job at construction."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))  # noqa: SLF001


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_udf(planes_stack: np.ndarray):
    """Vectorized bucket assignment for ALL tables in one pass:
    vec → [bucket_table0, …, bucket_table{L-1}].

    A pandas UDF on purpose: the expression form would embed L·b
    64-float literal arrays in the plan (codegen blow-up, interpreted
    HOF dots — measured ~10s for 2000 rows); here it's a single
    (n×dim)·(dim×L·b) numpy matmul per Arrow batch. The plane matrix
    is a deterministic seeded constant captured in the closure.
    """
    n_tables, n_planes, _ = planes_stack.shape
    flat = planes_stack.reshape(n_tables * n_planes, -1).T  # (dim, L*b)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)  # (n, dim)
        bits = (mat @ flat >= 0).astype(np.int64).reshape(len(mat), n_tables, n_planes)
        return pd.Series(list(bits @ weights))  # (n, L)

    return buckets


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
    # Norms are precomputed ONCE PER VECTOR in the pre-join selects
    # (bit-identical to per-pair: same sequential fold, just hoisted) —
    # per-pair cosine would redo 2 of its 3 array folds n_pairs times.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    c = widen_if_narrow(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        ),
        embeddings.sparkSession,
    )
    score = (
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
        if metric == "cosine"
        else dot(F.col("q_vec"), F.col("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", (F.floor(score * 1e6 + 0.5) / 1e6).alias("score"))
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
    n_tables: int = 6,
    n_planes: int = 5,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH with
    1-bit multi-probe: L independent tables of b bits each; candidates
    = union over tables of (same bucket ∪ hamming-1 buckets), then
    exact re-scoring. Same output shape as brute_force_topk.

    Parameter intuition (measured on the testdata embeddings, which are
    only weakly clustered — top-cos ≈ 0.4): (L=6, b=5, probe=1) gives
    ~0.92 recall@5. On corpora with genuine near-duplicate structure
    (cos ≥ 0.8) the same config prunes 10-100× harder — P(bucket
    match) per table grows like (1-θ/π)^b. Approximate by design →
    rows-only correctness check; pytest tracks recall vs brute force.
    """
    planes_stack = np.array(
        [random_planes(n_planes, dim, seed + t) for t in range(n_tables)]
    )
    buckets = _bucket_udf(planes_stack)

    def with_buckets(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id), buckets(F.col(vec_col)).alias("bks")
        )

    c = with_buckets(embeddings, "neighbor_id").select(
        "neighbor_id", F.posexplode("bks").alias("tbl", "bucket")
    )
    # queries: per table, own bucket + all hamming-1 probes. Built as
    # ONE selectExpr string (round-14 optimization): the Column-API
    # loop issued ~200 py4j round-trips per plan construction —
    # ~0.2s/pass of driver latency at ~0.4ms a call; a single SQL
    # string is one call and analyzes to the identical expressions
    # (A/B: results frame-equal).
    q_b = with_buckets(queries, "query_id")
    probe_exprs = []
    for t in range(n_tables):
        b = f"element_at(bks, {t + 1})"
        for probe in [b] + [f"({b} ^ {2 ** i})" for i in range(n_planes)]:
            probe_exprs.append(
                f"struct(CAST({t} AS INT) AS tbl, CAST({probe} AS BIGINT) AS bucket)"
            )
    q = q_b.selectExpr(
        "query_id", f"explode(array({', '.join(probe_exprs)})) AS tb"
    ).selectExpr("query_id", "tb.tbl AS tbl", "tb.bucket AS bucket")

    # candidate ids only through the bucket join (no vector payloads in
    # the shuffle); re-attach vectors afterwards for exact re-scoring
    cand_ids = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c_vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    cos = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        cand_ids.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Train IVF coarse centroids with Spark ML KMeans (distributed —
    at 100 TB train on a sample, assign everywhere). Pass
    ``sample_fraction`` to train on a seeded Bernoulli sample: centroid
    quality degrades sub-linearly with sample size while training cost
    is linear, so ~1% is the right operating point at scale."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if sample_fraction is not None and sample_fraction < 1.0:
        embeddings = embeddings.sample(fraction=sample_fraction, seed=seed)
    feats = embeddings.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return np.array(model.clusterCenters())


def _nearest_centroids_udf(centroids: np.ndarray, n_probe: int):
    """vec → the ids of its n_probe nearest centroids (euclidean),
    nearest first. One numpy distance matrix per Arrow batch."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return nearest


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, list_id): coarse-quantizer assignment. Writing this
    frame ``partitionBy("list_id")`` gives the IVF physical layout —
    queries then scan only the probed lists via partition pruning."""
    nearest = _nearest_centroids_udf(centroids, 1)
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.element_at(nearest(F.col(vec_col)), 1).alias("list_id"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each query scores only the inverted lists
    of its n_probe nearest centroids — candidate work drops from n to
    ~n·(n_probe/n_lists). Same output shape as brute_force_topk."""
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).withColumn(
        "c_norm", norm(F.col("vec"))
    )
    nearest = _nearest_centroids_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(nearest(F.col(vec_col))).alias("list_id"),
    )
    cos = dot(F.col("q_vec"), F.col("vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        assigned.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def write_ivf_layout(
    embeddings: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF physical layout: vectors hive-partitioned by
    their coarse list id. At 100 TB this is the difference between ANN
    being a full-corpus scan and a scan of n_probe/n_lists of it —
    queries prune to the probed partitions at the file-listing level."""
    ivf_assign(embeddings, centroids, id_col, vec_col).write.partitionBy(
        "list_id"
    ).mode("overwrite").parquet(path)


def write_ivf_layout_versioned(
    embeddings: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Commit an IVF index (re)build as a new version of a versioned
    table: the version dir is hive-partitioned by ``list_id`` exactly
    like ``write_ivf_layout``, so version-pinned reads still prune to
    the probed partitions — and a re-index (new centroids, grown
    corpus) is time-travelable: queries pin version N−1 until the new
    index validates, then flip. Each version is a SELF-CONTAINED
    snapshot (an index rebuild replaces the index, it doesn't delta
    it). Returns the committed version."""
    from data_lake_with_spark_spark.sources.versioned import versioned_append

    return versioned_append(
        ivf_assign(embeddings, centroids, id_col, vec_col),
        path,
        partition_by=("list_id",),
    )


def ivf_topk_from_layout(
    spark,
    path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """IVF top-k against a ``write_ivf_layout`` table. The probed list
    ids (n_queries × n_probe ints — driver-trivial at any scale) become
    a literal ``isin`` partition filter, so only the probed partition
    directories are listed and scanned. Same output contract as
    ``ivf_topk``; identical results for the same centroids/params.

    Works on plain layouts and versioned ones: against a
    ``write_ivf_layout_versioned`` table the scan pins one snapshot
    version (default latest; pass ``version`` to time-travel a
    pre-re-index top-k). Centroids must be the ones that built that
    version."""
    from data_lake_with_spark_spark.sources.versioned import (
        current_version,
        versioned_snapshot_dir,
    )

    data_dir = (
        versioned_snapshot_dir(path, version)
        if current_version(path) is not None
        else path
    )
    nearest = _nearest_centroids_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(nearest(F.col(vec_col))).alias("list_id"),
    )
    probed = sorted({r["list_id"] for r in q.select("list_id").distinct().collect()})
    assigned = (
        spark.read.parquet(data_dir)
        .where(F.col("list_id").isin(probed))
        .withColumn("c_norm", norm(F.col("vec")))
    )
    cos = dot(F.col("q_vec"), F.col("vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        assigned.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def write_ivf_bucketed(
    embeddings: DataFrame,
    centroids: np.ndarray,
    table: str,
    n_buckets: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """IVF layout as a BUCKETED catalog table (bucketBy list_id) — the
    co-located end-to-end form of ``write_ivf_layout``. The bucketed
    scan reports hash-partitioning on list_id, so the probe→rerank
    pipeline runs with ZERO exchange on the vector side: bucket
    pruning keeps the scan to the probed lists, the probe join is a
    broadcast, and the local per-(list, query) top-k window is
    satisfied by the scan's own partitioning (HashPartitioning on a
    subset of the window keys). Only per-list winners — n_probe·k rows
    per query — ever shuffle. Hive partitioning gives the same
    pruning but NOT the partitioning guarantee; at 100 TB the rerank
    shuffle over all candidates is the bottleneck this removes."""
    ivf_assign(embeddings, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).bucketBy(n_buckets, "list_id").saveAsTable(table)


def ivf_topk_from_bucketed(
    spark,
    table: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k against a ``write_ivf_bucketed`` table. Identical
    results to ``ivf_topk_from_layout`` (pytest-pinned); the physical
    plan differs: (1) bucket-pruned scan of the probed lists, (2)
    broadcast probe join (preserves the scan's list_id partitioning),
    (3) LOCAL top-k per (list_id, query_id) window with NO exchange —
    the bucketed scan already clusters by list_id, which satisfies the
    window's clustered-distribution on (list_id, query_id) — then (4)
    global top-k per query over the ≤ n_probe·k local winners. The
    keep-k-per-list step is lossless for global top-k: every global
    winner is a winner within its own list."""
    nearest = _nearest_centroids_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(nearest(F.col(vec_col))).alias("list_id"),
    )
    probed = sorted({r["list_id"] for r in q.select("list_id").distinct().collect()})
    assigned = (
        spark.table(table)
        .where(F.col("list_id").isin(probed))
        .withColumn("c_norm", norm(F.col("vec")))
    )
    cos = dot(F.col("q_vec"), F.col("vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        assigned.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "list_id",
            "query_id",
            F.col("id").alias("neighbor_id"),
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w_local = W.partitionBy("list_id", "query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    local = scored.withColumn("lrank", F.row_number().over(w_local)).where(
        F.col("lrank") <= k
    )
    w_global = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w_global))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def autotune_nprobe(
    embeddings: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    target_recall: float = 0.9,
    n_val_queries: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[int, dict[int, float]]:
    """Pick the smallest POWER-OF-TWO ``n_probe`` whose measured
    recall@k on a held-out validation split meets ``target_recall``
    (the geometric schedule can overshoot the minimal feasible probe
    count by up to 2× — the price of O(log n_lists) tuning jobs;
    binary-search between the last failing and first passing power if
    the gap matters).

    Validation queries are a deterministic content-addressed split
    (md5 of the id — same device-independent scheme as the training
    split operator), so the tuning set is stable across runs and
    cluster layouts. Ground truth is exact brute-force top-k over the
    full table for JUST those queries (cheap: n_val · n, not n²).
    Candidate probes grow geometrically (1, 2, 4, …, n_lists) so the
    driver runs O(log n_lists) small Spark jobs, not one per probe.
    Returns ``(chosen_n_probe, {n_probe: recall})``; falls back to
    n_lists if the target is unreachable — that fallback's recall is
    1.0 by construction (probing every list IS the exhaustive scan),
    not a measured value, so it is absent from the returned dict.
    """
    n_lists = len(centroids)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8), 16, 10).cast("long"),
        F.lit(1000),
    )
    val_frac_cut = max(1, min(1000, round(1000 * n_val_queries / max(embeddings.count(), 1))))
    val_queries = embeddings.where(bucket < val_frac_cut)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(embeddings, val_queries, k, id_col, vec_col).collect()
    }
    if not truth:
        return 1, {}
    measured: dict[int, float] = {}
    n_probe = 1
    while n_probe <= n_lists:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                embeddings, val_queries, centroids, k, n_probe, id_col, vec_col
            ).collect()
        }
        measured[n_probe] = len(got & truth) / len(truth)
        if measured[n_probe] >= target_recall:
            return n_probe, measured
        n_probe *= 2
    return n_lists, measured


def pq_train(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 12, seed: int = 42
) -> np.ndarray:
    """Train product-quantization codebooks: split dims into m
    subspaces, k-means each with plain deterministic Lloyd iterations.
    Returns (m, k, dim/m). Trained driver-side on a bounded sample —
    the 100 TB pattern (train on sample, encode everywhere)."""
    n, dim = sample.shape
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub))
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        centers = x[rng.choice(n, size=k, replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    centers[c] = x[mask].mean(axis=0)
        books[j] = centers
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): m-byte PQ code per vector — 8 bytes instead of 256
    for a 64-dim float vector (32× memory compression for the
    candidate scan)."""
    m, k, dsub = codebooks.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            x = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((x[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return embeddings.select(
        F.col(id_col).alias("id"), encode(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC approximate top-k with exact reranking.

    Asymmetric distance computation: each query precomputes an (m×k)
    dot-product table against the codewords; a candidate's approximate
    score is m table lookups over its 8-byte code — no float vectors
    touched during the scan. The top k·rerank_factor by approximate
    score are exactly re-scored. Queries are collected driver-side
    (bounded query batches — chunk at scale)."""
    m, kk, dsub = codebooks.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()
    tables = {}
    for r in q_rows:
        qv = np.asarray(r["q_vec"], dtype=np.float64)
        tables[r["query_id"]] = np.stack(
            [codebooks[j] @ qv[j * dsub : (j + 1) * dsub] for j in range(m)]
        )  # (m, k)

    codes = pq_encode(embeddings, codebooks, id_col, vec_col)
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("approx", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            code_mat = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf["id"].to_numpy()
            frames = []
            for qid, table in tables.items():
                approx = table[np.arange(m)[None, :], code_mat].sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids, "approx": approx}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = codes.mapInPandas(score, out_schema).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c_vecs = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    cos = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    reranked = (
        shortlist.join(F.broadcast(q_vecs), "query_id")
        .join(c_vecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w2))
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
    a = embeddings.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_norm"),
    )
    b = embeddings.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_norm"),
    )
    cos = dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm"))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_tables: int = 24,
    n_planes: int = 3,
    dim: int = 64,
    seed: int = 1042,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with rounded cosine ≥ threshold — contract-identical
    to ``cosine_near_pairs`` but with NO cross join: candidates come
    from a multi-table hyperplane-LSH bucket equi-join (pairs
    co-bucketed in ≥1 of L tables), then the exact rounded cosine
    verifies every candidate, so precision is exact by construction
    and only recall depends on the bucketing.

    Parameter choice is threshold-driven: a pair at cosine t lands in
    the same b-bit bucket of one table with p = (1 − arccos(t)/π)^b.
    The low oracled threshold (0.35 → p ≈ 0.23 at b=3) needs many
    tables — the defaults (L=24, b=3) give measured recall 1.0 on the
    test corpus (enforced by pytest against the exact form). At
    production dedup thresholds (≥ 0.7 → p ≈ 0.55 per bit) the same
    operator prunes 10–100× harder with fewer, wider tables. The
    bucket join shuffles (id, tbl, bucket) rows only — no vector
    payloads move until the verify join re-attaches them.

    Stage-order alternatives, measured and REJECTED (round 10,
    sf0.1 = 2k vectors, 6.1M raw → 1.9M distinct candidates):
    (a) dedup AFTER verify (skip the pre-verify dropDuplicates,
    filter first): 37s vs 4.7s — the aggregate-HOF dot product on the
    3.2× duplicated candidate stream costs far more than the narrow
    6M-row dedup shuffle it avoids; (b) first-colliding-table
    uniqueness filter (carry both bks arrays through the join, keep a
    (a,b,t) row only when no earlier table co-bucketed the pair —
    dedup-free by construction): 37s — two array slices + a zip_with
    per candidate row beats nothing, allocation cost ≈ the HOF dot
    itself. The narrow-dedup-then-verify order stands; at the oracled
    threshold 0.35 the verify set is ~95% of all pairs by design
    (hyperplane collision odds at that cosine gap), so candidate
    volume is irreducible here — real pruning begins at production
    thresholds where p_bit rises.
    """
    planes_stack = np.array(
        [random_planes(n_planes, dim, seed + t) for t in range(n_tables)]
    )
    buckets = _bucket_udf(planes_stack)
    tb = embeddings.select(
        F.col(id_col).alias("id"), buckets(F.col(vec_col)).alias("bks")
    ).select("id", F.posexplode("bks").alias("tbl", "bucket"))
    # Probe-side width (round-14 optimization, guide §2.5/§2.6): the
    # testdata parquet is a single split, so the broadcast bucket join
    # — whose OUTPUT is ~128× its input (every co-bucketed pair) —
    # would generate all candidates in ONE task. Spread the skinny
    # (id, tbl, bucket) posting rows across the cluster first; on a
    # properly-split table this is a no-op (widen_if_narrow contract).
    # Measured at sf0.1 (2k vecs, 6.1M raw candidates): candidate
    # phase 3.3s → 1.2s, full operator ~5s → ~2.1s, identical rows.
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    probe = widen_if_narrow(tb, embeddings.sparkSession)
    cores = embeddings.sparkSession.sparkContext.defaultParallelism
    # Self-join: the build side is the un-widened tb, broadcast
    # EXPLICITLY (round-15 ADVICE fix — the shape was previously
    # estimate-dependent: if the planner's UDF-derived size guess
    # flipped to sort-merge, the pandas-UDF bucketing would evaluate
    # twice plus an extra shuffle). Size-gated on the embeddings scan
    # estimate: the posting side is (id, tbl, bucket) longs, ~24
    # rows/vector — small while the input is; past the gate the
    # planner keeps the choice (the 100 TB path).
    b_side = tb.alias("b")
    if _plan_size_bytes(embeddings) <= BROADCAST_POSTING_MAX_INPUT_BYTES:
        b_side = F.broadcast(b_side)
    cand = (
        probe.alias("a")
        .join(
            b_side,
            F.expr("a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id"),
        )
        .selectExpr("a.id AS a_id", "b.id AS b_id")
        # Pin the dedup exchange to cluster width: AQE's byte-based
        # coalescing sees ~16 B/row and shrinks this stage far below
        # core count, but the stage DOWNSTREAM of it evaluates the
        # 64-dim verify dot per surviving pair — compute-heavy per
        # byte, exactly what byte-accounting underestimates. The
        # explicit key repartition doubles as the dedup shuffle
        # (same keys → single exchange), so this adds no hop.
        .repartition(cores, "a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # Vectors pre-cast to array<double> ONCE per side (2 casts per
    # VECTOR instead of 2 per pair-element in the verify lambda);
    # float→double widening is exact, so the verify cosine is
    # bit-identical (A/B-checked: symmetric diff 0 at sf0.1).
    # expr-string construction of the verify attachment (round-15
    # construction-chatter cut; identical analyzed expressions — the
    # pre-cast array<double> sides and the zip_with/aggregate cosine
    # are exactly what the Column helpers built)
    norm_sql = (
        f"sqrt(aggregate(`{vec_col}`, 0.0D,"
        " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    a = embeddings.selectExpr(
        f"`{id_col}` AS a_id",
        f"CAST(`{vec_col}` AS ARRAY<DOUBLE>) AS a_vec",
        f"{norm_sql} AS a_norm",
    )
    b = embeddings.selectExpr(
        f"`{id_col}` AS b_id",
        f"CAST(`{vec_col}` AS ARRAY<DOUBLE>) AS b_vec",
        f"{norm_sql} AS b_norm",
    )
    dot_sql = (
        "aggregate(zip_with(a_vec, b_vec,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, v) -> acc + v)"
    )
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .selectExpr(
            "a_id",
            "b_id",
            f"floor(({dot_sql}) / (a_norm * b_norm) * 1e6 + 0.5D) / 1e6"
            " AS cos_sim",
        )
        .where(f"cos_sim >= {threshold!r}D")
    )


def mine_hard_negatives(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    positive_threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    k most-similar vectors that are NOT positives/near-duplicates
    (raw cosine < ``positive_threshold``) — maximally confusable
    negatives, the pairs a contrastive loss learns most from. The
    exclusion cut uses the RAW cosine (rounding only at output) so
    engines agree on the boundary. Same shape as brute_force_topk
    (anchors broadcast against the corpus); at scale swap the
    candidate stage for the LSH buckets and keep this exact scoring
    as the rerank."""
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_norm"),
    )
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    c = widen_if_narrow(
        embeddings.select(
            F.col(id_col).alias("negative_id"),
            F.col(vec_col).alias("c_vec"),
            norm(F.col(vec_col)).alias("c_norm"),
        ),
        embeddings.sparkSession,
    )
    raw = dot(F.col("a_vec"), F.col("c_vec")) / (F.col("a_norm") * F.col("c_norm"))
    scored = (
        c.crossJoin(F.broadcast(a))
        .where(F.col("anchor_id") != F.col("negative_id"))
        .where(raw < F.lit(positive_threshold))
        .select(
            "anchor_id",
            "negative_id",
            (F.floor(raw * 1e6 + 0.5) / 1e6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor_id", "negative_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def matryoshka_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    coarse_dims: int = 8,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka (nested-prefix) two-stage retrieval: score every
    candidate with only the FIRST ``coarse_dims`` components (MRL-style
    embeddings front-load information, Kusupati et al. 2022), keep a
    per-query ``shortlist``, then exact-rerank the shortlist with the
    full vector. Output contract matches brute_force_topk.

    Scale shape: the coarse pass is where the data volume is, and it
    touches coarse_dims/dim of the vector bytes — with the prefix
    stored as its own column the scan is column-pruned to 1/8th of the
    embedding bytes; the full-vector join that follows handles only
    shortlist × n_queries rows. Both stages are deterministic (scores
    portable-rounded before ranking, ties broken by id), which is what
    lets the full two-stage pipeline be oracled, unlike sampled ANN.
    """
    d = int(coarse_dims)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.slice(F.col(vec_col), 1, d).alias("q_pre"),
    ).select(
        "query_id",
        "q_vec",
        "q_pre",
        norm(F.col("q_pre")).alias("q_pre_norm"),
        norm(F.col("q_vec")).alias("q_norm"),
    )
    from data_lake_with_spark_spark.catalog import widen_if_narrow

    c = widen_if_narrow(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.slice(F.col(vec_col), 1, d).alias("c_pre"),
        ).select(
            "neighbor_id",
            "c_vec",
            "c_pre",
            norm(F.col("c_pre")).alias("c_pre_norm"),
            norm(F.col("c_vec")).alias("c_norm"),
        ),
        embeddings.sparkSession,
    )
    coarse_score = dot(F.col("q_pre"), F.col("c_pre")) / (
        F.col("q_pre_norm") * F.col("c_pre_norm")
    )
    coarse = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "q_vec",
            "c_vec",
            "q_norm",
            "c_norm",
            (F.floor(coarse_score * 1e6 + 0.5) / 1e6).alias("cscore"),
        )
    )
    w_c = W.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("neighbor_id"))
    short = coarse.withColumn("crank", F.row_number().over(w_c)).where(
        F.col("crank") <= int(shortlist)
    )
    full = dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    rr = short.select(
        "query_id",
        "neighbor_id",
        (F.floor(full * 1e6 + 0.5) / 1e6).alias("score"),
    )
    w_r = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w_r))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "score")
    )
