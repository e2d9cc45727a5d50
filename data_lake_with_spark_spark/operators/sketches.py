"""Count-min sketch: mergeable heavy-hitter counting over unbounded
key spaces (the frequency complement of the HLL distinct sketch in
plans/windows_batch.py).

The sketch is a d×w counter matrix held AS A DATAFRAME of (row, col,
cnt) cells: building is one explode (d cells per item) + one hash-agg;
merging two sketches is union + sum (associative/commutative — the
same roll-up algebra as HLL, so a 100 TB deployment keeps one tiny
sketch per partition and folds them in any order); a point query is
min over a key's d cells. Estimates are deterministic given the hash
family — md5-derived and engine-portable, so a SQL oracle can rebuild
the identical sketch — and obey cnt_true ≤ est ≤ cnt_true + εN with
the classic (d, w) guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D_DEFAULT = 4
W_DEFAULT = 256


def _cell(item: F.Column, row: int, w: int) -> F.Column:
    """Portable column hash → [0, w): first 8 md5 hex chars parsed as
    an int (DuckDB twin: CAST('0x' || substring(md5(..), 1, 8) AS
    BIGINT) % w)."""
    h = F.conv(
        F.substring(F.md5(F.concat(item.cast("string"), F.lit(f"#r{row}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(w))


def cms_build(
    df: DataFrame, item_col: str, d: int = D_DEFAULT, w: int = W_DEFAULT
) -> DataFrame:
    """(row, col, cnt) sketch cells for the items of ``df``. One
    explode to d cells per item, one hash-agg with map-side combine."""
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cell(item, r, w).alias("col"))
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Fold sketches built with identical (d, w): union + sum."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> DataFrame:
    """Point estimates: min over each item's d cells. Missing cells
    count 0 (item never hashed there). Output (item_col, est)."""
    item = F.col(item_col)
    probes = items.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), _cell(item, r, w).alias("col"))
                    for r in range(d)
                ]
            )
        ).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


HLL_P = 4  # 2^4 = 16 registers
HLL_ALPHA_16 = 0.673  # standard alpha for m=16


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_col: str,
    salt: str = "hll1",
) -> DataFrame:
    """Portable-HLL register observations: (group, reg, rho) per input
    row. 32-bit md5-derived hash → top 4 bits pick one of 16
    registers, rho = leading-zero count of the 28-bit suffix + 1 (via
    the minimal-binary-string length — identical `bin()` semantics in
    Spark and DuckDB, no log2). Duplicates are harmless (registers
    take a MAX), which is exactly why HLL merges freely."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    suffix = h % F.lit(268435456)
    rho = F.when(suffix == 0, F.lit(29)).otherwise(
        F.lit(29) - F.length(F.bin(suffix))
    )
    return df.select(
        F.col(group_col).alias("gk"),
        (h / F.lit(268435456)).cast("bigint").alias("reg"),
        rho.alias("rho"),
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(gk, users_est, n_zero_registers) from register observations.
    Register max per group, missing registers = 0, then the raw HLL
    estimate α·m²/Σ2^(−M_j) computed with the 2^32-scaled EXACT
    integer sum Σ2^(32−M_j) — order-independent BIGINT addition, one
    final double division, so the approximate sketch is itself
    bit-deterministic and SQL-oracle-able. (No small-range linear-
    counting correction: that needs ln(), whose last-ulp behavior is
    libm-specific; n_zero_registers is emitted so callers can apply
    it off-engine.) Sketch state per group is 16 small ints —
    mergeable by register-wise MAX in any order."""
    spark = regs.sparkSession
    base = regs.groupBy("gk", "reg").agg(F.max("rho").alias("m"))
    keys = base.select("gk").distinct()
    regs16 = spark.range(16).select(F.col("id").alias("reg"))
    full = (
        keys.crossJoin(F.broadcast(regs16))
        .join(base, ["gk", "reg"], "left")
        .withColumn("m", F.coalesce("m", F.lit(0)))
    )
    return full.groupBy("gk").agg(
        (
            F.floor(
                F.lit(HLL_ALPHA_16 * 256.0 * 4294967296.0)
                / F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - m AS INT))"))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("users_est"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_registers"),
    )


KMV_K = 256
KMV_RANGE = 4294967296  # 2^32 — the md5-prefix hash space


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = KMV_K,
    salt: str = "kmv1",
) -> DataFrame:
    """(gk, h) K-MINIMUM-VALUES sketch per group: the k smallest
    DISTINCT 32-bit md5-derived hash values of ``key_col`` (same
    portable hash family as the HLL sketch — identical in DuckDB, so
    the sketch itself is value-verifiable). KMV is the theta-sketch
    family's base state: mergeable (union = k smallest of the
    concatenation), and unlike HLL it supports INTERSECTION via
    ``kmv_overlap`` — the set-operation estimator a corpus wants for
    "how much do these two slices overlap" without two sorted scans.
    State per group is k hashes, built with one distinct + one
    bounded per-group window."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    hashes = df.select(F.col(group_col).alias("gk"), h.alias("h")).distinct()
    w = Window.partitionBy("gk").orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("gk", "h")
    )


def kmv_theta(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(gk, theta): the group's k-th smallest hash, or 2^32 when the
    group retained fewer than k values — the sketch then IS the exact
    distinct hash set and every estimate degrades gracefully to an
    exact count."""
    return sketch.groupBy("gk").agg(
        F.when(F.count(F.lit(1)) < k, F.lit(KMV_RANGE))
        .otherwise(F.max("h"))
        .cast("bigint")
        .alias("theta")
    )


def kmv_overlap(
    sketch: DataFrame, k: int = KMV_K, cache: bool = True
) -> DataFrame:
    """(ta, tb, n_sample, est_overlap, est_union, jaccard_ppm) for
    every group pair with at least one shared retained hash: the
    standard theta-sketch set algebra — θ = min(θ_a, θ_b), the
    intersection sample is the shared hashes < θ, the union sample is
    |{A<θ}| + |{B<θ}| − |shared<θ|, and every estimate is
    |sample| · 2³² div θ with Jaccard = inter·10⁶ div union in parts
    per million (pure integer arithmetic, so the ESTIMATORS are
    bit-deterministic and SQL-oracle-able, the portable-HLL
    discipline). The pair join is an equi-join ON THE HASH — k·g rows
    per side regardless of data volume — never a set×set comparison
    of the underlying keys; the below-θ per-side counts join the
    broadcast θ pair table, also k·g rows.

    The sketch frame feeds five branches (θ, both join sides, both
    below-θ counts) and the intersection frame two more; without a
    lazy shared cache each branch re-derives the sketch's
    distinct+window over the full input (measured: 14 effective
    FileScans on sketch_theta_overlap — round-9 scan audit). The
    sketch is k·groups rows, the cheapest possible cache.

    CACHING PROTOCOL: with ``cache=True`` (default) the two tiny
    frames register with ``operators.plan_cache`` — a long-lived
    session that calls this operator repeatedly should call
    ``plan_cache.release_shared_caches()`` once results are
    materialized (the registry/bench/sweep harnesses already do), or
    pass ``cache=False`` to opt out and manage reuse itself."""
    from data_lake_with_spark_spark.operators.plan_cache import (
        shared as shared_cache,
    )

    if cache:
        sketch = shared_cache(sketch)
    th = kmv_theta(sketch, k)
    a = sketch.select(F.col("gk").alias("ta"), "h")
    b = sketch.select(F.col("gk").alias("tb"), "h")
    shared = a.join(b, "h").where(F.col("ta") < F.col("tb"))
    inter = (
        shared.join(
            F.broadcast(
                th.select(F.col("gk").alias("ta"), F.col("theta").alias("th_a"))
            ),
            "ta",
        )
        .join(
            F.broadcast(
                th.select(F.col("gk").alias("tb"), F.col("theta").alias("th_b"))
            ),
            "tb",
        )
        .withColumn("theta", F.least("th_a", "th_b"))
        .where(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb", "theta")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sample"))
    )
    if cache:
        inter = shared_cache(inter)
    pairs_theta = F.broadcast(inter.select("ta", "tb", "theta"))
    na = (
        a.join(pairs_theta, "ta")
        .where(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    nb = (
        b.join(pairs_theta, "tb")
        .where(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    return (
        inter.join(na, ["ta", "tb"])
        .join(nb, ["ta", "tb"])
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_sample"))
        .select(
            "ta",
            "tb",
            "n_sample",
            F.expr(f"(n_sample * {KMV_RANGE}) div theta")
            .cast("bigint")
            .alias("est_overlap"),
            F.expr(f"(n_union * {KMV_RANGE}) div theta")
            .cast("bigint")
            .alias("est_union"),
            F.expr("(n_sample * 1000000) div n_union")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
