"""Deterministic, content-addressed sampling.

Spark's native ``sample``/``sampleBy``/``TABLESAMPLE`` are seeded but
partition-layout-dependent — the same logical table sampled on a
different cluster layout yields different rows, which breaks
reproducible dataset releases. Both operators here address rows by a
hash of their OWN content (same scheme as the train/test split in
operators/training.py), so the sample is a pure function of the data:
stable across engines, runs, partitionings, and corpus growth
(existing rows never enter/leave the sample when new rows arrive).

- ``stratified_fraction``: keep ~``fraction`` of every stratum — rows
  whose 2-hex md5 bucket falls below the cut. Map-only (a filter!),
  zero shuffles, scan-speed at 100 TB.
- ``stratified_topk``: exactly ``k`` rows per stratum, chosen by hash
  order — one window shuffle on the strata; the deterministic
  "give me 1000 examples of each class" operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket(id_col: str) -> F.Column:
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)


def stratified_fraction(
    df: DataFrame, fraction: float, id_col: str
) -> DataFrame:
    """~fraction of every stratum (any grouping — the filter is
    per-row, strata need not be named), content-addressed. Exact at
    the 1/256 granularity of the 2-hex bucket space."""
    n_keep = min(256, max(0, round(256 * fraction)))
    if n_keep == 0:
        return df.where(F.lit(False))
    if n_keep == 256:
        return df
    return df.where(_bucket(id_col) < F.lit(format(n_keep, "02x")))


def mixture_resample(
    df: DataFrame, weights: dict[str, float], domain_col: str, id_col: str
) -> DataFrame:
    """Downsample to target domain proportions, content-addressed.

    Given target shares ``weights`` (normalized internally), keeps the
    LARGEST subset whose domain mix matches the targets: the binding
    domain (smallest count/weight ratio) is kept in full and every
    other domain is thinned to match, via the same 256-bucket md5
    scheme as ``stratified_fraction`` (so the kept set is a pure
    function of row content — reproducible across engines, runs and
    partitionings; domains absent from ``weights`` are dropped).

    Fully lazy and declarative: per-domain counts are a tiny
    hash-aggregate, the binding ratio is a 1-row aggregate attached by
    broadcast, and the final keep test is a map-side filter against the
    broadcast per-domain boundary — one data-sized scan, no action
    during plan construction. The per-domain keep fraction is
    quantized to the 1/256 bucket grid (identically on any engine that
    computes the same plan — floor(x+0.5) rounding, 'zz' sentinel for
    keep-all so the 3-hex-digit boundary bug cannot occur)."""
    total = sum(weights.values())
    norm = {k: v / total for k, v in weights.items()}
    wmap = F.create_map(*[F.lit(x) for kv in norm.items() for x in kv])
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_w", wmap[F.col(domain_col)])
        .where(F.col("_w").isNotNull())
    )
    binding = counts.agg(
        F.min(F.col("_cnt").cast("double") / F.col("_w")).alias("_ratio")
    )
    n_keep = F.floor(
        F.lit(256.0) * F.col("_ratio") * F.col("_w") / F.col("_cnt").cast("double")
        + F.lit(0.5)
    ).cast("int")
    boundaries = counts.crossJoin(F.broadcast(binding)).select(
        domain_col,
        F.when(n_keep >= 256, F.lit("zz"))
        .otherwise(F.lower(F.lpad(F.hex(n_keep), 2, "0")))
        .alias("_keep_below"),
    )
    return (
        df.join(F.broadcast(boundaries), domain_col)
        .where(_bucket(id_col) < F.col("_keep_below"))
        .drop("_keep_below")
    )


def stratified_topk(
    df: DataFrame, strata_cols: list[str], k: int, id_col: str
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, selected by md5
    hash order (ties on the id) — deterministic everywhere."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_priority_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY (sequential
    Poisson) sampling, content-addressed: each row gets priority
    u/w with u a deterministic md5-derived uniform in (0,1] and w its
    weight; the n smallest priorities are the sample (Ohlsson 1998 /
    Duffield et al. 2007 — inclusion probability ≈ proportional to
    weight). Unlike Efraimidis–Spirakis u^(1/w) keys, the priority is
    ONE exact-integer division — no libm pow whose last-ulp behavior
    differs across engines — so the selected set is bit-reproducible
    anywhere md5 is.

    Re-running on the same rows reselects the same sample regardless of
    partitioning or row order; the global top-n plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of n·P
    candidates), never a single-partition sort. Returns the sampled
    rows + ``priority_e12`` (floor(priority·1e12), the exact rank key).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    # (h+1)/(w·2³²): w·2³² is exact in double for w < 2²¹, the divide
    # is one correctly-rounded IEEE op — deterministic on any engine.
    prio = (h + F.lit(1)) / (F.col(weight_col).cast("double") * F.lit(4294967296.0))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_prio", prio)
        .orderBy(F.asc("_prio"), F.asc(id_col))
        .limit(int(n))
        .withColumn("priority_e12", F.floor(F.col("_prio") * 1e12).cast("bigint"))
        .drop("_prio")
    )
