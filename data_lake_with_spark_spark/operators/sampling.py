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
