"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping — what Delta's ``OPTIMIZE ZORDER BY`` does, built from plain
expressions.

Parquet readers skip row groups / files whose column min-max stats
exclude a filter. A sort on ONE column gives perfect skipping for that
column and none for the others; interleaving the bits of several
columns' rank-buckets produces a total order in which every file holds
a small hyper-rectangle of the key space, so filters on ANY z-ordered
column prune. At 100 TB this is the difference between "fast lookups
on the partition key only" and "fast lookups on every hot predicate
column".

All JVM expressions: per-column rank buckets via ``percent_rank``
(value-distribution-proof), bit interleave via shiftleft/bitwise-or
folds, then ``repartitionByRange`` + ``sortWithinPartitions`` on the
morton key so both the file split points AND the in-file row-group
order follow the curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MORTON = "_zorder"
BITS = 16  # bucket resolution per dimension


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton code: bit j of dimension d lands at position j·D + d."""
    n_dims = len(bucket_cols)
    parts = [
        F.shiftleft(
            F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n_dims + d
        )
        for d, c in enumerate(bucket_cols)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder_key(df: DataFrame, cols: list[str], bits: int = BITS) -> DataFrame:
    """Append the morton key column. Buckets come from ``percent_rank``
    over each dimension — rank space, not value space, so skewed or
    non-numeric-range distributions still spread evenly across
    buckets. One window sort per dimension (at scale: sample-based
    range boundaries would replace the full sort; the key shape is
    identical)."""
    out = df
    buckets = []
    for c in cols:
        w = Window.orderBy(F.col(c))
        b = F.least(
            F.lit((1 << bits) - 1),
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("long"),
        )
        out = out.withColumn(f"_b_{c}", b)
        buckets.append(F.col(f"_b_{c}"))
    out = out.withColumn(MORTON, _interleave(buckets, bits))
    return out.drop(*[f"_b_{c}" for c in cols])


def morton_from_buckets(bucket_cols: list[Column], bits: int = BITS) -> Column:
    """Morton key over PRECOMPUTED integer bucket columns (callers that
    bucket in value space — ``(v - min) * 2^bits div span`` — get a
    fully map-side z-order key: no window sort at all, just one
    broadcast of the min/max stats row)."""
    return _interleave(bucket_cols, bits)


def write_zordered(
    df: DataFrame, cols: list[str], path: str, n_files: int = 8, bits: int = BITS
) -> None:
    """Materialize ``df`` clustered on the z-curve over ``cols``:
    range-partitioned by morton key (→ ``n_files`` files each owning a
    curve segment ≈ a key-space hyper-rectangle) and sorted within, so
    parquet row-group stats are tight for EVERY z-ordered column."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, MORTON)
        .sortWithinPartitions(MORTON)
        .drop(MORTON)
        .write.mode("overwrite")
        .parquet(path)
    )
