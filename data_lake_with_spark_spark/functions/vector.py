"""Vector expressions over ``array<float>`` embedding columns (E3/E5).

All math is done JVM-side with higher-order array functions, cast to
DOUBLE before accumulation so results are engine-portable (float32
accumulation order would not be).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH bucket id (random-hyperplane LSH for
    cosine similarity). ``planes`` are driver-side constants (seeded),
    so the bucket id is a pure deterministic expression — at scale this
    becomes the partition key for sub-linear candidate search."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(vec, plane_col) >= 0).cast("int")
        bucket = bucket + (bit * F.lit(2**i))
    return bucket
