"""Manual skew mitigation: salted equi-join and two-phase distinct.

AQE's skew-join split (enabled in the session factory, tested in
``test_approx_and_skew.py``) handles most sort-merge skew at runtime,
but it can't help when the skewed side must CO-GROUP (stream-static
joins, grouped UDFs) or when the skew is in an aggregation's final
reduce. These operators are the classic explicit fixes:

- ``salted_join``: the build side is replicated ``salt``× with an
  explicit salt column and the probe side gets a deterministic per-row
  salt, so a hot key's rows spread over ``salt`` reducers instead of
  one. Replication cost is salt×|build| rows — use for a small-ish
  build side against a skewed probe side (the broadcast-threshold
  failure zone: too big to broadcast, small enough to replicate).
- ``two_phase_count_distinct``: exact per-key distinct counts where
  one hot key would otherwise funnel every distinct value through a
  single reducer — phase 1 dedups on (key, value) (spread by the
  PAIR's hash), phase 2 counts (tiny).

Results are exactly equal to the unsalted forms (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a skewed ``probe`` side against a
    replicable ``build`` side. The probe's salt is a deterministic
    hash of its whole row (stable across retries — no rand()), the
    build side is exploded ``salt``×, and the join runs on
    keys + salt. Output columns match ``probe.join(build, keys, how)``.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if SALT in probe.columns or SALT in build.columns:
        raise ValueError(f"{SALT} column already present")
    p = probe.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    b = build.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return p.join(b, [*keys, SALT], how).drop(SALT)


def two_phase_count_distinct(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key in two hash-aggregations:
    dedup on (key, value) — shuffled by the pair, so a hot key's
    values spread — then count per key. Identical results to
    ``groupBy(keys).agg(count_distinct(value))``."""
    return (
        df.select(*keys, value_col)
        .dropDuplicates([*keys, value_col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
