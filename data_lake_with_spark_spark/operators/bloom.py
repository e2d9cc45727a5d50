"""Bloom-filter membership pruning for decontamination-style joins.

The at-scale shape of "drop training rows that hit a benchmark set":
instead of shipping every corpus n-gram into a join probe, build a
fixed-size bloom bitmap over the (small) benchmark side and prune
corpus grams MAP-SIDE with pure JVM bit arithmetic before any join.
False positives are then resolved by the exact join on the survivors
only; false negatives are impossible, so the final result is
bit-identical to the exact query — the bloom changes the plan, not
the answer.

Build is distributed (explode k hash positions → distinct → 64-bit
word OR-aggregate); only the finished bitmap — m/64 longs, 8 KiB at
the default m=2^16 — is collected to the driver, the same
bounded-by-design collect class as the PQ codebook
(operators/similarity.py). At 100 TB the benchmark set is a fixed
eval suite (thousands of docs), so m stays small by construction;
the corpus side never shuffles a pruned-away gram.

Hash family: xxhash64(gram, i) for i in 0..k-1 — deterministic across
runs/engines, no Python in the probe path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS_DEFAULT = 1 << 16
K_HASHES_DEFAULT = 3


def _positions(gram_col: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(gram_col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def _bit(pos: Column) -> Column:
    # F.shiftleft's Python signature only accepts an int shift; the SQL
    # function itself takes a column — call it directly.
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def build_bloom(
    grams: DataFrame,
    gram_col: str = "g",
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> list[int]:
    """Aggregate the member set's k hash positions into an m-bit
    bitmap, returned as m/64 longs. Distributed until the final
    ≤ m/64-row collect (8 KiB at defaults)."""
    pos = grams.select(
        F.explode(F.array(*_positions(F.col(gram_col), m_bits, k))).alias("p")
    ).distinct()
    words = pos.select(
        (F.col("p") / 64).cast("int").alias("word_idx"),
        _bit(F.col("p")).alias("bit"),
    )
    rows = words.groupBy("word_idx").agg(F.bit_or("bit").alias("w")).collect()
    bitmap = [0] * (m_bits // 64)
    for r in rows:
        bitmap[r["word_idx"]] = r["w"]
    return bitmap


def might_contain(
    gram_col: Column,
    bitmap: list[int],
    m_bits: int = M_BITS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> Column:
    """Pure-JVM membership test against a bitmap literal: k hash
    probes, each one element_at + bitwise AND — no UDF, pipelined
    inside whatever stage carries the gram column."""
    arr = F.lit(bitmap)
    checks = []
    for p in _positions(gram_col, m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        checks.append(word.bitwiseAND(_bit(p)) != 0)
    return reduce(lambda a, b: a & b, checks)
