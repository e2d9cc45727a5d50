"""Deduplication operators (SURVEY §2.10 E1/E2).

Four families, all shuffle-disciplined for the 100 TB case:

- **exact**: hash group-by on the dedup key — one shuffle, map-side
  partial aggregation. Deterministic survivor = min(id).
- **n-gram Jaccard (exact pairwise)**: distinct word-shingles →
  self-join on shingle (the inverted-index join: work is proportional
  to Σ posting-list², not n²) → Jaccard from intersection + set sizes.
- **MinHash + LSH (approximate, scale path)**: k min-hashes per doc →
  band signatures → bucket join → candidates verified with exact
  Jaccard. Candidate generation cost is O(n·bands); never O(n²).
- **SimHash**: 64-bit signature via per-bit weighted majority of token
  hashes; near-dup candidates via the 4×16-bit chunk pigeonhole
  (hamming ≤ 3 ⇒ at least one chunk identical) then exact hamming
  verification with bit_count(xor).

Everything is JVM-side expressions (xxhash64 / bitwise / HOFs) — no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.text import tokens, word_shingles


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact key group.

    Returns (key_cols..., keep_id, n_copies). One hash-agg shuffle;
    at 100 TB pre-partitioning the write on ``key_cols`` lets this run
    shuffle-free on subsequent loads.
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) with distinct word n-gram shingles per doc."""
    return (
        docs.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles"))
        .select("id", F.explode("shingles").alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle *sets*.

    Inverted-index self-join: only pairs sharing ≥1 shingle are ever
    materialized. Output (a_id, b_id, jaccard) with a_id < b_id,
    jaccard rounded to 6 (engine-portable double).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature per document.

    Hash family: xxhash64(shingle, i) — k independent 64-bit functions,
    deterministic across runs/executors. One explode + one hash-agg
    shuffle computes all k minima (map-side partial min).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    bands=4 × rows=4 over 16 hashes: detection prob at j=0.8 is
    1-(1-0.8⁴)⁴ ≈ 0.92 per band family — candidates only; the exact
    Jaccard verification keeps precision at 1.0. Output
    (a_id, b_id, jaccard ≥ threshold).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("val"))
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = stacked.alias("a")
    b = stacked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.0, n=n, id_col=id_col, text_col=text_col)
    return (
        candidates.join(exact, ["a_id", "b_id"])
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    Per bit: sign of Σ_tokens (+1 if bit set in xxhash64(token) else
    -1). Expressed as 64 conditional-sum aggregates in a single
    hash-agg pass (one shuffle; map-side combine keeps it scalable).
    """
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    def _mask(i: int) -> int:
        # bit 63 as -2^63 keeps the constant in signed-long range
        return (1 << i) if i < 63 else -(1 << 63)

    bit_aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(_mask(i)).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    summed = tok.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"s_{i}") > 0, F.lit(_mask(i)).cast("long")).otherwise(0)
    return summed.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming (≤ 3).

    Pigeonhole candidate join: split the 64-bit signature into 4
    16-bit chunks; hamming ≤ 3 ⇒ some chunk matches exactly, so the
    equi-join on (chunk_idx, chunk_val) finds all such pairs without
    an O(n²) comparison. Verification: bit_count(a XOR b).
    """
    sig = simhash(docs, id_col, text_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
