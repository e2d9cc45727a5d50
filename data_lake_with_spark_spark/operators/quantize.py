"""Embedding quantization (int8 symmetric, per-dimension).

The storage-shrink step of a vector pipeline: 4-byte floats become
1-byte codes (4x smaller than float32, 16x smaller than float64
in-memory rows), with the per-dimension scale table kept alongside for
dequantization — the standard precursor to int8 SIMD distance kernels
and a complement to the PQ codes in operators/similarity.py (PQ is
lossy-by-clustering, this is lossy-by-rounding: deterministic,
training-free, and exactly reproducible on any engine).

Plan shape (all JVM expressions, no Python):
1. posexplode the vector column → (id, pos, v): one data-sized scan;
   the explode multiplies rows by dim but each row is 20 bytes.
2. per-dimension max(|v|) → a dim-row aggregate (map-side combined).
3. broadcast the dim-row scale table back and quantize each component
   with floor(127*v/scale + 0.5) — portable half-up rounding, the
   same form everywhere else in the repo (engine ROUND(double) ties
   differ).

At 100 TB: stage 2's shuffle carries dim rows per partition (partial
aggregates), stage 3 is map-side (broadcast join) — the only
data-sized exchange is the scan itself. A production variant would
write (id, array<tinyint>) back via array_agg sorted by pos;
the queries here keep per-component rows to stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def component_scales(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension symmetric scale: max(|v|) over the corpus.
    Returns (pos, scale) with pos 0-based."""
    ex = emb.select(F.posexplode(vec_col).alias("pos", "v"))
    return ex.groupBy("pos").agg(
        F.max(F.abs(F.col("v").cast("double"))).alias("scale")
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization against corpus per-dimension scales.

    Returns (id, pos, v, scale, q) per vector component, where
    q = floor(127*v/scale + 0.5) in [-127, 127] (q=0 where the whole
    dimension is zero). Deterministic: scales are exact double maxima
    of float inputs and the quantizer is bit-identical IEEE ops."""
    scales = component_scales(emb, vec_col)
    ex = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    q = F.when(F.col("scale") == 0.0, F.lit(0)).otherwise(
        F.floor(F.lit(127.0) * F.col("v") / F.col("scale") + F.lit(0.5)).cast("int")
    )
    return ex.join(F.broadcast(scales), "pos").select(
        id_col, "pos", "v", "scale", q.alias("q")
    )


def dequantize_error(quantized: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-vector reconstruction error of the int8 codes:
    max(|v - q*scale/127|) — the worst-component L∞ error, plus the
    quantized head components as scalar columns (oracle-friendly)."""
    err = F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
        F.abs(F.col("v") - F.col("q").cast("double") * F.col("scale") / F.lit(127.0))
    )
    head = [
        F.max(F.when(F.col("pos") == i, F.col("q"))).alias(f"q{i}") for i in range(3)
    ]
    return quantized.groupBy(id_col).agg(
        *head, F.max(err).alias("linf_err")
    )
