"""Multimodal column plumbing (SURVEY §2.10 E5).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the
actual media decode is STUBBED (no image/audio libs in this container):

- ``decode_media``     → raises NotImplementedError (clearly marked).
- ``fake_feature_extract`` → deterministic features derived from the
  payload bytes (sha-based), so pipelines exercise the full path with
  stable, assertable outputs.

At 100 TB the binary payloads dominate storage; the layout rule is:
metadata columns in the same parquet for pruning, payloads
row-group-aligned, and feature extraction as ``mapInPandas`` (Arrow
batches, bounded memory via ``maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)


def attach_fake_payloads(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic binary payload column from existing
    data (sha via repeated md5-unhex) so multimodal plumbing can be
    exercised on the text testdata. Payload = unhex(md5(text)) ×4."""
    h = F.unhex(F.md5(F.col(text_col)))
    payload = F.concat(h, F.unhex(F.md5(F.concat(F.col(text_col), F.lit("x")))))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.lit(8).cast("int").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("values", T.ArrayType(T.LongType()), False),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode for the formats the Python standard library
    covers — WAV (``wave``), PNG (``zlib`` + spec defiltering, all
    five scanline filters), and GIF87a (bit-level LZW with table growth
    and clear-code resets; see operators/media_codecs.py) — as an
    Arrow-batched ``mapInPandas`` stage, the same seam where PIL/ffmpeg
    would decode JPEG/MP4-class formats (those still raise: no such
    libs in this container). Output: one row per medium with shape
    metadata and the decoded samples/pixels as ``values``."""
    from data_lake_with_spark_spark.operators.media_codecs import (
        decode_gif_bytes,
        decode_png_bytes,
        decode_wav_bytes,
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                mtype = meta["media_type"]
                if mtype == "audio/wav":
                    rate, nch, samples = decode_wav_bytes(bytes(payload))
                    rows.append((mid, "audio", rate, nch, None, None, samples))
                elif mtype == "image/png":
                    w, h, ch, raster = decode_png_bytes(bytes(payload))
                    rows.append((mid, "image", None, ch, w, h, list(raster)))
                elif mtype == "image/gif":
                    w, h, raster = decode_gif_bytes(bytes(payload))
                    rows.append((mid, "image", None, 1, w, h, list(raster)))
                else:
                    raise NotImplementedError(
                        f"decode for {mtype!r} needs PIL/ffmpeg-class libs "
                        "(not in this container); wav/png decode natively"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "sample_rate", "n_channels",
                    "width", "height", "values",
                ],
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


def attach_wav_payloads(
    df: DataFrame,
    id_col: str,
    n_samples: int = 64,
    sample_rate: int = 16000,
) -> DataFrame:
    """REAL 16-bit PCM WAV payloads synthesized deterministically per
    row (the test corpus ships no media): sample i of row k is
    ((k·31 + i·7) mod 65536) − 32768 — closed-form, so an oracle can
    predict the decoded content analytically."""
    from data_lake_with_spark_spark.operators.media_codecs import encode_wav

    @F.pandas_udf(T.BinaryType())
    def wav_payload(k: pd.Series) -> pd.Series:
        return k.map(
            lambda kk: encode_wav(
                [((int(kk) * 31 + i * 7) % 65536) - 32768 for i in range(n_samples)],
                sample_rate,
            )
        )

    payload = wav_payload(F.col(id_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("media_type"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            F.lit(n_samples).cast("long").alias("n_samples"),
        ).alias("meta"),
    )


def attach_png_payloads(
    df: DataFrame, id_col: str, width: int = 8, height: int = 4
) -> DataFrame:
    """REAL grayscale PNG payloads synthesized per row: pixel (x, y) of
    row k is (k·3 + 13y + 5x) mod 256, encoded with scanline filter
    k mod 5 — every PNG filter type flows through the decoder while
    the decoded raster stays closed-form for the oracle."""
    from data_lake_with_spark_spark.operators.media_codecs import encode_png

    @F.pandas_udf(T.BinaryType())
    def png_payload(k: pd.Series) -> pd.Series:
        def build(kk: int) -> bytes:
            raster = bytes(
                (kk * 3 + 13 * y + 5 * x) % 256
                for y in range(height)
                for x in range(width)
            )
            return encode_png(raster, width, height, 1, filter_type=kk % 5)

        return k.map(lambda kk: build(int(kk)))

    payload = png_payload(F.col(id_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/png").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


FEATURE_DIM = 8
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        T.StructField("feature_bytes", T.ArrayType(T.IntegerType()), False),
    ]
)


def fake_feature_extract(media: DataFrame) -> DataFrame:
    """Deterministic 'feature extraction' over binary payloads via
    mapInPandas — the real Arrow-batched shape a decoder would use.
    Feature i = byte i of sha256(lowercase-hex(payload)) / 255; the
    raw integer bytes also come back as ``feature_bytes`` so downstream
    aggregates can stay order-independent (integer sums) and the whole
    payload→feature path is reproducible in plain SQL
    (``sha256(hex-string)`` exists on VARCHAR in ANSI-ish engines,
    ``sha256(blob)`` does not)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(bytes(p).hex().encode("ascii")).digest()[:FEATURE_DIM]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [[b / 255.0 for b in d] for d in digests],
                    "feature_bytes": [[int(b) for b in d] for d in digests],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


AUDIO_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
    ]
)


def attach_fake_audio(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 16000
) -> DataFrame:
    """Audio-shaped (1-D) variant of ``attach_fake_payloads``: one
    byte ≙ one sample, metadata carries rate + length instead of
    width×height. Same deterministic md5-derived payload trick so the
    plumbing is exercised with stable bytes."""
    payload = F.concat(
        F.unhex(F.md5(F.col(text_col))),
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit("a")))),
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit("b")))),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("audio/fake").alias("media_type"),
            F.lit(sample_rate).cast("int").alias("sample_rate"),
            F.length(payload).cast("long").alias("n_samples"),
        ).alias("meta"),
    )


def clip_media(media: DataFrame, start: int, length: int) -> DataFrame:
    """Crop/clip plumbing (the byte-slicing core of image crop / audio
    clip): slice ``length`` samples starting at ``start`` (0-based) and
    rewrite the length metadata to match. Pure JVM ``substring`` on the
    binary column — no Python worker in the path, so at 100 TB the
    clip runs at scan speed and the *smaller* clipped payload is what
    shuffles downstream. Clips shorter than requested (payload ends
    early) keep their true length in the metadata.

    Works on any media flavor: the input ``meta`` struct is preserved
    as-is except for its length field (``n_samples`` when present —
    audio — else ``n_bytes``), so image meta (width/height/n_bytes)
    survives a clip unchanged in shape."""
    clipped = F.substring(F.col("payload"), start + 1, length)
    meta_fields = media.schema["meta"].dataType.fieldNames()
    length_field = "n_samples" if "n_samples" in meta_fields else "n_bytes"
    return media.select(
        "media_id", clipped.alias("payload"), "meta"
    ).withColumn(
        "meta",
        F.col("meta").withField(length_field, F.length("payload").cast("long")),
    )


def resize_image(media: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-factor image downsample plumbing (nearest-neighbor):
    keep every ``factor``-th pixel of every ``factor``-th row of a
    row-major 1-byte/px payload, and rewrite width/height metadata to
    match. Pure JVM array ops (sequence → substring picks) — the same
    gather pattern a real resize kernel uses, minus the filtering
    math (which needs a decoded raster; see decode_media). At 100 TB
    the resize shrinks payload bytes ``factor²``× *before* any
    shuffle/UDF touches them — order matters: resize at scan, then
    feature-extract."""
    w, h = F.col("meta.width"), F.col("meta.height")
    new_w = ((w + factor - 1) / factor).cast("int")
    new_h = ((h + factor - 1) / factor).cast("int")
    rows = F.sequence(F.lit(0), new_h - 1)
    cols = F.sequence(F.lit(0), new_w - 1)
    # row-major gather: byte at (r·factor)·width + c·factor, 1-indexed
    picked = F.flatten(
        F.transform(
            rows,
            lambda r: F.transform(
                cols,
                lambda c: F.substring(F.col("payload"), (r * factor) * w + c * factor + 1, 1),
            ),
        )
    )
    payload = F.aggregate(
        picked, F.lit(b"").cast("binary"), lambda acc, x: F.concat(acc, x)
    )
    # Two-phase select: the gather is expensive, so n_bytes measures the
    # ACTUAL materialized payload (payloads shorter than the declared
    # width×height yield short gathers) in a second projection that
    # CollapseProject won't inline (non-cheap expr referenced twice).
    resized = media.select(
        "media_id",
        payload.alias("payload"),
        F.col("meta.media_type").alias("_media_type"),
        new_w.alias("_new_w"),
        new_h.alias("_new_h"),
    )
    return resized.select(
        "media_id",
        "payload",
        F.struct(
            F.col("_media_type").alias("media_type"),
            F.col("_new_w").alias("width"),
            F.col("_new_h").alias("height"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """'Frame sampling' plumbing: split each payload into fixed-size
    frames (4 bytes) and keep every nth — pure Spark array ops, the
    same explode shape a real video frame sampler produces."""
    n_frames = (F.col("meta.n_bytes") / 4).cast("int")
    frame_idx = F.sequence(F.lit(0), n_frames - 1)
    sampled = F.filter(frame_idx, lambda i: i % every_nth == 0)
    frames = F.transform(
        sampled,
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(F.col("payload"), i * 4 + 1, 4).alias("frame_bytes"),
        ),
    )
    return media.select(
        "media_id", F.explode(frames).alias("frame")
    ).select("media_id", F.col("frame.frame_no").alias("frame_no"), F.col("frame.frame_bytes").alias("frame_bytes"))


def attach_gif_payloads(
    df: DataFrame, id_col: str, width: int = 8, height: int = 4
) -> DataFrame:
    """REAL grayscale GIF87a payloads synthesized per row: pixel (x, y)
    of row k is (k·7 + 11y + 3x) mod 256, LZW-compressed for real by
    encode_gif — the decoder's dictionary path (not just literals) runs
    on every payload while the raster stays closed-form for the
    oracle."""
    from data_lake_with_spark_spark.operators.media_codecs import encode_gif

    @F.pandas_udf(T.BinaryType())
    def gif_payload(k: pd.Series) -> pd.Series:
        def build(kk: int) -> bytes:
            raster = bytes(
                (kk * 7 + 11 * y + 3 * x) % 256
                for y in range(height)
                for x in range(width)
            )
            return encode_gif(raster, width, height)

        return k.map(lambda kk: build(int(kk)))

    payload = gif_payload(F.col(id_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/gif").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def dft_coefficients(
    ks: tuple[int, ...] = (1, 4, 8), n: int = 64, scale: int = 10**6
) -> list[tuple[int, list[int], list[int]]]:
    """Quantized DFT basis rows (k, cos·scale, −sin·scale) — ONE
    driver-side source of truth embedded both in the Spark literals and
    in generated oracle SQL, so no cross-engine trig/rounding enters
    the data path at all."""
    import math

    rows = []
    for k in ks:
        cc = [round(math.cos(2 * math.pi * k * i / n) * scale) for i in range(n)]
        cs = [round(-math.sin(2 * math.pi * k * i / n) * scale) for i in range(n)]
        rows.append((int(k), cc, cs))
    return rows


def spectral_power(
    dec: DataFrame,
    ks: tuple[int, ...] = (1, 4, 8),
    n: int = 64,
    scale: int = 10**6,
) -> DataFrame:
    """Spectral power of decoded PCM at fixed DFT bins — the
    tone/bandwidth screening feature of an audio pipeline. The trig
    basis is quantized to exact integers once on the driver
    (dft_coefficients), so the per-clip correlations Σ v·coef are
    exact BIGINT folds (order-independent, engine-portable) and only
    the final power = (re/scale)² + (im/scale)² touches doubles.
    The k basis rows broadcast; per-row work is two zip_with folds —
    zero shuffles, embarrassingly parallel at any corpus size.

    Input: decode_media output (media_id, values). Returns
    (media_id, k, power) with power portable-rounded to 1e-4.
    """
    spark = dec.sparkSession
    cdf = spark.createDataFrame(
        dft_coefficients(ks, n, scale), "k int, cc array<long>, cs array<long>"
    )
    re = F.aggregate(
        F.zip_with(F.col("values"), F.col("cc"), lambda x, c: x.cast("long") * c),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    im = F.aggregate(
        F.zip_with(F.col("values"), F.col("cs"), lambda x, c: x.cast("long") * c),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    denom = F.lit(float(scale))
    power = (re / denom) * (re / denom) + (im / denom) * (im / denom)
    return dec.select("media_id", "values").crossJoin(F.broadcast(cdf)).select(
        "media_id",
        "k",
        (F.floor(power * 1e4 + F.lit(0.5)) / 1e4).alias("power"),
    )


def byte_stats_arrow(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics through ``mapInArrow`` — the
    Arrow-NATIVE UDF seam, one level below ``mapInPandas``: record
    batches arrive as pyarrow.RecordBatch with the binary payload
    column zero-copy in Arrow buffers, no pandas materialization.
    This is the right seam for binary-heavy multimodal work where a
    pandas Series of Python bytes objects would double memory; the
    extraction itself (numpy over each payload's buffer) is the spot
    a real decoder kernel (libvips/ffmpeg batch call) would occupy.
    Map-only: no shuffle, no state, output row count == input row
    count, so partitioning is irrelevant to the result."""
    import numpy as np
    import pyarrow as pa

    out_schema = (
        "media_id long, n_bytes long, byte_sum long, "
        "byte_xor int, byte_min int, byte_max int"
    )

    def stats(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            n, s, x, mn, mx = [], [], [], [], []
            for pay in payloads:
                a = np.frombuffer(pay, dtype=np.uint8)
                n.append(len(a))
                s.append(int(a.sum()))
                x.append(int(np.bitwise_xor.reduce(a)) if len(a) else 0)
                mn.append(int(a.min()) if len(a) else 0)
                mx.append(int(a.max()) if len(a) else 0)
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(n, pa.int64()),
                    pa.array(s, pa.int64()),
                    pa.array(x, pa.int32()),
                    pa.array(mn, pa.int32()),
                    pa.array(mx, pa.int32()),
                ],
                names=[
                    "media_id",
                    "n_bytes",
                    "byte_sum",
                    "byte_xor",
                    "byte_min",
                    "byte_max",
                ],
            )

    return media.select("media_id", "payload").mapInArrow(stats, out_schema)


def attach_fake_video(
    df: DataFrame,
    id_col: str,
    text_col: str,
    width: int = 4,
    height: int = 2,
    n_frames: int = 6,
) -> DataFrame:
    """Video-shaped variant of ``attach_fake_payloads``: the payload is
    ``n_frames`` row-major 1-byte/px frames concatenated (48 md5-derived
    bytes = 6 frames of 4×2), metadata carries the frame geometry — the
    opaque-binary-plus-typed-metadata contract a real video column
    uses, with deterministic bytes so frame arithmetic is oracle-able."""
    payload = F.concat(
        F.unhex(F.md5(F.col(text_col))),
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit("f")))),
        F.unhex(F.md5(F.concat(F.col(text_col), F.lit("g")))),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("video/fake").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(n_frames).cast("long").alias("n_frames"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def frame_decimate(media: DataFrame, every: int = 2) -> DataFrame:
    """Temporal frame sampling (every ``every``-th frame, starting at
    frame 0) — the video analog of ``resize_image``'s spatial gather:
    pure JVM byte slicing assembles the kept frames into a smaller
    payload and rewrites n_frames/n_bytes metadata. No Python worker
    in the path; at 100 TB the payload shrinks ``every``× BEFORE any
    shuffle or Arrow stage touches it — sample at scan, then decode
    only kept frames (the frame-rate decimation every video trainset
    build runs)."""
    fs = F.col("meta.width") * F.col("meta.height")
    idxs = F.filter(
        F.sequence(F.lit(0).cast("long"), F.col("meta.n_frames") - 1),
        lambda i: i % F.lit(every) == 0,
    )
    picked = F.transform(
        idxs, lambda i: F.substring(F.col("payload"), (i * fs + 1).cast("int"), fs)
    )
    payload = F.aggregate(
        picked, F.lit(b"").cast("binary"), lambda acc, x: F.concat(acc, x)
    )
    sampled = media.select(
        "media_id",
        payload.alias("payload"),
        F.col("meta.media_type").alias("_mt"),
        F.col("meta.width").alias("_w"),
        F.col("meta.height").alias("_h"),
        F.size(idxs).cast("long").alias("_nf"),
    )
    return sampled.select(
        "media_id",
        "payload",
        F.struct(
            F.col("_mt").alias("media_type"),
            F.col("_w").alias("width"),
            F.col("_h").alias("height"),
            F.col("_nf").alias("n_frames"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
