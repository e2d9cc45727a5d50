"""Training-data pipeline operators beyond dedup/similarity: the
shaping steps between a cleaned corpus and a training run.

- ``train_test_split``: deterministic, content-addressed split. The
  split decision is a pure function of the row's id (md5 prefix
  compare), so it is stable across runs, engines, cluster sizes and
  re-partitioning — the property that matters for never leaking test
  docs into train between pipeline versions. Zero shuffles: the split
  is a row-local expression.

- ``pack_sequences``: next-fit sequence packing — assign documents to
  fixed-token-budget packs (training sequences) by running prefix sum
  of token counts within each shard, ``pack_id = floor(cumsum_before /
  budget)``. One window per shard; shards (e.g. language) parallelize
  the packing and keep any one window's state small. This is the
  deterministic relaxation of bin packing used by LLM data loaders
  (docs may straddle a boundary; the loader truncates/continues), and
  unlike greedy best-fit it is expressible as one distributed window —
  no driver loop, no state store.

At 100 TB: both operators are shuffle-minimal (split: zero; pack: one
hash-partition + in-partition sort per shard). For packing, shard keys
must be chosen so a single shard's rows fit a partition sort —
language/source/date composites do; a single global shard would
serialize and is the caller's anti-pattern to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(id_col: str = "doc_id") -> "F.Column":
    """2-hex-char md5 prefix of the stringified id — 256 stable
    buckets, identical in any engine with md5 (string compare, no
    integer conversion games)."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)


def train_test_split(
    df: DataFrame, id_col: str = "doc_id", test_fraction: float = 0.1
) -> DataFrame:
    """Add a ``split`` column ∈ {train, test}: test iff the md5-prefix
    bucket falls in the top ``test_fraction`` of the 256-bucket space.
    Content-addressed → re-running on a grown corpus never moves an
    existing row between splits."""
    n_test = min(256, max(0, round(256 * test_fraction)))
    # The 2-hex-char bucket space has exactly 256 cells; n_test of 0 or
    # 256 can't be expressed as a 2-char boundary compare (format(256)
    # is 3 chars and would lexicographically invert the split), so
    # short-circuit the degenerate fractions.
    if n_test == 0:
        return df.withColumn("split", F.lit("train"))
    if n_test == 256:
        return df.withColumn("split", F.lit("test"))
    boundary = format(256 - n_test, "02x")  # e.g. 0.1 → 'e6'
    return df.withColumn(
        "split",
        F.when(split_bucket(id_col) >= F.lit(boundary), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 50,
    stride_tokens: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the context-window shaping step of a training pipeline. Chunk i
    covers tokens [i·stride, i·stride + chunk_tokens); the tail chunk
    is short rather than padded. Returns (id, chunk_idx, chunk_text,
    n_chunk_tokens).

    Pure per-row HOFs (sequence → slice → array_join) over a projected
    token array, then ONE posexplode — no joins, no shuffles beyond
    the explode's pipeline, so chunking is scan-speed at 100 TB and
    the output inherits the input's partitioning by id."""
    from data_lake_with_spark_spark.functions.text import tokens

    if stride_tokens <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    toked = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride_tokens))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice("toks", s + 1, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size("toks") - s).alias("n_chunk_tokens"),
        ),
    )
    return (
        toked.where(F.size("toks") > 0)
        .select("id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            F.col("id").alias(id_col),
            "chunk_idx",
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    token_count_col,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Assign each row a ``pack_id`` within its shard: rows are taken
    in ``order_col`` order and packed next-fit into ``budget``-token
    sequences. Returns the input plus (n_tokens, pack_id).

    pack_id = floor(tokens_before_this_row / budget) — the row whose
    prefix sum crosses a budget boundary starts the next pack (loader
    semantics: it may straddle; deterministic either way)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return df.withColumn("n_tokens", token_count_col).withColumn(
        "pack_id", F.floor(tokens_before / F.lit(budget)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    compression: str = "zstd",
) -> dict:
    """Export stage of the training pipeline: write ``df`` as exactly
    ``n_shards`` similarly-sized parquet shard files plus a
    ``manifest.json`` (shard → file, rows, bytes; totals).

    Sharding is CONTENT-ADDRESSED — shard = md5-bucket of the id, the
    same device-independent scheme as train_test_split — so a re-run
    over the same rows lands every row in the same shard whatever the
    cluster layout (loaders can resume/verify by manifest). One
    repartition(shard) shuffle, one task per shard, so shard files
    stream out in parallel; at 100 TB pick n_shards ≈ total/target
    shard size and the write stays one wide stage.

    Returns the manifest dict. Loader contract: read manifest.json,
    stream ``files`` in order; ``total_rows`` validates completeness.
    """
    import json
    import os

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_shards
    ).alias("_shard")
    (
        df.withColumn("_shard", shard)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", id_col)
        .write.mode("overwrite")
        .partitionBy("_shard")
        .option("compression", compression)
        .parquet(path)
    )
    import pyarrow.parquet as pq

    shards = []
    for d in sorted(os.listdir(path)):
        if not d.startswith("_shard="):
            continue
        sid = int(d.split("=")[1])
        files = sorted(
            f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
        )
        rows = bytes_ = 0
        for f in files:
            fp = os.path.join(path, d, f)
            rows += pq.read_metadata(fp).num_rows
            bytes_ += os.path.getsize(fp)
        shards.append(
            {
                "shard": sid,
                "files": [os.path.join(d, f) for f in files],
                "rows": rows,
                "bytes": bytes_,
            }
        )
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(s["rows"] for s in shards),
        "total_bytes": sum(s["bytes"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest
