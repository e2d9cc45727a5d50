"""Content-deduplicating corpus ingestion (the continuous
training-data pipeline): every arriving batch of documents is reduced
to the rows that are neither exact duplicates (canonical fingerprint)
nor near-duplicates (word-3-gram Jaccard) of the EXISTING corpus or of
earlier rows in the same batch, then appended as a new version of the
versioned corpus table.

This is the property ``stream_into_lake`` (key-level exactly-once)
cannot give: idempotence by CONTENT. Re-ingesting the same documents
under fresh ids appends nothing, because the dedup keys are derived
from the text itself.

Scale posture: the exact stage is one fingerprint anti-join (hash
shuffle on a 32-char key). The near-dup stage reuses the PPJoin
prefix-filtered inverted index from operators/dedup.py over
corpus ∪ batch. The corpus-side dedup keys are PRE-MATERIALIZED:
``ingest_batch`` appends every survivor with two companion columns —
``_fp`` (canonical fingerprint) and ``_shingles`` (sorted hashed
3-gram shingle array) — both pure functions of the text, so the
per-batch near-dup TOKENIZATION cost is tokenize(|batch|), never
tokenize(|corpus|). Corpus rows from pre-companion appends (nulls
under mergeSchema) fall back to recomputation from text; everything
ingested through this module never re-tokenizes. Batches are small
relative to the corpus, so candidate postings are dominated by
corpus×batch collisions, never corpus².

Honest scale note: the per-batch SCAN of corpus shingle arrays (and
the posting-index rebuild over them) is still |corpus|-bytes-driven —
at sf0.1 wall-clock the two paths tie, because tokenization is cheap
relative to the candidate join there. What the companion buys is the
CPU term that grows with corpus text (tokenize+hash+sort per doc);
the remaining |corpus| term is the index rebuild, whose fix is
structural: persist the PREFIX POSTING INDEX itself as a table
bucketed by shingle (sources/bucketed.py) so a batch join touches
only matching buckets — queued in ROADMAP.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import dedup as DD
from data_lake_with_spark_spark.sources import versioned as V

# Companion columns persisted with every ingested corpus row. Pure
# functions of text_col; _shingles is the sorted_shingle_arrays
# representation (empty array = "computed, doc too short to shingle" —
# distinct from null = "row predates companions").
FP_COL = "_fp"
SHINGLES_COL = "_shingles"


def _empty_shingles() -> Column:
    return F.array().cast("array<bigint>")


def _neg_id(id_col: str) -> Column:
    # corpus rows get negative pair-ids so "smaller partner" can never
    # resurrect a batch row over a corpus match
    return -F.col(id_col) - 1


def with_companions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``df`` + (_fp, _shingles) computed from text — what
    ingest_batch persists so later batches never re-derive them."""
    arrays = DD.sorted_shingle_arrays(df, id_col=id_col, text_col=text_col, n=3)
    return (
        df.withColumn(FP_COL, TXT.fingerprint(F.col(text_col)))
        .join(
            arrays.select(
                F.col("id").alias(id_col), F.col("sorted_shingles").alias(SHINGLES_COL)
            ),
            id_col,
            "left",
        )
        .withColumn(SHINGLES_COL, F.coalesce(F.col(SHINGLES_COL), _empty_shingles()))
    )


def _corpus_keys(corpus: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_cid, _fp, _shingles) for every corpus row.

    Rows with stored companions are served straight from the columns —
    the parquet scan reads only (id, _fp, _shingles), never text, and
    no tokenization runs. Rows where the companions read as null
    (appends that predate this module, merged in under mergeSchema)
    are recomputed from text; on a corpus maintained purely by
    ingest_batch that branch matches zero rows and its scan prunes on
    the pushed IS NULL filter."""
    has = FP_COL in corpus.columns and SHINGLES_COL in corpus.columns
    if has:
        stored_rows = corpus.where(
            F.col(FP_COL).isNotNull() & F.col(SHINGLES_COL).isNotNull()
        )
        stored = stored_rows.select(
            _neg_id(id_col).alias("_cid"), FP_COL, SHINGLES_COL
        )
        legacy = corpus.where(
            F.col(FP_COL).isNull() | F.col(SHINGLES_COL).isNull()
        )
    else:
        stored, legacy = None, corpus
    recomputed = with_companions(
        legacy.select(id_col, text_col), id_col=id_col, text_col=text_col
    ).select(_neg_id(id_col).alias("_cid"), FP_COL, SHINGLES_COL)
    return recomputed if stored is None else stored.unionByName(recomputed)


def dedup_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``batch`` that survive content dedup against ``corpus``
    (None = empty) and against earlier (smaller-id) batch rows.

    Exact stage: canonical-fingerprint left-anti join. Near stage:
    Jaccard ≥ threshold pairs over corpus ∪ batch; a batch row is
    dropped if it pairs with ANY corpus row or with a smaller-id batch
    row (keep-first greedy, same contract as semdedup). Corpus-side
    keys come from the stored companion columns when present (see
    _corpus_keys) — only the batch is tokenized."""
    ckeys = (
        _corpus_keys(corpus, id_col, text_col).cache() if corpus is not None else None
    )
    batch_fp = batch.withColumn(FP_COL, TXT.fingerprint(F.col(text_col)))
    if ckeys is not None:
        batch_fp = batch_fp.join(ckeys.select(FP_COL), FP_COL, "left_anti")
    # batch-internal exact dups: keep the smallest id per fingerprint
    w_min = batch_fp.groupBy(FP_COL).agg(F.min(id_col).alias("_keep_id"))
    batch_fp = (
        batch_fp.join(w_min, FP_COL)
        .where(F.col(id_col) == F.col("_keep_id"))
        .drop(FP_COL, "_keep_id")
    )

    tagged_batch = batch_fp.select(F.col(id_col).alias("_cid"), F.col(text_col))
    batch_arrays = DD.sorted_shingle_arrays(
        tagged_batch, id_col="_cid", text_col=text_col, n=3
    ).withColumnRenamed("id", "_cid")
    if ckeys is not None:
        corpus_arrays = ckeys.select(
            "_cid", F.col(SHINGLES_COL).alias("sorted_shingles")
        )
        all_arrays = corpus_arrays.unionByName(batch_arrays)
    else:
        all_arrays = batch_arrays
    pref = DD.prefix_from_arrays(
        all_arrays.withColumnRenamed("_cid", "id"), threshold
    ).cache()
    # Broadcast decision from the TEXT projection's plan stats — the
    # same input-bytes heuristic ngram_jaccard_pairs uses. Estimating
    # from the arrays union instead is wrong by orders of magnitude
    # (Catalyst's union/join estimates compound: measured 42 GB for a
    # 435 KB corpus), which silently disabled the broadcast verify and
    # made the stored path SLOWER than recompute.
    est_src = (corpus if corpus is not None else batch).select(id_col, text_col)
    pairs = DD.jaccard_pairs_from_prefix(
        pref,
        threshold,
        broadcast_arrays=DD._plan_size_bytes(est_src)  # noqa: SLF001
        <= DD.BROADCAST_ARRAYS_MAX_INPUT_BYTES,
    )
    # a_id < b_id always; corpus pair-ids are negative → in a
    # corpus/batch pair the batch row is ALWAYS b. Drop b when a is
    # corpus, or when both are batch (keep-first). A batch row can
    # never drop a corpus row, and b_id >= 0 identifies batch rows
    # without any flag join.
    drops = pairs.where(F.col("b_id") >= 0).select(
        F.col("b_id").alias("_cid")
    ).distinct()
    survivors = tagged_batch.join(drops, "_cid", "left_anti")
    return batch.join(
        survivors.select(F.col("_cid").alias(id_col)), id_col, "left_semi"
    )


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Content-dedup ``batch`` against the versioned corpus at
    ``corpus_path`` and append the survivors as a new version — WITH
    the (_fp, _shingles) companion columns, so future batches dedup
    against this append without touching its text (no commit when
    nothing survives). Returns the number of appended rows."""
    try:
        corpus = V.versioned_read(spark, corpus_path)
    except FileNotFoundError:
        corpus = None
    survivors = with_companions(
        dedup_batch_against_corpus(
            batch, corpus, threshold=threshold, id_col=id_col, text_col=text_col
        ),
        id_col=id_col,
        text_col=text_col,
    ).cache()
    n = survivors.count()
    if n:
        V.versioned_append(survivors, corpus_path)
    survivors.unpersist()
    return n


def stream_corpus_ingest(
    stream: DataFrame,
    corpus_path: str,
    threshold: float = 0.5,
    query_name: str = "corpus_ingest",
):
    """Streaming twin: foreachBatch → content-dedup ingest. Each
    micro-batch sees the corpus as committed by its predecessors, so
    duplicates across micro-batches (and across stream restarts) are
    dropped by content, not by key."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(
            batch_df.sparkSession, batch_df, corpus_path, threshold=threshold
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def gram_df_changes(
    changes: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pre-image change rows → per-change distinct n-gram rows (gram,
    _change_type), the shape ivm.maintain folds. A doc insert
    contributes +1 document-frequency to each of its distinct grams, a
    delete −1, an update ±1 through its pre/post images — so the
    maintained ``n_rows`` per gram IS the cross-document frequency."""
    toks = changes.select(
        id_col, "_change_type", F.split(F.trim(F.col(text_col)), r"\s+").alias("t")
    )
    return toks.where(F.size("t") >= n).select(
        "_change_type",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
                )
            )
        ).alias("gram"),
    )


def maintain_gram_df(
    current: DataFrame | None,
    changes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incrementally maintained cross-document n-gram frequency table
    (gram, n_rows=doc-frequency) — the big intermediate of
    filter_boilerplate_crossdoc kept in step with the corpus by
    O(changed-docs) folds instead of a full re-scan. Grams with
    n_rows ≥ 2 are the live boilerplate set."""
    from data_lake_with_spark_spark.operators import ivm

    return ivm.maintain(current, gram_df_changes(changes, n, id_col, text_col), ["gram"], [])


def posting_index_name(corpus_path: str) -> str:
    """Catalog-table name for a corpus's prefix posting index (bucketed
    tables live in the metastore, not at a path)."""
    import hashlib

    return "dlws_postings_" + hashlib.md5(corpus_path.encode()).hexdigest()[:10]


def append_posting_index(
    survivors_with_companions: DataFrame,
    corpus_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Append the survivors' PREFIX POSTINGS (shingle, id, pos, n_sh)
    to the corpus's posting-index table, bucketed by shingle — the
    structural fix for the last |corpus|-driven term of per-batch
    dedup: with the index pre-bucketed on the join key, a batch probe
    shuffles only the batch's postings and the index is read in place,
    never rebuilt. The PPJoin prefix depends on the threshold, so one
    index serves one threshold (encode it in the path convention if
    multiple are needed)."""
    pref = DD.prefix_from_arrays(
        survivors_with_companions.select(
            _neg_id(id_col).alias("id"),
            F.col(SHINGLES_COL).alias("sorted_shingles"),
        ),
        threshold,
    )
    posting = pref.select(
        "id", "n_sh", F.posexplode("prefix").alias("pos", "shingle")
    )
    table = posting_index_name(corpus_path)
    spark = survivors_with_companions.sparkSession
    mode = "append" if table in [t.name for t in spark.catalog.listTables()] else "overwrite"
    posting.write.mode(mode).bucketBy(n_buckets, "shingle").saveAsTable(table)


def dedup_batch_against_index(
    spark: SparkSession,
    batch: DataFrame,
    corpus: DataFrame,
    corpus_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content dedup of ``batch`` probing the PERSISTED posting index
    instead of rebuilding it from corpus arrays — identical survivors
    to dedup_batch_against_corpus (pytest-pinned), different physical
    shape: the candidate join reads the shingle-bucketed index in
    place (no exchange on the corpus side) and only batch postings
    shuffle; corpus shingle arrays are joined by id for the few
    candidates during verify. Exact-dup and batch-internal stages are
    unchanged (fingerprint math, |batch| + one id-keyed anti join)."""
    ckeys = _corpus_keys(corpus, id_col, text_col).cache()
    batch_fp = batch.withColumn(FP_COL, TXT.fingerprint(F.col(text_col)))
    batch_fp = batch_fp.join(ckeys.select(FP_COL), FP_COL, "left_anti")
    w_min = batch_fp.groupBy(FP_COL).agg(F.min(id_col).alias("_keep_id"))
    batch_fp = (
        batch_fp.join(w_min, FP_COL)
        .where(F.col(id_col) == F.col("_keep_id"))
        .drop(FP_COL, "_keep_id")
    )

    tagged_batch = batch_fp.select(F.col(id_col).alias("_cid"), F.col(text_col))
    batch_pref = DD.prefix_from_arrays(
        DD.sorted_shingle_arrays(tagged_batch, id_col="_cid", text_col=text_col, n=3),
        threshold,
    ).cache()
    b_post = batch_pref.select(
        F.col("id").alias("b_id"),
        F.col("n_sh").alias("b_n"),
        F.posexplode("prefix").alias("b_pos", "shingle"),
    )
    a_post = spark.table(posting_index_name(corpus_path)).select(
        F.col("id").alias("a_id"),
        F.col("n_sh").alias("a_n"),
        F.col("pos").alias("a_pos"),
        "shingle",
    )
    length_ok = (F.col("b_n") >= F.lit(threshold) * F.col("a_n")) & (
        F.col("b_n") * F.lit(threshold) <= F.col("a_n")
    )
    alpha = F.ceil(F.lit(threshold / (1 + threshold)) * (F.col("a_n") + F.col("b_n")))
    ubound = F.least(F.col("a_n") - F.col("a_pos"), F.col("b_n") - F.col("b_pos"))
    cand = (
        a_post.join(b_post, "shingle")
        .where(length_ok & (ubound >= alpha))
        .select("a_id", "b_id")
        .distinct()
    )
    a_arr = ckeys.select(
        F.col("_cid").alias("a_id"), F.col(SHINGLES_COL).alias("a_sh")
    )
    b_arr = batch_pref.select(
        F.col("id").alias("b_id"), F.col("sorted_shingles").alias("b_sh")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter / (F.size("a_sh") + F.size("b_sh") - inter)
    near_drops = (
        cand.join(a_arr, "a_id")
        .join(b_arr, "b_id")
        .where((F.floor(jac * 1e6 + 0.5) / 1e6) >= threshold)
        .select(F.col("b_id").alias("_cid"))
        .distinct()
    )
    # batch-internal near dups still need the batch×batch pass (tiny)
    b_pairs = DD.jaccard_pairs_from_prefix(batch_pref, threshold, broadcast_arrays=True)
    internal_drops = b_pairs.select(F.col("b_id").alias("_cid")).distinct()
    survivors = (
        tagged_batch.join(near_drops.unionByName(internal_drops).distinct(), "_cid", "left_anti")
    )
    return batch.join(
        survivors.select(F.col("_cid").alias(id_col)), id_col, "left_semi"
    )


def ingest_batch_indexed(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """ingest_batch with the posting-index fast path: dedup probes the
    bucketed index when it exists (first call builds it), and every
    append also appends the survivors' postings — so the index stays
    exactly one version behind nothing."""
    try:
        corpus = V.versioned_read(spark, corpus_path)
    except FileNotFoundError:
        corpus = None
    has_index = posting_index_name(corpus_path) in [
        t.name for t in spark.catalog.listTables()
    ]
    if corpus is not None and has_index:
        survivors = dedup_batch_against_index(
            spark, batch, corpus, corpus_path, threshold, id_col, text_col
        )
    else:
        survivors = dedup_batch_against_corpus(
            batch, corpus, threshold=threshold, id_col=id_col, text_col=text_col
        )
    enriched = with_companions(survivors, id_col=id_col, text_col=text_col).cache()
    n = enriched.count()
    if n:
        V.versioned_append(enriched, corpus_path)
        append_posting_index(enriched, corpus_path, threshold, id_col)
    enriched.unpersist()
    return n
