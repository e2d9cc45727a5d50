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
corpus ∪ batch; at 100 TB the corpus-side shingle arrays are the
thing to pre-materialize (they are a pure function of the text, so a
production deployment persists them as a companion column/table and
the per-batch cost is |batch|-driven, not |corpus|-driven — noted in
ROADMAP). Batches are small relative to the corpus, so candidate
postings are dominated by corpus×batch collisions, never corpus².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import dedup as DD
from data_lake_with_spark_spark.sources import versioned as V


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
    row (keep-first greedy, same contract as semdedup)."""
    fp = TXT.fingerprint(F.col(text_col))
    batch_fp = batch.withColumn("_fp", fp)
    if corpus is not None:
        corpus_fp = corpus.select(TXT.fingerprint(F.col(text_col)).alias("_fp"))
        batch_fp = batch_fp.join(corpus_fp, "_fp", "left_anti")
    # batch-internal exact dups: keep the smallest id per fingerprint
    w_min = batch_fp.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    batch_fp = (
        batch_fp.join(w_min, "_fp")
        .where(F.col(id_col) == F.col("_keep_id"))
        .drop("_fp", "_keep_id")
    )

    tagged_batch = batch_fp.select(
        F.col(id_col).alias("_cid"), F.col(text_col), F.lit(True).alias("_is_batch")
    )
    if corpus is not None:
        tagged = corpus.select(
            # corpus rows get negative pair-ids so "smaller partner"
            # can never resurrect a batch row over a corpus match
            (-F.col(id_col) - 1).alias("_cid"),
            F.col(text_col),
            F.lit(False).alias("_is_batch"),
        ).unionByName(tagged_batch)
    else:
        tagged = tagged_batch
    pairs = DD.ngram_jaccard_pairs(
        tagged, threshold=threshold, n=3, id_col="_cid", text_col=text_col
    )
    flags = tagged.select("_cid", "_is_batch")
    annotated = (
        pairs.join(flags.withColumnRenamed("_cid", "a_id"), "a_id")
        .withColumnRenamed("_is_batch", "_a_batch")
        .join(flags.withColumnRenamed("_cid", "b_id"), "b_id")
        .withColumnRenamed("_is_batch", "_b_batch")
    )
    # a_id < b_id always; corpus ids are negative → in a corpus/batch
    # pair the batch row is ALWAYS b. Drop b when a is corpus, or when
    # both are batch (keep-first). A batch row can never drop a corpus row.
    drops = annotated.where(F.col("_b_batch")).select(
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
    ``corpus_path`` and append the survivors as a new version (no
    commit when nothing survives). Returns the number of appended
    rows."""
    try:
        corpus = V.versioned_read(spark, corpus_path)
    except FileNotFoundError:
        corpus = None
    survivors = dedup_batch_against_corpus(
        batch, corpus, threshold=threshold, id_col=id_col, text_col=text_col
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
