"""Inverted-index search primitives over the documents corpus.

Full-text ranking (BM25/TF-IDF) lives in the plans layer; this module
holds the POSITIONAL layer — exact phrase matching by postings
intersection, the query shape a search engine answers from a
term-bucketed inverted index without touching raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.text import tokens


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, p, w): 0-based token-position postings. At scale this is a
    persisted table bucketed by ``w`` (the ingest posting-index
    pattern, operators/ingest.py) so a phrase query reads only its own
    terms' buckets; here it is derived in-plan from the scan."""
    return docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("t")
    ).select("id", F.posexplode("t").alias("p", "w"))


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase match via positional-postings intersection: the
    i-th phrase term's postings, shifted to the candidate phrase START
    (p − i), are equi-joined on (doc, start) across all terms — the
    classic phrase-query plan. Work is proportional to the MATCHED
    terms' posting lists (the term filters collapse the postings
    map-side before any join), never the corpus; each join is keyed on
    (doc, start) so candidates co-locate. Returns
    (id_col, n_matches, first_pos)."""
    if not phrase:
        raise ValueError("empty phrase")
    base = positional_postings(docs, id_col, text_col)
    cur = base.where(F.col("w") == phrase[0]).select("id", F.col("p").alias("s"))
    for i, w in enumerate(phrase[1:], 1):
        nxt = base.where(F.col("w") == w).select(
            "id", (F.col("p") - F.lit(i)).alias("s")
        )
        cur = cur.join(nxt, ["id", "s"])
    return cur.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("s").cast("int").alias("first_pos"),
    ).select(F.col("id").alias(id_col), "n_matches", "first_pos")
