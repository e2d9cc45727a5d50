"""Corpus-shaping queries a training-data pipeline runs before text
ever reaches a tokenizer: repetition filtering (Gopher-style), PII
redaction, and context-window chunking. All three stay JVM-side
(HOFs / regexp chains over projected token arrays — zero Python, zero
shuffles beyond one explode), so they run at scan speed over 100 TB.

Reference analog: the reference's per-record reshaping stage
(/root/reference/etl.py:239-294 — derive columns from raw text/ts
fields); these queries are the LLM-corpus versions of that stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.plans.parity import pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


CHUNK_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents
), starts AS (
  SELECT doc_id, t, UNNEST(range(0, len(t), 40)) AS start
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(start / 40 AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(t, start + 1, start + 50), ' ') AS chunk_text,
       CAST(LEAST(50, len(t) - start) AS INTEGER) AS n_chunk_tokens
FROM starts
ORDER BY doc_id, chunk_idx
"""


@register("chunk_documents", oracle=CHUNK_ORACLE, tags=("text", "llm", "training"))
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: 50-token chunks every 40
    tokens (10-token overlap), short tail unpadded. One projected
    token array + per-row HOFs + one posexplode — no shuffle, output
    co-partitioned with the input."""
    from data_lake_with_spark_spark.operators.training import chunk_documents as op

    docs = _t(spark, sf_dir, "documents")
    return op(docs, chunk_tokens=50, stride_tokens=40).orderBy(
        "doc_id", "chunk_idx"
    )


REPETITION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), m AS (
  SELECT doc_id,
    CASE WHEN len(t) > 0 THEN
      list_max(list_transform(list_distinct(t), d -> len(list_filter(t, x -> x = d)))) * 1.0 / len(t)
    ELSE 0.0 END AS top_frac,
    CASE WHEN len(t) >= 2 THEN
      1.0 - len(list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1)
    ELSE 0.0 END AS dup_frac
  FROM toks
)
SELECT doc_id,
       {top} AS top_token_frac,
       {dup} AS dup_bigram_frac,
       (top_frac <= 0.125 AND dup_frac <= 0.06) AS keep
FROM m
ORDER BY doc_id
""".format(top=pround_sql("top_frac", 6), dup=pround_sql("dup_frac", 6))


@register(
    "filter_gopher_repetition",
    oracle=REPETITION_ORACLE,
    tags=("text", "llm", "quality"),
)
def filter_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: single-most-frequent-token
    fraction and duplicate-bigram fraction per document, with the
    keep/drop verdict. Pure per-row HOFs over one projected token
    array — zero shuffles (the explode+groupBy relational form would
    shuffle every token twice; see functions/text.py)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TXT.tokens("text").alias("toks"))
    top = TXT.top_token_fraction(F.col("toks"))
    dup = TXT.duplicate_bigram_fraction(F.col("toks"))
    return (
        toked.select(
            "doc_id",
            pround(top, 6).alias("top_token_frac"),
            pround(dup, 6).alias("dup_bigram_frac"),
            ((top <= 0.125) & (dup <= 0.06)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# The corpus is synthetic word salad with no real PII, so the query
# plants deterministic PII (email / phone / IPv4 by doc_id mod 3) and
# then redacts it — the assertion is that the redaction chain finds
# and replaces ALL of it, verified cross-engine.
PII_ORACLE = r"""
WITH dirty AS (
  SELECT doc_id,
    text || ' contact user' || doc_id || '@example.com' ||
    CASE WHEN doc_id % 3 = 0 THEN ' call 555-867-5309' ELSE '' END ||
    CASE WHEN doc_id % 3 = 1 THEN ' from 192.168.' || (doc_id % 256) || '.1' ELSE '' END
    AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
     + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
     + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER)
    AS n_pii,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
FROM dirty
ORDER BY doc_id
"""


@register("pii_redact", oracle=PII_ORACLE, tags=("text", "llm", "quality"))
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: typed-placeholder redaction of emails, phone
    numbers, and IPv4 addresses via an ordered JVM regexp_replace
    chain, with the per-document match count. Patterns are restricted
    to the Java-regex ∩ RE2 dialect so the oracle runs them verbatim."""
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" call 555-867-5309")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 3 == 1,
                F.concat(
                    F.lit(" from 192.168."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return (
        dirty.select(
            "doc_id",
            TXT.pii_match_count("text").cast("int").alias("n_pii"),
            TXT.redact_pii("text").alias("redacted"),
        )
        .orderBy("doc_id")
    )


VOCAB_OOV_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), cnt AS (
  SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
), vocab AS (
  SELECT tok FROM cnt ORDER BY n DESC, tok ASC LIMIT 256
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       FLOOR(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*) * 1e6 + 0.5) / 1e6 AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register("text_vocab_oov", oracle=VOCAB_OOV_ORACLE, tags=("text", "llm", "vocab"))
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V vocabulary coverage: build the 256-token vocabulary by
    corpus frequency (ties → lexicographic, so the cut is total) and
    report each document's out-of-vocabulary token count and rate —
    the tokenizer-fit signal a corpus pipeline checks before training.
    Plan: one token explode + hash-agg for counts, a TakeOrdered
    (distributed top-V, never a single-partition sort) for the
    vocabulary, then a broadcast left join back over the exploded
    tokens with a map-side-combined per-doc aggregate."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(256)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.floor(F.col("n_oov") * 1.0 / F.col("n_tokens") * 1e6 + 0.5) / 1e6).alias(
                "oov_rate"
            ),
        )
        .orderBy("doc_id")
    )


CONTAINMENT_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       FLOOR(n_inter * 1.0 / sa.n_sh * 1e6 + 0.5) / 1e6 AS containment
FROM inter JOIN sizes sa ON a_id = sa.doc_id
WHERE n_inter * 1.0 / sa.n_sh >= 0.8
ORDER BY a_id, b_id
"""


@register("dedup_containment", oracle=CONTAINMENT_ORACLE, tags=("dedup", "text", "llm"))
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional 3-gram containment ≥ 0.8 — finds docs whose shingle
    set is (nearly) swallowed by another doc: quotes, excerpts, and
    boilerplate supersets that symmetric Jaccard under-scores. Runs the
    one-sided-prefix inverted-index join from operators/dedup.py:
    contained-side prefixes × container-side full postings, exact
    array_intersect verify."""
    from data_lake_with_spark_spark.operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    return DD.containment_pairs(docs, threshold=0.8, n=3).orderBy("a_id", "b_id")


# Okapi BM25 constants (standard defaults).
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ("table", "spark", "window")

BM25_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
), stats AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ('table', 'spark', 'window') GROUP BY term
), corpus AS (
  SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('table', 'spark', 'window') GROUP BY doc_id, term
), scored AS (
  SELECT tf.doc_id,
         SUM(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({_BM25_K1} + 1.0)
           / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dlen / avgdl))
         ) AS raw
  FROM tf
  JOIN stats USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, FLOOR(raw * 1e4 + 0.5) / 1e4 AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id ASC
LIMIT 25
"""


@register("text_bm25_topk", oracle=BM25_ORACLE, tags=("text", "llm", "search"))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance ranking for a fixed 3-term query — the
    lexical-retrieval scorer of a RAG/search stack. Plan: one token
    explode feeds per-doc lengths and per-(doc,term) tfs; the
    df/N/avgdl statistics are tiny (3 + 1 rows) and broadcast, so
    scoring is map-side over the tf rows and the ranking is a
    distributed TakeOrdered — no single-partition sort, no second
    scan of the corpus. avgdl division keeps the raw double identical
    on both engines; the output rounds at 1e-4."""
    docs = _t(spark, sf_dir, "documents")
    terms = list(_BM25_TERMS)
    tok = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    qtok = tok.where(F.col("term").isin(terms))
    stats = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dlen").alias("avgdl")
    )
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * (F.lit(_BM25_K1) + 1.0)
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * F.col("dlen") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(stats), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_part).alias("raw"))
        .select("doc_id", pround(F.col("raw"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(25)
    )


UNIGRAM_LOGPROB_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), cnt AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT SUM(c) AS t FROM cnt
), scored AS (
  SELECT doc_id,
         CAST(FLOOR((ln(CAST(c AS DOUBLE)) - ln(CAST(t AS DOUBLE))) * 1e6)
              AS BIGINT) AS lp_q
  FROM tok JOIN cnt USING (term) CROSS JOIN tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       FLOOR(SUM(lp_q) * 1.0 / COUNT(*) / 1e6 * 1e4 + 0.5) / 1e4
         AS mean_logprob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_unigram_logprob", oracle=UNIGRAM_LOGPROB_ORACLE, tags=("text", "llm", "quality"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet-style perplexity proxy
    quality filter): each document's mean ln P(token) under the
    corpus's own unigram distribution — rare-token-heavy docs score
    low. Per-token log-probabilities are quantized to exact integers
    (floor(ln p · 1e6)) BEFORE summation, so the per-doc aggregate is
    order-independent and bit-identical on any engine and any
    partitioning — the same decimal-moment trick the rolling z-score
    uses, applied to transcendentals. Plan: one explode, a token-count
    hash-agg, a shuffle join back on token (the count table broadcasts
    when small), map-side-combined per-doc sums."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TXT.tokens("text")).alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("t"))
    lp_q = F.floor(
        (F.log(F.col("c").cast("double")) - F.log(F.col("t").cast("double"))) * 1e6
    ).cast("long")
    return (
        tok.join(cnt, "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp_q.alias("lp_q"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lp_q").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.floor(F.col("s") * 1.0 / F.col("n_tokens") / 1e6 * 1e4 + 0.5) / 1e4
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


FUZZY_ORACLE = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS n FROM tok WHERE length(tok) >= 4
  GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 200
), variants AS (
  SELECT tok AS src,
         concat(substr(tok, 1, length(tok)//2 - 1),
                substr(tok, length(tok)//2 + 1, length(tok))) AS variant
  FROM vocab
)
SELECT v.variant, w.tok AS matched, CAST(levenshtein(v.variant, w.tok) AS INTEGER) AS dist
FROM (SELECT DISTINCT variant FROM variants) v
JOIN vocab w ON levenshtein(v.variant, w.tok) <= 1
ORDER BY v.variant, matched
"""


@register("join_fuzzy_editdist", oracle=FUZZY_ORACLE, tags=("join", "text", "fuzzy"))
def join_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance ≤ 1 join via deletion-neighborhood blocking
    (FastSS): each side expands to its 1-deletion key set plus itself,
    candidates come from the key equi-join (two strings at distance 1
    ALWAYS share a key: insert/delete → one side's deletion hits the
    other; substitution → same-position deletions collide), and the
    exact levenshtein verifies. The oracle brute-forces the same pairs
    with a cross join — feasible at 200 words; the blocked join is the
    form that survives a dictionary of 10^8. Query corpus: a typo'd
    variant (middle character dropped) of each top-200 corpus token,
    matched back against that vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(TXT.tokens("text")).alias("tok"))
        .where(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(200)
        .select("tok")
    )
    variants = vocab.select(
        F.expr(
            "concat(substring(tok, 1, length(tok) div 2 - 1),"
            "       substring(tok, length(tok) div 2 + 1, length(tok)))"
        ).alias("variant")
    ).distinct()
    del_keys = (
        "array_union(array(%(c)s), transform(sequence(1, length(%(c)s)),"
        " i -> concat(substring(%(c)s, 1, i - 1),"
        "             substring(%(c)s, i + 1, length(%(c)s)))))"
    )
    vkeys = variants.select(
        "variant", F.explode(F.expr(del_keys % {"c": "variant"})).alias("k")
    )
    wkeys = vocab.select(
        "tok", F.explode(F.expr(del_keys % {"c": "tok"})).alias("k")
    )
    return (
        vkeys.join(wkeys, "k")
        .select("variant", F.col("tok").alias("matched"))
        .distinct()
        .where(F.levenshtein("variant", "matched") <= 1)
        .select(
            "variant",
            "matched",
            F.levenshtein("variant", "matched").cast("int").alias("dist"),
        )
        .orderBy("variant", "matched")
    )


RAG_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), starts AS (
  SELECT doc_id, t, UNNEST(range(0, len(t), 40)) AS start
  FROM toks WHERE len(t) > 0
), chunks AS (
  SELECT doc_id, CAST(start / 40 AS INTEGER) AS chunk_idx,
         list_slice(t, start + 1, start + 50) AS ctoks
  FROM starts
), ctok AS (
  SELECT doc_id, chunk_idx, unnest(ctoks) AS tok FROM chunks
), emb AS (
  SELECT doc_id, chunk_idx, d.dim,
         SUM(CAST(CAST('0x' || substring(md5(tok || '#e' || d.dim), 1, 8) AS BIGINT)
                  % 1001 AS BIGINT) - 500) AS v
  FROM ctok CROSS JOIN (SELECT UNNEST(range(8)) AS dim) d
  GROUP BY doc_id, chunk_idx, d.dim
), q AS (
  SELECT doc_id AS q_doc, chunk_idx AS q_chunk, dim, v FROM emb
  WHERE doc_id < 5 AND chunk_idx = 0
), c AS (
  SELECT doc_id AS c_doc, chunk_idx AS c_chunk, dim, v FROM emb
  WHERE doc_id >= 20
), dots AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, SUM(q.v * c.v) AS dot
  FROM q JOIN c USING (dim) GROUP BY q_doc, q_chunk, c_doc, c_chunk
), qn AS (
  SELECT q_doc, q_chunk, SUM(v * v) AS qq FROM q GROUP BY q_doc, q_chunk
), cn AS (
  SELECT c_doc, c_chunk, SUM(v * v) AS cc FROM c GROUP BY c_doc, c_chunk
), scored AS (
  SELECT q_doc, c_doc, c_chunk,
         FLOOR(CAST(dot AS DOUBLE) / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM dots JOIN qn USING (q_doc, q_chunk) JOIN cn USING (c_doc, c_chunk)
  WHERE qq > 0 AND cc > 0
)
SELECT q_doc, c_doc, c_chunk, CAST(rnk AS INTEGER) AS rank, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_doc
                                   ORDER BY score DESC, c_doc ASC, c_chunk ASC) AS rnk
      FROM scored)
WHERE rnk <= 3
ORDER BY q_doc, rank
"""


def _rag_chunk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, dim, v) — 8-dim bag-of-hashed-tokens chunk
    embeddings over 50/40-overlap chunks. Integer components from a
    portable md5 hash family, so the embeddings are bit-identical on
    any engine (shared by the brute-force and IVF RAG variants and
    their oracles)."""
    from data_lake_with_spark_spark.operators.training import chunk_documents as chunk_op

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_op(docs, chunk_tokens=50, stride_tokens=40)
    ctok = chunks.select(
        "doc_id", "chunk_idx", F.explode(TXT.tokens("chunk_text")).alias("tok")
    )
    dims = F.array(*[F.lit(d) for d in range(8)])
    tok_dim = ctok.select(
        "doc_id", "chunk_idx", "tok", F.explode(dims).alias("dim")
    )
    hval = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("tok"), F.lit("#e"), F.col("dim"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1001
        - 500
    )
    return tok_dim.groupBy("doc_id", "chunk_idx", "dim").agg(F.sum(hval).alias("v"))


@register("rag_chunk_retrieval", oracle=RAG_ORACLE, tags=("vector", "text", "llm", "rag", "pipeline"))
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG ingest+retrieve composition: context-window
    chunking (50/40 overlap, the chunk_documents operator) → 8-dim
    bag-of-hashed-tokens chunk embeddings (portable md5 hash family,
    integer components, so embeddings are bit-identical on any engine)
    → exact cosine top-3 corpus chunks per query chunk. The dot
    products are dim-join integer sums — order-independent, no float
    accumulation anywhere before the final rounded cosine. Plan: the
    query side (5 chunks) broadcasts; the corpus side is one scan +
    map-side-combined per-(query,chunk) partial sums; ranking is a
    per-query window over ≤|corpus| rows. The 100 TB upgrade swaps the
    brute-force stage for the IVF layout (vector_topk_ivf) unchanged
    upstream."""
    emb = _rag_chunk_embeddings(spark, sf_dir)
    q = (
        emb.where((F.col("doc_id") < 5) & (F.col("chunk_idx") == 0))
        .select(
            F.col("doc_id").alias("q_doc"),
            F.col("chunk_idx").alias("q_chunk"),
            "dim",
            F.col("v").alias("qv"),
        )
    )
    c = emb.where(F.col("doc_id") >= 20).select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_idx").alias("c_chunk"),
        "dim",
        F.col("v").alias("cv"),
    )
    dots = (
        c.join(F.broadcast(q), "dim")
        .groupBy("q_doc", "q_chunk", "c_doc", "c_chunk")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("dot"))
    )
    qn = q.groupBy("q_doc", "q_chunk").agg(F.sum(F.col("qv") * F.col("qv")).alias("qq"))
    cn = c.groupBy("c_doc", "c_chunk").agg(F.sum(F.col("cv") * F.col("cv")).alias("cc"))
    from pyspark.sql import Window

    score = F.floor(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("qq").cast("double")) * F.sqrt(F.col("cc").cast("double")))
        * 1e6
        + 0.5
    ) / 1e6
    scored = (
        dots.join(F.broadcast(qn), ["q_doc", "q_chunk"])
        .join(cn, ["c_doc", "c_chunk"])
        .where((F.col("qq") > 0) & (F.col("cc") > 0))
        .select("q_doc", "c_doc", "c_chunk", score.alias("score"))
    )
    w = Window.partitionBy("q_doc").orderBy(
        F.desc("score"), F.asc("c_doc"), F.asc("c_chunk")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("q_doc", "c_doc", "c_chunk", F.col("rank").cast("int").alias("rank"), "score")
        .orderBy("q_doc", "rank")
    )


RAG_IVF_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), starts AS (
  SELECT doc_id, t, UNNEST(range(0, len(t), 40)) AS start
  FROM toks WHERE len(t) > 0
), chunks AS (
  SELECT doc_id, CAST(start / 40 AS INTEGER) AS chunk_idx,
         list_slice(t, start + 1, start + 50) AS ctoks
  FROM starts
), ctok AS (
  SELECT doc_id, chunk_idx, unnest(ctoks) AS tok FROM chunks
), emb AS (
  SELECT doc_id, chunk_idx, d.dim,
         SUM(CAST(CAST('0x' || substring(md5(tok || '#e' || d.dim), 1, 8) AS BIGINT)
                  % 1001 AS BIGINT) - 500) AS v
  FROM ctok CROSS JOIN (SELECT UNNEST(range(8)) AS dim) d
  GROUP BY doc_id, chunk_idx, d.dim
), q AS (
  SELECT doc_id AS q_doc, chunk_idx AS q_chunk, dim, v FROM emb
  WHERE doc_id < 5 AND chunk_idx = 0
), c AS (
  SELECT doc_id AS c_doc, chunk_idx AS c_chunk, dim, v FROM emb
  WHERE doc_id >= 20
), lm_keys AS (
  SELECT c_doc, c_chunk,
         CAST(ROW_NUMBER() OVER (ORDER BY c_doc, c_chunk) - 1 AS BIGINT) AS lm_id
  FROM (SELECT DISTINCT c_doc, c_chunk FROM c ORDER BY c_doc, c_chunk LIMIT 8)
), lm AS (
  SELECT lm_id, dim, v AS lv FROM lm_keys JOIN c USING (c_doc, c_chunk)
), cass AS (
  SELECT c_doc, c_chunk, lm_id AS list_id FROM (
    SELECT c.c_doc, c.c_chunk, lm.lm_id,
           ROW_NUMBER() OVER (PARTITION BY c.c_doc, c.c_chunk
                              ORDER BY SUM((c.v - lm.lv) * (c.v - lm.lv)), lm.lm_id) AS rn
    FROM c JOIN lm USING (dim)
    GROUP BY c.c_doc, c.c_chunk, lm.lm_id
  ) WHERE rn = 1
), probes AS (
  SELECT q_doc, q_chunk, lm_id AS list_id FROM (
    SELECT q.q_doc, q.q_chunk, lm.lm_id,
           ROW_NUMBER() OVER (PARTITION BY q.q_doc, q.q_chunk
                              ORDER BY SUM((q.v - lm.lv) * (q.v - lm.lv)), lm.lm_id) AS rn
    FROM q JOIN lm USING (dim)
    GROUP BY q.q_doc, q.q_chunk, lm.lm_id
  ) WHERE rn <= 2
), cand AS (
  SELECT DISTINCT p.q_doc, p.q_chunk, a.c_doc, a.c_chunk
  FROM probes p JOIN cass a ON p.list_id = a.list_id
), dots AS (
  SELECT n.q_doc, n.q_chunk, n.c_doc, n.c_chunk, SUM(q.v * c.v) AS dot
  FROM cand n
  JOIN q ON q.q_doc = n.q_doc AND q.q_chunk = n.q_chunk
  JOIN c ON c.c_doc = n.c_doc AND c.c_chunk = n.c_chunk AND c.dim = q.dim
  GROUP BY n.q_doc, n.q_chunk, n.c_doc, n.c_chunk
), qn AS (
  SELECT q_doc, q_chunk, SUM(v * v) AS qq FROM q GROUP BY q_doc, q_chunk
), cn AS (
  SELECT c_doc, c_chunk, SUM(v * v) AS cc FROM c GROUP BY c_doc, c_chunk
), scored AS (
  SELECT q_doc, c_doc, c_chunk,
         FLOOR(CAST(dot AS DOUBLE) / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM dots JOIN qn USING (q_doc, q_chunk) JOIN cn USING (c_doc, c_chunk)
  WHERE qq > 0 AND cc > 0
)
SELECT q_doc, c_doc, c_chunk, CAST(rnk AS INTEGER) AS rank, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_doc
                                   ORDER BY score DESC, c_doc ASC, c_chunk ASC) AS rnk
      FROM scored)
WHERE rnk <= 3
ORDER BY q_doc, rank
"""


@register(
    "rag_chunk_retrieval_ivf",
    oracle=RAG_IVF_ORACLE,
    tags=("vector", "text", "llm", "rag", "ivf", "pipeline"),
)
def rag_chunk_retrieval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval through the IVF physical layout — the 100 TB scale
    path the brute-force variant's docstring promises. Same chunk →
    embed pipeline (_rag_chunk_embeddings), then:

    - coarse quantizer: 8 LANDMARK centroids — the embeddings of the
      first 8 corpus chunks by (doc_id, chunk_idx). Deterministic and
      SQL-expressible, so unlike KMeans-IVF the whole approximate
      pipeline has an exact DuckDB oracle; landmark (random-sample)
      centroids are a standard IVF initialization.
    - corpus chunks are assigned to their nearest landmark by INTEGER
      L2² (exact on any engine) and written hive-partitioned by
      list_id — the write_ivf_layout pattern at chunk granularity.
    - each query probes its 2 nearest lists; the probed ids (≤10 ints,
      driver-trivial at any scale) become a literal isin partition
      filter, so only probed partition dirs are listed and scanned
      (plan-asserted in tests/test_plan_quality.py).
    - scoring inside probed lists only: integer dot products, rounded
      cosine, per-query top-3 with deterministic tie-breaks.
    """
    import tempfile

    from pyspark.sql import Window

    emb = _rag_chunk_embeddings(spark, sf_dir)
    dim8 = F.sequence(F.lit(0), F.lit(7))
    vecs = (
        emb.groupBy("doc_id", "chunk_idx")
        .agg(F.map_from_entries(F.collect_list(F.struct("dim", "v"))).alias("m"))
        .select(
            "doc_id",
            "chunk_idx",
            F.transform(
                dim8, lambda d: F.coalesce(F.col("m")[d], F.lit(0).cast("bigint"))
            ).alias("vec"),
        )
    )

    def l2sq(a: str, b: str):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    def dotp(a: str, b: str):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    cvec = vecs.where(F.col("doc_id") >= 20).select(
        F.col("doc_id").alias("c_doc"), F.col("chunk_idx").alias("c_chunk"), "vec"
    )
    # 8 landmark vectors — a bounded driver collect (same contract as
    # the probed-list-id collect in ivf_topk_from_layout)
    lm_rows = cvec.orderBy("c_doc", "c_chunk").limit(8).collect()
    lm = spark.createDataFrame(
        [(i, list(r["vec"])) for i, r in enumerate(lm_rows)],
        "lm_id bigint, lvec array<bigint>",
    )

    w_assign = Window.partitionBy("c_doc", "c_chunk").orderBy("d2", "lm_id")
    assigned = (
        cvec.crossJoin(F.broadcast(lm))
        .withColumn("d2", l2sq("vec", "lvec"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("c_doc", "c_chunk", "vec", F.col("lm_id").alias("list_id"))
    )
    scratch = tempfile.mkdtemp(prefix="dlws_rag_ivf_")
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(scratch)

    qvec = vecs.where((F.col("doc_id") < 5) & (F.col("chunk_idx") == 0)).select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_idx").alias("q_chunk"),
        F.col("vec").alias("qvec"),
    )
    w_probe = Window.partitionBy("q_doc", "q_chunk").orderBy("d2", "lm_id")
    probes = (
        qvec.crossJoin(F.broadcast(lm))
        .withColumn("d2", l2sq("qvec", "lvec"))
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= 2)
        .select("q_doc", "q_chunk", "qvec", F.col("lm_id").alias("list_id"))
    )
    probed = sorted({int(r["list_id"]) for r in probes.select("list_id").distinct().collect()})

    layout = spark.read.parquet(scratch).where(F.col("list_id").isin(probed))
    cand = layout.join(F.broadcast(probes), "list_id")
    qq = dotp("qvec", "qvec")
    cc = dotp("vec", "vec")
    score = F.floor(
        dotp("qvec", "vec").cast("double")
        / (F.sqrt(qq.cast("double")) * F.sqrt(cc.cast("double")))
        * 1e6
        + 0.5
    ) / 1e6
    scored = cand.where((qq > 0) & (cc > 0)).select(
        "q_doc", "c_doc", "c_chunk", score.alias("score")
    )
    w_rank = Window.partitionBy("q_doc").orderBy(
        F.desc("score"), F.asc("c_doc"), F.asc("c_chunk")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= 3)
        .select("q_doc", "c_doc", "c_chunk", F.col("rank").cast("int").alias("rank"), "score")
        .orderBy("q_doc", "rank")
    )


BOILERPLATE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id,
         list_transform(range(0, len(t) - 7),
                        i -> array_to_string(list_slice(t, i + 1, i + 8), ' ')) AS gs
  FROM toks WHERE len(t) >= 8
), pos AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
), df AS (
  SELECT g, COUNT(DISTINCT doc_id) AS n_docs FROM pos GROUP BY g
), boiler AS (
  SELECT g FROM df WHERE n_docs >= 2
), per_doc AS (
  SELECT p.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
  FROM pos p LEFT JOIN boiler b ON p.g = b.g
  GROUP BY p.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(d.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(d.n_boiler, 0) AS BIGINT) AS n_boiler,
       CASE WHEN COALESCE(d.n_grams, 0) > 0
            THEN FLOOR(d.n_boiler * 1.0 / d.n_grams * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS boiler_frac,
       (COALESCE(d.n_boiler, 0) * 1.0 <= COALESCE(d.n_grams, 0) * 0.5) AS keep
FROM toks t LEFT JOIN per_doc d ON t.doc_id = d.doc_id
ORDER BY t.doc_id
"""


@register(
    "filter_boilerplate_crossdoc",
    oracle=BOILERPLATE_ORACLE,
    tags=("text", "llm", "quality", "dedup"),
)
def filter_boilerplate_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate gate (the CCNet/RefinedWeb sibling of
    within-doc repetition filtering): an 8-gram POSITION is boilerplate
    when its gram occurs in ≥2 distinct documents; documents are
    dropped when more than half their positions are boilerplate —
    catching templated/duplicated spans that survive exact dedup.

    Plan: per-position grams via one HOF over the projected token
    array (no per-token shuffle), document frequency as one hash-agg
    over distinct (gram, doc) pairs, then a gram-keyed join back. At
    100 TB the df table is the big intermediate — it shuffles hashed
    grams once and would be the thing to persist as a companion table
    (same pattern as the ingest shingle column)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TXT.tokens("text").alias("toks"))
    grams = toked.where(F.size("toks") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 8),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 8)),
            )
        ).alias("g"),
    )
    df_counts = grams.distinct().groupBy("g").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    boiler = df_counts.where(F.col("n_docs") >= 2).select("g")
    per_doc = (
        grams.join(boiler.withColumn("_b", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_b").isNotNull(), 1).otherwise(0)).alias("n_boiler"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.floor(F.col("n_boiler") / F.col("n_grams") * 1e6 + 0.5) / 1e6,
            )
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
            (
                F.coalesce("n_boiler", F.lit(0))
                <= F.coalesce("n_grams", F.lit(0)) * 0.5
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# Literal weight table for the hashed-feature linear classifier: 64
# buckets, weights deterministic from the bucket index (a stand-in for
# trained coefficients — the ARCHITECTURE is the point: model-based
# filtering as pure column math). Shared between the Spark expressions
# and the generated SQL.
QCLF_BUCKETS = 64
QCLF_WEIGHTS = [
    round((((i * 2_654_435_761) % 1000) / 1000.0 - 0.5) * 2.0, 6)
    for i in range(QCLF_BUCKETS)
]
QCLF_BIAS = 0.1
_QCLF_W_SQL = ", ".join(f"({i}, {w})" for i, w in enumerate(QCLF_WEIGHTS))

QCLF_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), tf AS (
  SELECT doc_id, len(t) AS n_toks,
         CAST('0x' || substring(md5(unnest(t)), 1, 8) AS BIGINT) % 64 AS bucket
  FROM toks WHERE len(t) > 0
), feats AS (
  SELECT doc_id, bucket, ANY_VALUE(n_toks) AS n_toks, COUNT(*) AS cnt
  FROM tf GROUP BY doc_id, bucket
), dotp AS (
  SELECT f.doc_id,
         SUM((f.cnt * 1.0 / f.n_toks) * w.wt) AS z
  FROM feats f JOIN (VALUES {weights}) AS w(bucket, wt) ON f.bucket = w.bucket
  GROUP BY f.doc_id
)
SELECT d.doc_id,
       FLOOR((1.0 / (1.0 + exp(-(COALESCE(p.z, 0) + 0.1)))) * 1e6 + 0.5) / 1e6 AS score,
       (1.0 / (1.0 + exp(-(COALESCE(p.z, 0) + 0.1))) >= 0.5) AS keep
FROM documents d LEFT JOIN dotp p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
""".replace("{weights}", _QCLF_W_SQL)


@register(
    "quality_classifier_score",
    oracle=QCLF_ORACLE,
    tags=("text", "llm", "quality", "model"),
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fasttext/DCLM-classifier
    stage) as pure column math: tokens hash into 64 buckets (md5 —
    portable), per-doc term frequencies dot a LITERAL weight vector,
    sigmoid, threshold. No Python, no model server — a linear scorer
    over hashed features runs at scan speed on 100 TB, and swapping in
    real trained coefficients changes only the literals. Fully oracled
    (same weights embedded in the SQL)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TXT.tokens("text").alias("t"))
    tf = (
        toked.where(F.size("t") > 0)
        .select("doc_id", F.size("t").alias("n_toks"), F.explode("t").alias("tok"))
        .select(
            "doc_id",
            "n_toks",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
                % QCLF_BUCKETS
            ).alias("bucket"),
        )
    )
    feats = tf.groupBy("doc_id", "bucket").agg(
        F.any_value("n_toks").alias("n_toks"), F.count(F.lit(1)).alias("cnt")
    )
    weights = F.array(*[F.lit(w) for w in QCLF_WEIGHTS])
    z = feats.select(
        "doc_id",
        ((F.col("cnt") / F.col("n_toks")) * F.element_at(weights, F.col("bucket").cast("int") + 1)).alias("zi"),
    ).groupBy("doc_id").agg(F.sum("zi").alias("z"))
    sig = 1.0 / (1.0 + F.exp(-(F.coalesce(F.col("z"), F.lit(0.0)) + F.lit(QCLF_BIAS))))
    return (
        docs.select("doc_id")
        .join(z, "doc_id", "left")
        .select(
            "doc_id",
            (F.floor(sig * 1e6 + 0.5) / 1e6).alias("score"),
            (sig >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


PHRASE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), pos AS (
  SELECT doc_id, UNNEST(range(len(t))) AS p, UNNEST(t) AS w FROM toks
), p0 AS (
  SELECT doc_id, p AS s FROM pos WHERE w = 'table'
), p1 AS (
  SELECT doc_id, p - 1 AS s FROM pos WHERE w = 'value'
), m AS (
  SELECT a.doc_id, a.s FROM p0 a JOIN p1 b USING (doc_id, s)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(s) AS INTEGER) AS first_pos
FROM m GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "search_phrase_positional",
    oracle=PHRASE_ORACLE,
    tags=("text", "search", "join"),
)
def search_phrase_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("table value") by positional-postings
    intersection — term postings shifted to the candidate phrase start
    and equi-joined on (doc, start). The search-engine phrase plan:
    work scales with the phrase terms' posting lists, not the corpus,
    and against the persisted term-bucketed posting table the probe
    reads only two buckets. See operators/search.py:phrase_search."""
    from data_lake_with_spark_spark.operators.search import phrase_search

    docs = _t(spark, sf_dir, "documents")
    return phrase_search(docs, ["table", "value"]).orderBy("doc_id")


RRF_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
), stats AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ('table', 'spark', 'window') GROUP BY term
), corpus AS (
  SELECT COUNT(*) AS n_docs, AVG(dlen) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('table', 'spark', 'window') GROUP BY doc_id, term
), bm AS (
  SELECT tf.doc_id,
         SUM(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * ({_BM25_K1} + 1.0)
           / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dlen / avgdl))
         ) AS raw
  FROM tf
  JOIN stats USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
), lex AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY FLOOR(raw * 1e4 + 0.5) / 1e4 DESC,
                              doc_id ASC) AS r
    FROM bm
  ) WHERE r <= 25
), q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id != 0
), semscored AS (
  SELECT vec_id AS doc_id,
         FLOOR((list_dot_product(qe, ce)
                / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))) * 1e6 + 0.5) / 1e6 AS score
  FROM c, q
), sem AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r
    FROM semscored
  ) WHERE r <= 25
), fused AS (
  SELECT doc_id, CAST(FLOOR(1e9 / (60 + r)) AS BIGINT) AS contrib FROM lex
  UNION ALL
  SELECT doc_id, CAST(FLOOR(1e9 / (60 + r)) AS BIGINT) AS contrib FROM sem
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lists,
       CAST(SUM(contrib) AS BIGINT) AS rrf_scaled
FROM fused GROUP BY doc_id
ORDER BY rrf_scaled DESC, doc_id
LIMIT 20
"""


@register(
    "search_hybrid_rrf",
    oracle=RRF_ORACLE,
    tags=("text", "vector", "llm", "search", "rag"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by RECIPROCAL RANK FUSION (Cormack et al.
    2009) — the standard way a RAG stack merges lexical and semantic
    rankings without score calibration: fuse BM25 top-25 (the fixed
    3-term query, reusing text_bm25_topk's plan) with cosine top-25
    against the vec_id=0 query embedding, score = Σ floor(1e9/(60+r))
    over the lists each doc appears in — ranks only, so the fusion is
    pure INTEGER arithmetic and fully value-verified even though the
    upstream scores are floats. Both input rankings are k-bounded
    (k=25), so the fusion stage touches 50 rows regardless of corpus
    size; at 100 TB the cost stays in the two retrieval legs, which
    keep their own documented scale shapes."""
    from pyspark.sql import Window

    from data_lake_with_spark_spark.operators import similarity as SIM2

    lex = text_bm25_topk(spark, sf_dir)
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex_r = lex.withColumn("r", F.row_number().over(w_lex)).select("doc_id", "r")
    emb = _t(spark, sf_dir, "embeddings")
    sem = SIM2.brute_force_topk(
        emb, emb.where(F.col("vec_id") == 0), k=25
    )
    sem_r = sem.select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r"))
    fused = lex_r.unionByName(sem_r).withColumn(
        "contrib", F.expr("CAST(FLOOR(1e9 / (60 + r)) AS BIGINT)")
    )
    return (
        fused.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
            F.sum("contrib").cast("bigint").alias("rrf_scaled"),
        )
        .orderBy(F.desc("rrf_scaled"), "doc_id")
        .limit(20)
    )


VOCAB_COVERAGE_ORACLE = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
), tf AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT SUM(c) AS t, COUNT(*) AS n_vocab FROM tf
), ranked AS (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS r,
         SUM(c) OVER (ORDER BY c DESC, term ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM tf
), p AS (
  SELECT * FROM (VALUES (50), (90), (99)) AS v(pct)
)
SELECT p.pct,
       CAST(MIN(ranked.r) AS BIGINT) AS n_tokens,
       CAST(tot.t AS BIGINT) AS total_tokens,
       CAST(tot.n_vocab AS BIGINT) AS vocab_size
FROM ranked CROSS JOIN tot CROSS JOIN p
WHERE ranked.cum * 100 >= p.pct * tot.t
GROUP BY p.pct, tot.t, tot.n_vocab
ORDER BY p.pct
"""


@register(
    "text_vocab_coverage",
    oracle=VOCAB_COVERAGE_ORACLE,
    tags=("text", "llm", "vocab", "stats"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve of the corpus vocabulary: the smallest
    number of most-frequent token types covering 50/90/99% of all
    token OCCURRENCES — the statistic that sizes a tokenizer vocab
    (how much of the stream the top-k types absorb) and flags
    boilerplate-heavy corpora (suspiciously low 90% counts). Integer
    end to end: cum·100 ≥ pct·total cross-multiplication, no
    division. The heavy agg is the term-frequency hash-agg over the
    corpus (map-side combinable); the ranking window runs on the
    VOCABULARY aggregate — orders of magnitude smaller than the
    corpus, and if vocab itself outgrew one partition the band-carry
    two-level form (segment_abc_distributed) drops in unchanged."""
    tok = _t(spark, sf_dir, "documents").select(
        F.explode(TXT.tokens("text")).alias("term")
    )
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tf.agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_vocab")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = tf.select(
        "c",
        F.row_number().over(w).alias("r"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    pcts = tok.sparkSession.createDataFrame([(50,), (90,), (99,)], "pct int")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .where(F.col("cum") * 100 >= F.col("pct") * F.col("t"))
        .groupBy("pct", "t", "n_vocab")
        .agg(F.min("r").cast("bigint").alias("n_tokens"))
        .select(
            "pct",
            "n_tokens",
            F.col("t").cast("bigint").alias("total_tokens"),
            F.col("n_vocab").cast("bigint").alias("vocab_size"),
        )
        .orderBy("pct")
    )


BIGRAM_LOGPROB_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents
), uni AS (
  SELECT unnest(l) AS term FROM tok
), voc AS (
  SELECT COUNT(DISTINCT term) AS v FROM uni
), bi AS (
  SELECT doc_id, l[i + 1] AS w1, l[i + 2] AS w2
  FROM tok, UNNEST(range(len(l) - 1)) AS u(i)
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1
), scored AS (
  SELECT doc_id,
         CAST(FLOOR((ln(CAST(c12 + 1 AS DOUBLE)) - ln(CAST(c1 + v AS DOUBLE)))
                    * 1e6) AS BIGINT) AS lp_q
  FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN voc
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       FLOOR(SUM(lp_q) * 1.0 / COUNT(*) / 1e6 * 1e4 + 0.5) / 1e4
         AS mean_logprob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "text_bigram_logprob", oracle=BIGRAM_LOGPROB_ORACLE, tags=("text", "llm", "quality")
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with Laplace smoothing — the
    context-aware upgrade of text_unigram_logprob's perplexity-proxy
    quality filter: each document's mean ln P(w₂|w₁) under the
    corpus's own bigram counts, P = (c(w₁,w₂)+1)/(c(w₁·)+V).
    Scrambled or boilerplate-stitched text keeps plausible unigrams
    but rare transitions, so it scores low here while passing the
    unigram screen. Same transcendental-portability trick: per-bigram
    log-probs quantized to integers (floor(ln·1e6)) BEFORE summation
    — order-independent, bit-identical on any engine/partitioning.
    Plan: bigrams via two array slices zipped (no self-join), one
    (w₁,w₂) hash-agg + one w₁ hash-agg, a join back on the bigram
    key, map-side-combined per-doc sums; vocabulary size is a 1-row
    broadcast."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TXT.tokens("text").alias("ts"))
    sliced = toks.where(F.size("ts") >= 2).select(
        "doc_id",
        F.slice("ts", 1, F.size("ts") - 1).alias("a"),
        F.slice("ts", 2, F.size("ts") - 1).alias("b"),
    )
    bi = sliced.select(
        "doc_id", F.explode(F.arrays_zip("a", "b")).alias("bg")
    ).select(
        "doc_id", F.col("bg.a").alias("w1"), F.col("bg.b").alias("w2")
    )
    voc = toks.select(F.explode("ts").alias("term")).agg(
        F.count_distinct("term").alias("v")
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    lp_q = F.floor(
        (
            F.log((F.col("c12") + F.lit(1)).cast("double"))
            - F.log((F.col("c1") + F.col("v")).cast("double"))
        )
        * 1e6
    ).cast("long")
    return (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", lp_q.alias("lp_q"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp_q").alias("s"))
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.floor(F.col("s") * 1.0 / F.col("n_bigrams") / 1e6 * 1e4 + 0.5)
                / 1e4
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


CHAR_ENTROPY_ORACLE = """
WITH ch AS (
  SELECT doc_id, substr(text, i + 1, 1) AS c
  FROM documents, UNNEST(range(length(text))) AS u(i)
), cnt AS (
  SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS k FROM ch GROUP BY doc_id, c
), nd AS (
  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM cnt GROUP BY doc_id
), scored AS (
  SELECT cnt.doc_id, cnt.k,
         CAST(FLOOR((ln(CAST(cnt.k AS DOUBLE)) - ln(CAST(nd.n AS DOUBLE)))
                    * 1e6) AS BIGINT) AS lp
  FROM cnt JOIN nd USING (doc_id)
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_chars_counted,
       FLOOR((-(CAST(SUM(k * lp) AS BIGINT) * 1.0 / SUM(k) / 1e6)) * 10000.0 + 0.5)
         / 10000.0 AS entropy_nats
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "text_char_entropy", oracle=CHAR_ENTROPY_ORACLE, tags=("text", "llm", "quality")
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (nats) -- the
    classic gibberish/compressibility quality signal (low entropy =
    repeated filler, high = encoding noise): H = -Sigma p ln p over
    the doc's character distribution, computed with per-character
    log-probabilities quantized to integers BEFORE the weighted sum
    (the transcendental-portability discipline), so the entropy is
    bit-identical on any engine and partitioning. Plan: one
    char-position explode + per-(doc, char) hash-agg + per-doc
    rollup; nothing shuffles more than the character histogram."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # substr with a per-element dynamic start needs the expr form
    # (python F.substring takes plain ints for pos/len)
    ch = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, length(text) - 1), i -> substr(text, i + 1, 1))")
        ).alias("c"),
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    nd = cnt.groupBy("doc_id").agg(F.sum("k").cast("bigint").alias("n"))
    lp = F.floor(
        (F.log(F.col("k").cast("double")) - F.log(F.col("n").cast("double"))) * 1e6
    ).cast("long")
    scored = cnt.join(nd, "doc_id").select("doc_id", "k", lp.alias("lp"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_chars_counted"),
            (
                F.floor(
                    (
                        -(
                            F.sum(F.col("k") * F.col("lp")).cast("bigint")
                            * 1.0
                            / F.sum("k")
                            / 1e6
                        )
                    )
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )
