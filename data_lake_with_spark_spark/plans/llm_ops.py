"""LLM-data-pipeline queries (SURVEY §2.10 E1-E5) over documents +
embeddings: text analysis, dedup family, vector similarity search,
multimodal plumbing.

Approximate operators built on engine-native hashing (xxhash64
MinHash/SimHash, seeded-numpy LSH/IVF/PQ) are rows-only + pytest
property tests; their *_portable twins swap in md5-derived hash
families so the same approximate pipelines are bit-reproducible in SQL
and fully oracled. Exact operators ship full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.operators import dedup as DD
from data_lake_with_spark_spark.operators import multimodal as MM
from data_lake_with_spark_spark.operators import quantize as QZ
from data_lake_with_spark_spark.operators import similarity as SIM
from data_lake_with_spark_spark.plans.parity import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    pround,
    pround_sql,
)
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# E4 — text analysis
# ---------------------------------------------------------------------------

TEXT_STATS_ORACLE = r"""
SELECT
  doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
  CAST(length(text) AS INTEGER)                               AS n_chars_computed,
  FLOOR((length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0 / length(text)) * 1e6 + 0.5) / 1e6 AS punct_ratio
FROM documents
ORDER BY doc_id
"""


@register("text_stats", oracle=TEXT_STATS_ORACLE, tags=("text", "llm"))
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char/punctuation statistics (E4)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            TXT.token_count("text").alias("n_tokens"),
            F.length("text").alias("n_chars_computed"),
            (F.floor(TXT.punct_ratio("text") * 1e6 + 0.5) / 1e6).alias("punct_ratio"),
        )
        .orderBy("doc_id")
    )


BPE_ORACLE = r"""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS INTEGER)
    AS n_bpe_tokens
FROM documents
ORDER BY doc_id
"""


@register("text_token_count_bpe", oracle=BPE_ORACLE, tags=("text", "llm"))
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish (regex pre-tokenizer) token counting (E4)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.size(TXT.bpe_ish_tokens("text")).alias("n_bpe_tokens")
        )
        .orderBy("doc_id")
    )


LANG_PROFILE_ORACLE = rf"""
SELECT
  lang,
  COUNT(*)                    AS n_docs,
  {davg_sql('n_chars')}      AS avg_chars,
  FLOOR((CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS DOUBLE) / COUNT(*)) * 1e4 + 0.5) / 1e4 AS avg_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("text_lang_profile", oracle=LANG_PROFILE_ORACLE, tags=("text", "llm", "agg"))
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language tag."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("n_chars")).alias("avg_chars"),
            (F.floor(F.sum(TXT.token_count("text")).cast("double") / F.count(F.lit(1)) * 1e4 + 0.5) / 1e4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


QUALITY_ORACLE = r"""
SELECT
  doc_id,
  FLOOR(((
    LEAST(length(text) / 400.0, 1.0)
    + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
    + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                   / length(text) * 4, 1.0))
  ) / 3.0) * 1e6 + 0.5) / 1e6 AS quality
FROM documents
ORDER BY doc_id
"""


@register("text_quality_score", oracle=QUALITY_ORACLE, tags=("text", "llm"))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score ∈ [0,1] (length/word/punct mix, E4)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.quality_score("text").alias("quality")).orderBy(
        "doc_id"
    )


FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents
ORDER BY doc_id
"""


@register("text_fingerprint", oracle=FINGERPRINT_ORACLE, tags=("text", "llm"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical md5 content fingerprint (E4) — the exact-dedup key."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.fingerprint("text").alias("fp")).orderBy("doc_id")


TOP_TOKENS_ORACLE = r"""
SELECT tok, COUNT(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok ASC
LIMIT 25
"""


@register("text_top_tokens", oracle=TOP_TOKENS_ORACLE, tags=("text", "llm", "agg"))
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies via explode (the lateral-view shape) —
    top 25 with deterministic tie-break."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TXT.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(25)
    )


READABILITY_ORACLE = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
         GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> length(trim(s)) > 0)), 1) AS n_sent
  FROM documents
), syl AS (
  SELECT doc_id, len(t) AS n_words, n_sent,
         list_sum(list_transform(
           t, w -> GREATEST(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1)
         )) AS n_syl
  FROM base
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sent AS BIGINT) AS n_sentences,
       CAST(n_syl AS BIGINT) AS n_syllables,
       FLOOR((206.835
              - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
              - 84.6 * (CAST(n_syl AS DOUBLE) / n_words)) * 1e4 + 0.5) / 1e4
         AS flesch
FROM syl ORDER BY doc_id
"""


@register(
    "text_readability",
    oracle=READABILITY_ORACLE,
    tags=("text", "llm", "quality"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (E4): words/sentence and
    syllables/word with the standard vowel-group syllable heuristic —
    a corpus-quality signal orthogonal to length/stopword ratios.
    Pure per-row HOF column math (tokens projected once, per the
    word_shingles_from_tokens perf note), zero shuffles before the
    presentation sort; fully oracled with portable rounding."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        TXT.tokens("text").alias("t"),
        F.greatest(
            F.size(
                F.filter(
                    F.split("text", r"[.!?]+"),
                    lambda s: F.length(F.trim(s)) > 0,
                )
            ),
            F.lit(1),
        ).alias("n_sent"),
    )
    syl = base.select(
        "doc_id",
        F.size("t").alias("n_words"),
        "n_sent",
        F.aggregate(
            F.transform(
                F.col("t"),
                lambda w: F.greatest(
                    F.size(
                        F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))
                    ),
                    F.lit(1),
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_syl"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sent"))
        - F.lit(84.6) * (F.col("n_syl").cast("double") / F.col("n_words"))
    )
    return syl.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sent").cast("bigint").alias("n_sentences"),
        F.col("n_syl").cast("bigint").alias("n_syllables"),
        (F.floor(flesch * 1e4 + F.lit(0.5)) / 1e4).alias("flesch"),
    ).orderBy("doc_id")


# The marker table is generated from functions/text.LANG_MARKERS so the
# oracle and the engine share one source of truth for the heuristic.
_LANG_VALUES = ", ".join(
    "('{lg}', [{ms}])".format(
        lg=lg, ms=", ".join(f"'{m}'" for m in ms)
    )
    for lg, ms in sorted(TXT.LANG_MARKERS.items())
)

LANGID_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_transform(string_split_regex(trim(text), '\s+'), t -> lower(t)) AS t
  FROM documents
), hits AS (
  SELECT doc_id, lang, h.lg,
         len(list_filter(t, x -> list_contains(h.markers, x))) AS n_hits
  FROM toks CROSS JOIN (VALUES {vals}) AS h(lg, markers)
), best AS (
  SELECT doc_id, lang, lg, n_hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lg ASC) AS rn,
         MAX(n_hits) OVER (PARTITION BY doc_id) AS mx
  FROM hits
)
SELECT doc_id, lang, CASE WHEN mx > 0 THEN lg ELSE 'und' END AS lang_guess
FROM best WHERE rn = 1
ORDER BY doc_id
""".replace("{vals}", _LANG_VALUES)


@register("text_language_id", oracle=LANGID_ORACLE, tags=("text", "llm", "heuristic"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language marker-hit counts, argmax
    with alphabetical tie-break, 'und' when nothing hits. Deterministic
    column math (no model), so the heuristic is fully oracled — the
    SQL rebuilds the same hit counts from the shared marker table;
    crafted-sentence property tests live in pytest."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", TXT.lang_guess("text").alias("lang_guess")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# E1/E2 — dedup family
# ---------------------------------------------------------------------------

DEDUP_EXACT_ORACLE = """
SELECT lang, source, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


@register("dedup_exact", oracle=DEDUP_EXACT_ORACLE, tags=("dedup", "llm", "agg"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (E1): deterministic survivor per key group."""
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_dedup(docs, ["lang", "source"], "doc_id").orderBy("lang", "source")


NGRAM_JACCARD_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id,
       FLOOR((n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
FROM inter
JOIN sizes sa ON a_id = sa.doc_id
JOIN sizes sb ON b_id = sb.doc_id
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
ORDER BY a_id, b_id
"""


@register("dedup_ngram_jaccard", oracle=NGRAM_JACCARD_ORACLE, tags=("dedup", "llm", "join"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise word-3-gram Jaccard ≥ 0.5 (E2, exact flavor) via
    inverted-index self-join — never materializes n² pairs."""
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, threshold=0.5, n=3).orderBy("a_id", "b_id")


@register("dedup_minhash_lsh", oracle=None, tags=("dedup", "llm", "approx"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (E2) — the 100 TB scale path.
    Approximate candidate recall → rows-only; pytest asserts recall
    against the exact Jaccard pairs on the testdata."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


DEDUP_CLUSTER_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
), lab AS (                      -- min-label propagation, fixpoint
  SELECT doc_id AS id, doc_id AS label FROM documents
), l1 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM lab l LEFT JOIN edges e ON l.id = e.src
             LEFT JOIN lab e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l2 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l1 l LEFT JOIN edges e ON l.id = e.src
            LEFT JOIN l1 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l3 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l2 l LEFT JOIN edges e ON l.id = e.src
            LEFT JOIN l2 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
)
SELECT id, label AS cluster_id, id = label AS keep
FROM l3
ORDER BY id
"""


@register("dedup_cluster_keep_min", oracle=DEDUP_CLUSTER_ORACLE, tags=("dedup", "llm", "graph"))
def dedup_cluster_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup decision (E2): exact Jaccard pairs →
    connected components (min-label propagation) → keep one doc per
    cluster. The oracle unrolls 3 propagation rounds — enough for the
    testdata's shallow clusters (pairs, mostly)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    ids = docs.select(F.col("doc_id").alias("id"))
    return DD.dedup_clusters(pairs, ids).orderBy("id")


@register("dedup_simhash", oracle=None, tags=("dedup", "llm", "approx"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures + hamming≤3 near-pairs via chunk pigeonhole."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_near_pairs(docs, max_hamming=3).orderBy("a_id", "b_id")


DECONTAMINATE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS g
  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8
)
SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_shared
FROM sh c JOIN sh b ON c.g = b.g
WHERE b.doc_id < 20 AND c.doc_id >= 20
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


@register("text_decontaminate", oracle=DECONTAMINATE_ORACLE, tags=("text", "llm", "dedup"))
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    8-gram with a benchmark set (docs 0-19 stand in) — the classic
    training-data hygiene pass. Inverted-index join on 8-gram hashes;
    at scale the benchmark side is tiny and broadcast."""
    docs = _t(spark, sf_dir, "documents")
    grams = DD.shingle_table(docs, n=8).select(
        "id", F.xxhash64("shingle").alias("g")
    )
    bench = grams.where(F.col("id") < 20).select(F.col("g")).distinct()
    corpus = grams.where(F.col("id") >= 20)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.countDistinct("g").alias("n_shared"))
        .orderBy("doc_id")
    )


DECONTAMINATE_BLOOM_ORACLE = DECONTAMINATE_ORACLE


@register("decontaminate_bloom", oracle=DECONTAMINATE_BLOOM_ORACLE, tags=("text", "llm", "dedup", "bloom"))
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination: build an 8 KiB
    bloom bitmap over the benchmark 8-grams, prune corpus grams
    MAP-SIDE with JVM bit probes, then resolve the (rare) false
    positives with the exact join on the survivors. No false
    negatives, so the output is bit-identical to text_decontaminate
    and shares its oracle — the bloom changes the plan, not the
    answer. At 100 TB the corpus side never shuffles a pruned gram;
    the bitmap build's collect is bounded at m/64 longs by
    construction (same class as the PQ codebook collect)."""
    from data_lake_with_spark_spark.operators import bloom as BL

    docs = _t(spark, sf_dir, "documents")
    grams = DD.shingle_table(docs, n=8).select(
        "id", F.xxhash64("shingle").alias("g")
    )
    bench = grams.where(F.col("id") < 20).select("g").distinct()
    bitmap = BL.build_bloom(bench, "g")
    corpus = grams.where(F.col("id") >= 20).where(
        BL.might_contain(F.col("g"), bitmap)
    )
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.countDistinct("g").alias("n_shared"))
        .orderBy("doc_id")
    )


CORPUS_CLEAN_ORACLE = r"""
WITH quality AS (
  SELECT doc_id,
         (LEAST(length(text) / 400.0, 1.0)
          + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
          + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                         / length(text) * 4, 1.0))) / 3.0 AS q
  FROM documents
), eligible AS (
  SELECT d.doc_id, d.text FROM documents d JOIN quality USING (doc_id) WHERE q >= 0.5
), toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM eligible
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs UNION SELECT b_id, a_id FROM pairs
), lab AS (SELECT doc_id AS id, doc_id AS label FROM eligible
), l1 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM lab l LEFT JOIN edges e ON l.id = e.src LEFT JOIN lab e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l2 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l1 l LEFT JOIN edges e ON l.id = e.src LEFT JOIN l1 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l3 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l2 l LEFT JOIN edges e ON l.id = e.src LEFT JOIN l2 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
)
SELECT id AS doc_id FROM l3 WHERE id = label
ORDER BY doc_id
"""


@register("corpus_clean_pipeline", oracle=CORPUS_CLEAN_ORACLE, tags=("text", "llm", "dedup", "pipeline"))
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus cleaning pass: quality filter →
    exact-Jaccard near-dup clustering → keep one survivor per cluster.
    Output: the kept doc_ids (what downstream training would read)."""
    docs = _t(spark, sf_dir, "documents")
    eligible = docs.where(_quality_raw("text") >= 0.5)
    pairs = DD.ngram_jaccard_pairs(eligible, threshold=0.5, n=3)
    ids = eligible.select(F.col("doc_id").alias("id"))
    clusters = DD.dedup_clusters(pairs, ids)
    return (
        clusters.where(F.col("keep"))
        .select(F.col("id").alias("doc_id"))
        .orderBy("doc_id")
    )


def _quality_raw(text_col: str):
    """Unrounded quality score (the query rounds only at output; the
    filter must use the raw value so both engines cut identically)."""
    col = F.col(text_col)
    len_score = F.least(F.length(col) / F.lit(400.0), F.lit(1.0))
    word_score = F.least(TXT.token_count(col) / F.lit(60.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(TXT.punct_ratio(col) * 4, F.lit(1.0))
    return (len_score + word_score + punct_penalty) / 3.0


# ---------------------------------------------------------------------------
# E3 — vector similarity search
# ---------------------------------------------------------------------------

VEC_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         FLOOR((list_dot_product(qe, ce) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))) * 1e6 + 0.5) / 1e6 AS score
  FROM q, c
  WHERE query_id != neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM scored
)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register("vector_topk_bruteforce", oracle=VEC_TOPK_ORACLE, tags=("vector", "llm", "topk"))
def vector_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 10 query vectors (E3 baseline).
    Double-precision JVM dot products; ranking ties broken by id."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return SIM.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


VEC_NEAR_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 300
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       FLOOR((list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 AS cos_sim
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
ORDER BY a_id, b_id
"""


@register("vector_near_pairs", oracle=VEC_NEAR_ORACLE, tags=("vector", "llm"))
def vector_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.35 via LSH-bucketed
    candidates + exact verify (no cross join in the plan; pytest pins
    recall 1.0 vs the exact form, which remains the DuckDB oracle)."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return SIM.lsh_near_pairs(emb, threshold=0.35).orderBy("a_id", "b_id")


@register("vector_topk_lsh", oracle=None, tags=("vector", "llm", "approx", "topk"))
def vector_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (E3 scale path): bucketed
    candidates + 1-bit multiprobe, exact re-scoring. Rows-only;
    pytest measures recall vs brute force."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return SIM.lsh_topk(emb, queries, k=5).orderBy("query_id", "rank")


MATRYOSHKA_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
         (embedding::DOUBLE[])[1:8] AS qp
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce,
         (embedding::DOUBLE[])[1:8] AS cp
  FROM embeddings
), coarse AS (
  SELECT query_id, neighbor_id, qe, ce,
         FLOOR((list_dot_product(qp, cp)
                / (sqrt(list_dot_product(qp, qp)) * sqrt(list_dot_product(cp, cp))))
               * 1e6 + 0.5) / 1e6 AS cscore
  FROM q, c
  WHERE query_id != neighbor_id
), short AS (
  SELECT query_id, neighbor_id, qe, ce FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cscore DESC, neighbor_id ASC) AS crank
    FROM coarse
  ) WHERE crank <= 50
), rr AS (
  SELECT query_id, neighbor_id,
         FLOOR((list_dot_product(qe, ce)
                / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))))
               * 1e6 + 0.5) / 1e6 AS score
  FROM short
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rnk
  FROM rr
)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "vector_topk_matryoshka",
    oracle=MATRYOSHKA_ORACLE,
    tags=("vector", "llm", "topk"),
)
def vector_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (E3): coarse-rank every candidate
    on the first 8 embedding components only, shortlist 50 per query,
    exact-rerank the shortlist full-dim. Both stages deterministic
    (portable-rounded scores, id tie-breaks) so the entire pipeline is
    oracled — the accuracy/cost trade-off of prefix-dim ANN with none
    of the sampling nondeterminism. See operators/similarity.py:
    matryoshka_topk for the column-pruned scale shape."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return SIM.matryoshka_topk(
        emb, queries, k=5, coarse_dims=8, shortlist=50
    ).orderBy("query_id", "rank")


MEAN_POOL_ORACLE = """
WITH ex AS (
  SELECT vec_id // 50 AS group_id,
         UNNEST(range(len(embedding))) AS pos,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS sv
  FROM embeddings
), per_dim AS (
  SELECT group_id, pos, SUM(sv) AS s FROM ex GROUP BY group_id, pos
)
SELECT group_id,
       CAST(COUNT(*) AS INTEGER) AS n_dims,
       CAST(MAX(CASE WHEN pos = 0 THEN s END) AS BIGINT) AS d0_sum_scaled,
       CAST(MAX(CASE WHEN pos = 1 THEN s END) AS BIGINT) AS d1_sum_scaled,
       CAST(SUM(s) AS BIGINT) AS all_dims_sum_scaled
FROM per_dim GROUP BY group_id
ORDER BY group_id
"""


@register("vector_mean_pool", oracle=MEAN_POOL_ORACLE, tags=("vector", "llm", "agg"))
def vector_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-row vector pooling (chunk embeddings → document
    embedding): posexplode to (group, dim, value), per-dim sum, then
    the pooled array rebuilt by ordered collect — the shape that
    scales (per-group state is one float per dim, never a list of
    member vectors; collect_list of the 64 per-dim sums is bounded by
    dim, not group size). Values are pre-scaled to exact integers
    (floor(v·1e6)) so the pooled sums hash-compare bit-exactly across
    engines; mean = sum / (n·1e6) downstream."""
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.col("vec_id") / 50).cast("long").alias("group_id"),
        F.posexplode("embedding").alias("pos", "val"),
    ).withColumn("sv", F.floor(F.col("val").cast("double") * 1e6).cast("long"))
    per_dim = ex.groupBy("group_id", "pos").agg(F.sum("sv").alias("s"))
    pooled = per_dim.groupBy("group_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
        ).alias("pooled")
    )
    return (
        pooled.select(
            "group_id",
            F.size("pooled").alias("n_dims"),
            F.element_at("pooled", 1).alias("d0_sum_scaled"),
            F.element_at("pooled", 2).alias("d1_sum_scaled"),
            F.aggregate("pooled", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "all_dims_sum_scaled"
            ),
        )
        .orderBy("group_id")
    )


QUANT_ORACLE = f"""
WITH ex AS (
  SELECT vec_id,
         UNNEST(range(len(embedding))) AS pos,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings
), sc AS (
  SELECT pos, MAX(abs(v)) AS scale FROM ex GROUP BY pos
), q AS (
  SELECT vec_id, ex.pos, v, scale,
         CASE WHEN scale = 0 THEN 0
              ELSE CAST(FLOOR(127.0 * v / scale + 0.5) AS INTEGER) END AS qv
  FROM ex JOIN sc ON ex.pos = sc.pos
)
SELECT vec_id,
       MAX(CASE WHEN pos = 0 THEN qv END) AS q0,
       MAX(CASE WHEN pos = 1 THEN qv END) AS q1,
       MAX(CASE WHEN pos = 2 THEN qv END) AS q2,
       {pround_sql(
           'MAX(CASE WHEN scale = 0 THEN 0.0'
           ' ELSE abs(v - qv * scale / 127.0) END)',
           6,
       )} AS linf_err
FROM q GROUP BY vec_id ORDER BY vec_id
"""


@register("vector_quantize_int8", oracle=QUANT_ORACLE, tags=("vector", "llm", "quantize"))
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus (the 4x storage-shrink step before SIMD int8 distance
    kernels) with per-vector L∞ reconstruction error. Deterministic
    and training-free — scales are corpus maxima, codes are portable
    half-up rounds — so unlike PQ this quantizer oracles exactly.
    Plan: one posexplode scan, a dim-row aggregate, broadcast join
    back; no data-sized shuffle beyond the scan."""
    emb = _t(spark, sf_dir, "embeddings")
    quantized = QZ.quantize_int8(emb)
    per_vec = QZ.dequantize_error(quantized)
    return per_vec.select(
        "vec_id", "q0", "q1", "q2", pround(F.col("linf_err"), 6).alias("linf_err")
    ).orderBy("vec_id")


@register("dedup_minhash_signatures", oracle=None, tags=("dedup", "llm", "approx"))
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash signature table itself (16 hashes over 3-gram
    shingles) — deterministic across runs (xxhash64 family), but no
    DuckDB xxhash64 → rows-only."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_signatures(docs, num_hashes=16).orderBy("id")


@register("vector_topk_pq", oracle=None, tags=("vector", "llm", "approx", "topk"))
def vector_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (E3 scale path #3): 16-byte PQ codes +
    ADC table-lookup scoring + exact rerank of a 4k shortlist. The
    candidate scan touches 16x less memory than raw vectors. Rows-only;
    pytest tracks recall vs brute force."""
    import numpy as np

    from data_lake_with_spark_spark.operators.similarity import pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    # orderBy before limit: an unordered limit takes whichever partitions
    # answer first, so on a multi-file table the codebook training sample
    # (and the output) would vary run to run. 512 ordered rows for
    # driver-side codebook training is the standard (and cheap) pattern.
    sample = np.asarray(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(512).collect()],
        dtype=np.float64,
    )
    books = pq_train(sample, m=16, k=16)
    queries = emb.where(F.col("vec_id") < 10)
    return pq_topk(emb, queries, books, k=5, rerank_factor=8).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# E5 — multimodal plumbing
# ---------------------------------------------------------------------------


FRAME_SAMPLE_ORACLE = """
SELECT doc_id AS media_id, CAST(4 AS BIGINT) AS n_frames
FROM documents ORDER BY media_id
"""


@register(
    "multimodal_frame_sample", oracle=FRAME_SAMPLE_ORACLE, tags=("multimodal", "llm")
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (E5): payloads split into fixed frames,
    every 2nd kept — per-media frame counts. 32-byte payloads → 8
    4-byte frames → 4 kept; the oracle pins the analytic count for
    every media row (the value check is that the explode/filter
    plumbing neither drops nor duplicates media)."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    frames = MM.frame_sample(media, every_nth=2)
    return (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
        .orderBy("media_id")
    )


MULTIMODAL_FEATURES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || 'x') AS hexpayload
  FROM documents
), h AS (
  SELECT media_id,
         CAST(32 AS BIGINT) AS n_bytes,
         sha256(hexpayload) AS d
  FROM m
), b AS (
  SELECT media_id, n_bytes,
         list_transform(range(8), i ->
             (strpos('0123456789abcdef', substr(d, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 2 * i + 2, 1)) - 1)) AS bytes
  FROM h
)
SELECT media_id, n_bytes,
       FLOOR(list_sum(bytes) / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_sum,
       FLOOR(bytes[1] / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_0,
       FLOOR(bytes[2] / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_1
FROM b ORDER BY media_id
"""


@register(
    "multimodal_features", oracle=MULTIMODAL_FEATURES_ORACLE, tags=("multimodal", "llm")
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns + Arrow-batched feature extraction (E5).
    Payloads are deterministic fakes (md5-derived); the decode step for
    real media is stubbed (no imaging libs in container). The feature
    math is fully value-verified: features are sha256 bytes of the
    payload's hex (SQL-expressible — the ``decode_image_png`` oracle
    pattern), aggregated as INTEGER sums divided once, so Spark's
    Arrow stage and the SQL oracle agree bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    feats = MM.fake_feature_extract(media)
    byte_sum = F.aggregate(
        "feature_bytes", F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return (
        media.select("media_id", F.col("meta.n_bytes").alias("n_bytes"))
        .join(feats, "media_id")
        .select(
            "media_id",
            "n_bytes",
            pround(byte_sum / F.lit(255.0), 6).alias("feature_sum"),
            pround(F.element_at("feature_bytes", 1) / F.lit(255.0), 6).alias(
                "feature_0"
            ),
            pround(F.element_at("feature_bytes", 2) / F.lit(255.0), 6).alias(
                "feature_1"
            ),
        )
        .orderBy("media_id")
    )


DEDUP_EMB_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label
  FROM embeddings WHERE vec_id < 400
), dupes AS (
  SELECT DISTINCT b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
)
SELECT vec_id, label FROM e
WHERE vec_id NOT IN (SELECT b_id FROM dupes)
ORDER BY vec_id
"""


@register("dedup_embedding_cosine", oracle=DEDUP_EMB_ORACLE, tags=("dedup", "vector", "llm"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup (E2's vector flavor as an actual
    dedup, not just pair listing): drop every vector that has a
    smaller-id neighbor at cosine ≥ 0.35 — the keep-first-occurrence
    greedy used by embedding dedup pipelines. Pairs come from
    ``lsh_near_pairs`` (bucket equi-join + exact verify — the 100 TB
    path, no cross join); the O(n²) exact form survives only as the
    DuckDB oracle and the recall-1.0 pytest reference. The rounded
    cosine is compared on BOTH engines so boundary pairs agree."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    dupes = pairs.select(F.col("b_id").alias("vec_id")).distinct()
    return (
        emb.join(dupes, "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


DECODE_WAV_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(64)) AS i FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(64 AS INTEGER) AS n_samples,
       CAST(SUM(((doc_id * 31 + i * 7) % 65536) - 32768) AS BIGINT) AS sum_samples
FROM s GROUP BY doc_id ORDER BY media_id
"""


@register("decode_audio_wav", oracle=DECODE_WAV_ORACLE, tags=("multimodal", "llm", "decode"))
def decode_audio_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (E5, no longer stubbed for WAV): closed-form
    16-bit PCM payloads are encoded to genuine RIFF/WAV bytes, decoded
    back by the stdlib-``wave`` mapInPandas stage, and the decoded
    samples are JVM-aggregated. The oracle predicts the sample sums
    analytically — a hash-checked proof the decoder reproduces the
    exact PCM content."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_wav_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    return (
        dec.select(
            "media_id",
            "sample_rate",
            F.size("values").alias("n_samples"),
            F.aggregate("values", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "sum_samples"
            ),
        )
        .orderBy("media_id")
    )


DECODE_PNG_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(32)) AS idx FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(SUM((doc_id * 3 + 13 * (idx // 8) + 5 * (idx % 8)) % 256) AS BIGINT)
         AS sum_pixels
FROM s GROUP BY doc_id ORDER BY media_id
"""


@register("decode_image_png", oracle=DECODE_PNG_ORACLE, tags=("multimodal", "llm", "decode"))
def decode_image_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (E5, no longer stubbed for PNG): closed-form
    8×4 grayscale rasters are encoded to genuine PNGs — scanline
    filter rotating through all five types by doc id — inflated and
    defiltered back by the stdlib-zlib decoder, and the raster sums
    hash-checked against the analytic oracle."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_png_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    return (
        dec.select(
            "media_id",
            "width",
            "height",
            F.aggregate("values", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "sum_pixels"
            ),
        )
        .orderBy("media_id")
    )


IMAGE_QUADRANTS_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(32)) AS idx FROM documents WHERE doc_id < 200
), px AS (
  SELECT doc_id,
         CAST((idx // 8 >= 2) AS INTEGER) * 2
           + CAST((idx % 8 >= 4) AS INTEGER) AS quadrant,
         (doc_id * 3 + 13 * (idx // 8) + 5 * (idx % 8)) % 256 AS v
  FROM s
)
SELECT doc_id AS media_id, quadrant,
       CAST(SUM(v) AS BIGINT) AS sum_pixels,
       CAST(MAX(v) AS INTEGER) AS max_pixel
FROM px GROUP BY doc_id, quadrant
ORDER BY media_id, quadrant
"""


@register(
    "multimodal_image_quadrants",
    oracle=IMAGE_QUADRANTS_ORACLE,
    tags=("multimodal", "llm", "decode"),
)
def multimodal_image_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional image statistics (E5): REAL PNG decode, then the
    row-major raster re-indexed into 2D (y = pos // width, x = pos %
    width) and aggregated per quadrant — the spatial-pooling shape of
    patch-based vision preprocessing (crop grids, tile dedup, saliency
    maps) exercised through the genuine decoder. Exact integer sums;
    the oracle rebuilds the raster analytically."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_png_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    px = dec.select(
        "media_id",
        F.posexplode("values").alias("pos", "v"),
    ).select(
        "media_id",
        (
            ((F.col("pos") / 8).cast("int") >= 2).cast("int") * 2
            + ((F.col("pos") % 8) >= 4).cast("int")
        ).alias("quadrant"),
        F.col("v").cast("bigint").alias("v"),
    )
    return (
        px.groupBy("media_id", "quadrant")
        .agg(
            F.sum("v").alias("sum_pixels"),
            F.max("v").cast("int").alias("max_pixel"),
        )
        .orderBy("media_id", "quadrant")
    )


DECODE_GIF_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(32)) AS idx FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(SUM((doc_id * 7 + 11 * (idx // 8) + 3 * (idx % 8)) % 256) AS BIGINT)
         AS sum_pixels
FROM s GROUP BY doc_id ORDER BY media_id
"""


@register("decode_image_gif", oracle=DECODE_GIF_ORACLE, tags=("multimodal", "llm", "decode"))
def decode_image_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode #3 (E5): closed-form grayscale rasters are
    LZW-compressed into genuine GIF87a files, decoded back by the
    stdlib-only bit-level LZW decoder (variable code width, clear-code
    resets, KwKwK), and the raster sums hash-checked against the
    analytic oracle."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_gif_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    return (
        dec.select(
            "media_id",
            "width",
            "height",
            F.aggregate("values", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "sum_pixels"
            ),
        )
        .orderBy("media_id")
    )


GRAPH_DEGREE_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), deg AS (
  SELECT id, COUNT(*) AS degree FROM (
    SELECT a_id AS id FROM pairs UNION ALL SELECT b_id FROM pairs
  ) GROUP BY id
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""


@register("graph_degree_distribution", oracle=GRAPH_DEGREE_ORACLE, tags=("graph", "dedup", "llm"))
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the embedding near-dup graph — the health
    check of a candidate-pair stage (a heavy tail means boilerplate
    super-nodes about to quadratically bloat verification). Pairs come
    from the LSH-bucketed path (recall 1.0 on this range, so the exact
    cross-join oracle agrees); degrees are one explode + two hash-aggs."""
    from data_lake_with_spark_spark.operators.graph import degrees

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    return (
        degrees(pairs)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def _pagerank_oracle(n_iter: int = 10) -> str:
    """Unrolled fixed-iteration SQL twin of ``pagerank_portable`` —
    the k-means-Lloyd precedent (iterative algorithms CAN be oracled
    by unrolling) applied to PageRank. Pure integer arithmetic
    (``//`` floor-div, ×17//20 damping) so DuckDB reproduces the
    engine bit-for-bit; the pairs CTE is the exact cross-join form
    that the LSH path matches at recall 1.0 on this range."""
    ctes = [
        """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM ed
), cnt AS (
  SELECT COUNT(*) AS n FROM nodes
), deg AS (
  SELECT src, COUNT(*) AS out_deg FROM ed GROUP BY src
), r0 AS (
  SELECT id, CAST(1000000000000 // n AS BIGINT) AS rs FROM nodes, cnt
)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", c{i} AS (
  SELECT ed.dst AS id, SUM(r.rs // d.out_deg) AS s
  FROM ed JOIN deg d ON ed.src = d.src JOIN r{i - 1} r ON ed.src = r.id
  GROUP BY ed.dst
), r{i} AS (
  SELECT nodes.id,
         CAST((3000000000000 // (20 * n)) + (COALESCE(c{i}.s, 0) * 17) // 20
              AS BIGINT) AS rs
  FROM nodes LEFT JOIN c{i} ON nodes.id = c{i}.id, cnt
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT id AS vec_id, rs AS rank_scaled FROM r{n_iter}"
        "\nORDER BY rank_scaled DESC, vec_id LIMIT 50"
    )


@register(
    "graph_pagerank_neardup",
    oracle=_pagerank_oracle(10),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the near-dup graph: which documents sit at
    the center of duplicate clusters (rank ∝ cluster hubness) — the
    canonical iterative-algorithm shape (driver loop over lazy plans,
    one join + one agg per iteration, lineage checkpoint-truncated).
    SCALED-INTEGER arithmetic end to end (operators/graph.py:
    pagerank_portable), so the 10 damped iterations are bit-exact
    against the unrolled SQL oracle — hash-green like k-means, no
    longer rows-only; the float ``pagerank`` twin remains for callers
    wanting real-valued ranks and is pinned by the numpy differential
    pytest."""
    from data_lake_with_spark_spark.operators.graph import pagerank_portable

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    pr = pagerank_portable(pairs, n_iter=10, num_partitions=8)
    return pr.select(
        F.col("id").alias("vec_id"), "rank_scaled"
    ).orderBy(F.desc("rank_scaled"), "vec_id").limit(50)


def _label_prop_oracle(n_iter: int = 3) -> str:
    """Unrolled synchronous label-propagation twin — deterministic
    (majority label, min tie-break) so community detection joins
    PageRank/k-means in the value-verified iterative family."""
    head = """WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM ed
), l0 AS (
  SELECT id, id AS lab FROM nodes
)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", s{i} AS (
  SELECT ed.src AS id, l.lab, COUNT(*) AS c
  FROM ed JOIN l{i - 1} l ON ed.dst = l.id
  GROUP BY ed.src, l.lab
), l{i} AS (
  SELECT id, lab FROM (
    SELECT id, lab,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
    FROM s{i}
  ) WHERE rn = 1
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS n_members"
        f"\nFROM l{n_iter} GROUP BY lab"
        "\nORDER BY n_members DESC, community"
    )


@register(
    "graph_label_propagation",
    oracle=_label_prop_oracle(3),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by synchronous
    label propagation (3 rounds, majority label, min tie-break — the
    deterministic LPA variant): duplicate neighborhoods collapse into
    labeled communities whose sizes rank boilerplate families, the
    between-CC-and-modularity signal a corpus triage wants. Iterative
    like PageRank and verified the same way: the deterministic update
    rule unrolls into a 3-step SQL twin (operators/graph.py:
    label_propagation has the per-round join+agg+window shape)."""
    from data_lake_with_spark_spark.operators.graph import label_propagation

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    labels = label_propagation(pairs, n_iter=3)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
    )


AUDIO_CLIP_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || 'a') || md5(text || 'b') AS hexpayload
  FROM documents
), c AS (
  -- clip [16, 40) of the 48-byte payload = hex chars [33, 80]
  SELECT media_id, sha256(substr(hexpayload, 33, 48)) AS d FROM m
), b AS (
  SELECT media_id,
         list_sum(list_transform(range(8), i ->
             (strpos('0123456789abcdef', substr(d, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 2 * i + 2, 1)) - 1))) AS s
  FROM c
)
SELECT media_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(24 AS BIGINT) AS clip_samples,
       FLOOR(s / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_sum
FROM b ORDER BY media_id
"""


@register(
    "multimodal_audio_clip", oracle=AUDIO_CLIP_ORACLE, tags=("multimodal", "llm")
)
def multimodal_audio_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped multimodal plumbing (E5): 1-D payloads with
    rate/length metadata, clipped to samples [16, 40) by pure JVM byte
    slicing, then Arrow-batched feature extraction over the clips.
    Value-verified end-to-end: the oracle re-derives the clipped
    payload as a hex substring and the features via sha256(hex) —
    so the JVM substring clip, the metadata rewrite, AND the Arrow
    feature stage all hash-check."""
    docs = _t(spark, sf_dir, "documents")
    audio = MM.attach_fake_audio(docs, "doc_id", "text")
    clips = MM.clip_media(audio, start=16, length=24)
    feats = MM.fake_feature_extract(clips)
    byte_sum = F.aggregate(
        "feature_bytes", F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return (
        clips.select(
            "media_id",
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_samples").alias("clip_samples"),
        )
        .join(feats, "media_id")
        .select(
            "media_id",
            "sample_rate",
            "clip_samples",
            pround(byte_sum / F.lit(255.0), 6).alias("feature_sum"),
        )
        .orderBy("media_id")
    )


RESIZE_FEATURES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || 'x') AS h
  FROM documents
), r AS (
  -- nearest-neighbor 2x downsample of the 8x4 raster: bytes at
  -- row-major offsets 0,2,4,6 (row 0) and 16,18,20,22 (row 2) =
  -- hex pairs at 2*p+1
  SELECT media_id,
         sha256(substr(h, 1, 2) || substr(h, 5, 2) || substr(h, 9, 2)
             || substr(h, 13, 2) || substr(h, 33, 2) || substr(h, 37, 2)
             || substr(h, 41, 2) || substr(h, 45, 2)) AS d
  FROM m
), b AS (
  SELECT media_id,
         list_sum(list_transform(range(8), i ->
             (strpos('0123456789abcdef', substr(d, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 2 * i + 2, 1)) - 1))) AS s
  FROM r
)
SELECT media_id,
       CAST(4 AS INTEGER) AS width,
       CAST(2 AS INTEGER) AS height,
       FLOOR(s / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_sum
FROM b ORDER BY media_id
"""


@register(
    "multimodal_resize_features",
    oracle=RESIZE_FEATURES_ORACLE,
    tags=("multimodal", "llm"),
)
def multimodal_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-then-extract ordering (E5): images downsampled 2× by
    pure-JVM byte gather (payload shrinks 4× BEFORE any Arrow/UDF
    stage touches it — the ordering that matters at 100 TB), then
    Arrow-batched feature extraction over the small clips.
    Value-verified: the oracle re-derives the gathered payload as the
    hex pairs the row-major 2× stride picks and the features via
    sha256(hex) — the JVM gather, metadata rewrite, and Arrow stage
    all hash-check."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    small = MM.resize_image(media, factor=2)
    feats = MM.fake_feature_extract(small)
    byte_sum = F.aggregate(
        "feature_bytes", F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return (
        small.select(
            "media_id",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
        .join(feats, "media_id")
        .select(
            "media_id",
            "width",
            "height",
            pround(byte_sum / F.lit(255.0), 6).alias("feature_sum"),
        )
        .orderBy("media_id")
    )


@register("vector_pca_project", oracle=None, tags=("vector", "llm", "pca"))
def vector_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (E3 preprocessing): fit the top-4 principal
    components with one d²-cell scatter aggregation + a driver-side
    64×64 eigendecomposition, then project every embedding JVM-side
    (literal-weight dot products, no Python in the row path). Rows-only
    — eigenvectors come from numpy (not SQL-expressible); the numpy
    differential pytest (tests/test_pca.py) pins components, variances,
    and projections."""
    from data_lake_with_spark_spark.operators.pca import pca_project

    emb = _t(spark, sf_dir, "embeddings")
    out = pca_project(emb, k=4)
    return out.select(
        "vec_id",
        F.transform("pc", lambda x: F.floor(x * 1e6 + 0.5) / 1e6).alias("pc"),
    ).orderBy("vec_id")


@register("vector_topk_pca", oracle=None, tags=("vector", "llm", "approx", "topk"))
def vector_topk_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PCA retrieval (E3 scale path #4): 32-dim PCA-space
    candidate scan + exact full-dimension rerank of 8·k candidates.
    Rows-only (numpy eigenbasis); recall vs brute force pinned in
    tests/test_pca.py (0.94 on the near-isotropic testdata)."""
    from data_lake_with_spark_spark.operators.pca import pca_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return pca_topk(emb, queries, k=5).orderBy("query_id", "rank")


# Portable MinHash constants — single source of truth for the Spark
# expressions AND the generated oracle SQL below. 32-bit md5-derived
# shingle hashes, 16 permutations h_i(x) = (a_i·x + b_i) mod P over a
# Mersenne prime, banded 4×4. a_i < 2^30 keeps a_i·x < 2^62 (ANSI-safe
# in long math on both engines).
MINHASH_P = 2_147_483_647
MINHASH_PERMS = [
    (((1_103_515_245 * (i + 1)) % (1 << 30)) | 1, (12_345 + 987_654_321 * i) % MINHASH_P)
    for i in range(16)
]
MINHASH_BANDS = 4
MINHASH_ROWS = 4

_PERM_VALUES = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PERMS))

MINHASH_PORTABLE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), hs AS (
  SELECT doc_id, shingle,
         CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS h
  FROM sh
), sig AS (
  SELECT doc_id, p.i, MIN((p.a * h + p.b) % 2147483647) AS v
  FROM hs CROSS JOIN (VALUES {perms}) AS p(i, a, b)
  GROUP BY doc_id, p.i
), bk AS (
  SELECT doc_id, i // 4 AS band,
         string_agg(CAST(v AS VARCHAR), '_' ORDER BY i) AS key
  FROM sig GROUP BY doc_id, i // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.a_id
  JOIN sh b ON b.doc_id = c.b_id AND a.shingle = b.shingle
  GROUP BY c.a_id, c.b_id
)
SELECT i.a_id, i.b_id,
       FLOOR((n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
FROM inter i
JOIN sizes sa ON i.a_id = sa.doc_id
JOIN sizes sb ON i.b_id = sb.doc_id
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
ORDER BY a_id, b_id
""".replace("{perms}", _PERM_VALUES)


def _mh_portable_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, s0..s15): distinct 3-gram shingle arrays plus the
    16 portable MinHash signature components — the shared front end of
    dedup_minhash_portable, ml_minhash_jaccard_error, and
    pipeline_neardup_trainset."""
    toked = docs.select("doc_id", TXT.tokens("text").alias("toks"))
    # barrier: materialize tokens/shingles once. Width pinned to the
    # cluster (round-14 optimization): the unpinned hash repartition is
    # AQE-coalescible, and byte-accounting shrank this exchange to ~1
    # task while the stage ABOVE it evaluates md5 + 16 affine
    # permutations per shingle — compute-heavy per byte, exactly what
    # the coalescer underestimates. Measured 0.71s → 0.44s per batch
    # at sf0.1; at scale defaultParallelism is the floor, not a cap.
    cores = docs.sparkSession.sparkContext.defaultParallelism
    sh_arr = toked.where(F.size("toks") >= 3).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
            )
        ).alias("sh"),
    ).repartition(cores, "doc_id")
    # expr-string forms (round-14: the Column-API lambdas cost ~300
    # py4j round-trips per construction — driver latency the bench and
    # the maintained ingest loop pay per batch; these analyze to the
    # identical HOF expressions)
    hs = F.expr(
        "transform(sh, s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
    )
    sig_cols = [
        F.expr(f"array_min(transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))").alias(
            f"s{i}"
        )
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh_arr.withColumn("hs", hs).select("doc_id", "sh", *sig_cols)


def _mh_band_candidates(sigs: DataFrame) -> DataFrame:
    """(a_id, b_id) candidate pairs from the 4x4 band-key self-join."""
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col(f"s{b * MINHASH_ROWS + r}").cast("string")
                    for r in range(MINHASH_ROWS)
                ],
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(band_keys).alias("band", "key"))
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def _mh_near_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(a_id, b_id, jaccard) — band candidates verified by exact
    Jaccard over the distinct-shingle arrays, thresholded on the
    portable-rounded value."""
    sigs = _mh_portable_sigs(docs)
    cand = _mh_band_candidates(sigs)
    arr = sigs.select("doc_id", "sh")
    a_arr = arr.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b_arr = arr.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = inter / (F.size("a_sh") + F.size("b_sh") - inter)
    return (
        cand.join(a_arr, "a_id")
        .join(b_arr, "b_id")
        .select("a_id", "b_id", (F.floor(jac * 1e6 + 0.5) / 1e6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


@register(
    "dedup_minhash_portable",
    oracle=MINHASH_PORTABLE_ORACLE,
    tags=("dedup", "llm", "approx", "minhash"),
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with a PORTABLE hash family (md5-derived 32-bit
    shingle hashes + literal affine permutations), so the ENTIRE
    approximate pipeline — signatures, 4×4 banding, bucket candidates,
    exact verify — is bit-reproducible in SQL and fully oracled
    (dedup_minhash_lsh keeps the fast xxhash64 family; this variant
    proves the algorithm). Signatures are per-row HOF folds over the
    distinct-shingle array (zero shuffle); candidates come from the
    band-key self-join; verify is exact Jaccard on shingle strings."""
    docs = _t(spark, sf_dir, "documents")
    return _mh_near_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


SIMHASH_PORTABLE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), hs AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
  FROM sh
), bitsums AS (
  SELECT doc_id, j.j, SUM(((h >> j.j) & 1) * 2 - 1) AS s
  FROM hs CROSS JOIN (SELECT UNNEST(range(60)) AS j) j
  GROUP BY doc_id, j.j
), sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
  FROM bitsums GROUP BY doc_id
), bands AS (
  SELECT doc_id, sig, b.b, (sig >> (15 * b.b)) & 32767 AS key
  FROM sig CROSS JOIN (SELECT UNNEST(range(4)) AS b) b
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS sa, b.sig AS sb
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY a_id, b_id
"""


@register(
    "dedup_simhash_portable",
    oracle=SIMHASH_PORTABLE_ORACLE,
    tags=("dedup", "llm", "approx", "simhash"),
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with a PORTABLE hash family: 60-bit md5-derived
    shingle hashes → majority-vote signature → 4×15-bit pigeonhole
    bands (lossless for hamming ≤ 3) → exact popcount verify. Like
    dedup_minhash_portable this makes the whole approximate pipeline
    bit-reproducible in SQL (dedup_simhash keeps the fast xxhash64
    family). Two hash-aggs (bit sums, then bit packing) + a band-keyed
    self-join — no cartesian, no Python."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", TXT.tokens("text").alias("toks"))
    sh = toked.where(F.size("toks") >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
                )
            )
        ).alias("shingle"),
    )
    hs = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    js = spark.range(60).select(F.col("id").cast("int").alias("j"))
    bitsums = (
        hs.crossJoin(F.broadcast(js))
        .select(
            "doc_id", "j",
            (F.expr("shiftright(h, j) & 1") * 2 - 1).alias("c"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("c").alias("s"))
    )
    sig = bitsums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("sig")
    )
    bands = sig.select(
        "doc_id", "sig", F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("b")
    ).withColumn("key", F.expr("shiftright(sig, b * 15) & 32767"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("a_id", "b_id")
    )


# Portable hyperplane-LSH constants: integer plane weights derived from
# md5(table, plane, dim) — shared by the Spark plan and the generated
# SQL. Embedding components are scaled to exact integers
# (floor(x·1000 + 0.5), the vector_topk_pq_portable scheme) before the
# plane dot products, so the bucket-bit signs come from INTEGER sums —
# order-independent, immune to Spark's partition-dependent partial
# aggregation order vs DuckDB's sequential fold.
LSHP_TABLES = 4
LSHP_PLANES = 6
LSHP_DIM = 64


def _lshp_weight(t: int, p: int, d: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[:8], 16)
    return h % 1001 - 500


_LSHP_VALUES = ", ".join(
    f"({t}, {p}, {d}, {_lshp_weight(t, p, d)})"
    for t in range(LSHP_TABLES)
    for p in range(LSHP_PLANES)
    for d in range(LSHP_DIM)
)

LSH_PORTABLE_ORACLE = r"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS ix
  FROM e
), dots AS (
  SELECT c.vec_id, w.t, w.p, SUM(c.ix * w.wt) AS s
  FROM comp c JOIN (VALUES {planes}) AS w(t, p, dim, wt) ON c.dim = w.dim
  GROUP BY c.vec_id, w.t, w.p
), sig AS (
  SELECT vec_id, t,
         CAST(SUM(CASE WHEN s >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, t
), q AS (
  SELECT vec_id AS query_id, t, bucket FROM sig WHERE vec_id < 10
), cand AS (
  SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
  FROM q JOIN sig s ON q.t = s.t AND q.bucket = s.bucket
  WHERE s.vec_id <> q.query_id
), scored AS (
  SELECT c.query_id, c.neighbor_id,
         FLOOR(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM cand c JOIN e a ON a.vec_id = c.query_id JOIN e b ON b.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY query_id, rank
""".replace("{planes}", _LSHP_VALUES)


def _lshp_topk(spark: SparkSession, emb: DataFrame, k: int) -> DataFrame:
    """The portable hyperplane-LSH top-k pipeline shared by
    vector_topk_lsh_portable (k=5, the oracled query) and
    ml_recall_mrr_at_k (k=10, graded against brute force)."""
    planes = spark.createDataFrame(
        [
            (t, p, d, _lshp_weight(t, p, d))
            for t in range(LSHP_TABLES)
            for p in range(LSHP_PLANES)
            for d in range(LSHP_DIM)
        ],
        "t int, p int, dim int, wt int",
    )
    comp = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    ).select(
        "vec_id", "dim", F.floor(F.col("x") * 1000 + 0.5).cast("bigint").alias("ix")
    )
    dots = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "t", "p")
        .agg(F.sum(F.col("ix") * F.col("wt")).alias("s"))
    )
    sig = dots.groupBy("vec_id", "t").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("bucket")
    )
    q = sig.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "t", "bucket"
    )
    cand = (
        sig.join(F.broadcast(q), ["t", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    from data_lake_with_spark_spark.functions.vector import dot, norm

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    b = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    score = dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv")))
    scored = (
        cand.join(F.broadcast(a), "query_id")
        .join(b, "neighbor_id")
        .select(
            "query_id", "neighbor_id", (F.floor(score * 1e6 + 0.5) / 1e6).alias("score")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "score")
        .orderBy("query_id", "rank")
    )


@register(
    "vector_topk_lsh_portable",
    oracle=LSH_PORTABLE_ORACLE,
    tags=("vector", "llm", "approx", "topk", "lsh"),
)
def vector_topk_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k with a PORTABLE plane family: integer plane
    weights derived from md5(table, plane, dim), bucket bits from the
    SIGN of INTEGER plane dot products (components pre-scaled
    floor(x·1000 + 0.5) → order-independent exact sums on any engine),
    candidates from per-table bucket equality, exact
    cosine rerank. Like the minhash/simhash portable twins this makes
    the approximate ANN pipeline itself oracle-checkable; the
    numpy-seeded multi-table variant (vector_topk_lsh) stays the fast
    path. Plan shape: one explode + one broadcast plane join + two
    hash-aggs for signatures — no literal-array codegen blowup (see
    ARCHITECTURE round-2 note), no cartesian, no Python."""
    emb = _t(spark, sf_dir, "embeddings")
    return _lshp_topk(spark, emb, k=5)


PQ_PORTABLE_ORACLE = r"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS x
  FROM e
), lm AS (
  SELECT vec_id - 10 AS c, dim, x AS lx FROM comp WHERE vec_id >= 10 AND vec_id < 26
), d2 AS (
  SELECT comp.vec_id, lm.c, comp.dim // 8 AS j,
         SUM((comp.x - lm.lx) * (comp.x - lm.lx)) AS d
  FROM comp JOIN lm ON comp.dim = lm.dim
  GROUP BY comp.vec_id, lm.c, comp.dim // 8
), codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
    FROM d2
  ) WHERE rn = 1
), dtable AS (
  SELECT vec_id AS query_id, j, c, d FROM d2 WHERE vec_id < 10
), adc AS (
  SELECT t.query_id, k.vec_id AS neighbor_id, CAST(SUM(t.d) AS BIGINT) AS d2_adc
  FROM codes k JOIN dtable t ON k.j = t.j AND k.code = t.c
  WHERE k.vec_id <> t.query_id
  GROUP BY t.query_id, k.vec_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, d2_adc
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2_adc ASC, neighbor_id ASC) AS rnk
      FROM adc)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "vector_topk_pq_portable",
    oracle=PQ_PORTABLE_ORACLE,
    tags=("vector", "llm", "approx", "topk", "pq"),
)
def vector_topk_pq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k with a PORTABLE codebook: the
    16 landmark vectors (vec_id 10..25) supply each of the 8 subspaces'
    centroids, components are scaled to integers (×1000, the
    vector_mean_pool trick) so every distance is order-independent
    integer math — encode (argmin per subspace), the query×code
    distance table, ADC candidate scoring, and ranking are all
    bit-reproducible in SQL. Completes the portable-twin sweep:
    MinHash, SimHash, LSH, IVF, PQ. The kmeans-trained variant
    (vector_topk_pq) stays the quality path. Plan: one explode, one
    broadcast landmark join, hash-aggs, a broadcast distance-table
    join — no Python, no cartesian."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "vec_id", "dim", (F.floor(F.col("x") * 1000 + 0.5)).cast("bigint").alias("x")
    )
    lm = comp.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 26)).select(
        (F.col("vec_id") - 10).alias("c"), "dim", F.col("x").alias("lx")
    )
    d2 = (
        comp.join(F.broadcast(lm), "dim")
        .groupBy("vec_id", "c", (F.col("dim") / 8).cast("int").alias("j"))
        .agg(F.sum((F.col("x") - F.col("lx")) * (F.col("x") - F.col("lx"))).alias("d"))
    )
    from pyspark.sql import Window

    w_code = Window.partitionBy("vec_id", "j").orderBy("d", "c")
    codes = (
        d2.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "j", F.col("c").alias("code"))
    )
    dtable = d2.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "j", F.col("c").alias("code"), "d"
    )
    adc = (
        codes.join(F.broadcast(dtable), ["j", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("bigint").alias("d2_adc"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.asc("d2_adc"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "d2_adc")
        .orderBy("query_id", "rank")
    )


SEGMENT_DEDUP_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(t[i*10+1 : i*10+10], ' ') AS seg_text
  FROM toks, UNNEST(range(0, CAST(ceil(len(t)/10.0) AS BIGINT))) AS u(i)
), ranked AS (
  SELECT doc_id, seg_idx, seg_text,
         ROW_NUMBER() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
  FROM segs
), rebuilt AS (
  SELECT doc_id,
         string_agg(seg_text, ' ' ORDER BY seg_idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM ranked WHERE rn = 1 GROUP BY doc_id
), tot AS (
  SELECT doc_id, COUNT(*) AS n_total FROM segs GROUP BY doc_id
)
SELECT r.doc_id, r.clean_text, r.n_kept, t.n_total
FROM rebuilt r JOIN tot t USING (doc_id)
ORDER BY r.doc_id
"""


@register(
    "dedup_segments_keep_first",
    oracle=SEGMENT_DEDUP_ORACLE,
    tags=("dedup", "llm", "agg"),
)
def dedup_segments_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup with reconstruction (E2, the
    C4/RefinedWeb line-dedup stage): 10-token segments deduplicated
    globally keep-first, documents rebuilt from survivors — catches
    templated spans document-level dedup can't (151 duplicate segment
    occurrences in the sf0.01 corpus despite zero duplicate docs
    surviving earlier stages). See
    operators/dedup.py:segment_dedup_keep_first for the two-shuffle
    scale shape."""
    docs = _t(spark, sf_dir, "documents")
    return DD.segment_dedup_keep_first(docs, seg_tokens=10).orderBy("doc_id")


REPEATED_SPANS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), eligible AS (
  SELECT doc_id, t FROM toks WHERE len(t) >= 5
), pos AS (
  SELECT doc_id, i, array_to_string(t[i : i + 4], ' ') AS span
  FROM eligible, UNNEST(range(1, len(t) - 3)) AS u(i)
), multi_doc AS (
  SELECT span FROM (SELECT DISTINCT span, doc_id FROM pos)
  GROUP BY span HAVING COUNT(*) >= 2
), per_dup AS (
  SELECT p.doc_id, COUNT(*) AS n_dup_spans
  FROM pos p JOIN multi_doc m USING (span)
  GROUP BY p.doc_id
), per_tot AS (
  SELECT doc_id, COUNT(*) AS n_spans FROM pos GROUP BY doc_id
)
SELECT t.doc_id, t.n_spans,
       COALESCE(d.n_dup_spans, 0) AS n_dup_spans,
       FLOOR(COALESCE(d.n_dup_spans, 0) * 1.0 / t.n_spans * 1e6 + 0.5) / 1e6
         AS dup_frac
FROM per_tot t LEFT JOIN per_dup d USING (doc_id)
ORDER BY t.doc_id
"""


@register(
    "dedup_repeated_spans",
    oracle=REPEATED_SPANS_ORACLE,
    tags=("dedup", "llm", "agg"),
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication statistics (E2, the Lee-et-al
    signal): every overlapping 5-token span position, flagged when the
    span text recurs in another document; per-doc duplicated-span
    fraction. Complements doc-level Jaccard (whole-doc similarity) and
    segment keep-first (non-overlapping blocks) with the *how much of
    this doc is copied elsewhere* measure used to drive span-level
    excision at corpus scale. Runs the hashed span index (xxhash64
    8-byte shuffle keys — the 100 TB default); the DuckDB string-span
    oracle stays the value twin because collisions are absent at test
    cardinality. See operators/dedup.py:repeated_span_stats for the
    one-index-shuffle scale shape."""
    docs = _t(spark, sf_dir, "documents")
    return DD.repeated_span_stats(docs, n=5).orderBy("doc_id")


# Quality-aware canonical selection: DEDUP_CLUSTER_ORACLE's components
# with the survivor chosen by max quality (tie: min id) instead of min id.
KEEP_BEST_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
), lab AS (
  SELECT doc_id AS id, doc_id AS label FROM documents
), l1 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM lab l LEFT JOIN edges e ON l.id = e.src
             LEFT JOIN lab e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l2 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l1 l LEFT JOIN edges e ON l.id = e.src
            LEFT JOIN l1 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), l3 AS (
  SELECT l.id, LEAST(l.label, COALESCE(MIN(e2.label), l.label)) AS label
  FROM l2 l LEFT JOIN edges e ON l.id = e.src
            LEFT JOIN l2 e2 ON e.dst = e2.id
  GROUP BY l.id, l.label
), q AS (
  SELECT
    doc_id,
    FLOOR(((
      LEAST(length(text) / 400.0, 1.0)
      + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
      + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                     / length(text) * 4, 1.0))
    ) / 3.0) * 1e6 + 0.5) / 1e6 AS quality
  FROM documents
)
SELECT l3.id, l3.label AS cluster_id, q.quality,
       ROW_NUMBER() OVER (PARTITION BY l3.label ORDER BY q.quality DESC, l3.id) = 1
         AS keep
FROM l3 JOIN q ON l3.id = q.doc_id
ORDER BY l3.id
"""


@register(
    "dedup_cluster_keep_best",
    oracle=KEEP_BEST_ORACLE,
    tags=("dedup", "llm", "graph", "quality"),
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (E2 end-to-end, production
    flavor): near-dup clusters as in dedup_cluster_keep_min, but the
    survivor is the HIGHEST-QUALITY member (heuristic score of
    text_quality_score; ties to min id) — what real pipelines keep,
    rather than the arbitrary first id. One extra broadcast-size join
    + per-cluster window over keep-min's plan."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    ids = docs.select(F.col("doc_id").alias("id"))
    clusters = DD.dedup_clusters(pairs, ids).drop("keep")
    q = docs.select(
        F.col("doc_id").alias("id"), TXT.quality_score("text").alias("quality")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("id"))
    return (
        clusters.join(q, "id")
        .withColumn("_rn", F.row_number().over(w))
        .select("id", "cluster_id", "quality", (F.col("_rn") == 1).alias("keep"))
        .orderBy("id")
    )


HARD_NEG_ORACLE = """
WITH a AS (
  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS negative_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT anchor_id, negative_id,
         list_dot_product(av, cv)
           / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(cv, cv))) AS raw
  FROM a, c
  WHERE anchor_id != negative_id
)
SELECT anchor_id, negative_id, CAST(rnk AS INTEGER) AS rank,
       FLOOR(raw * 1e6 + 0.5) / 1e6 AS cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY FLOOR(raw * 1e6 + 0.5) / 1e6 DESC,
                                        negative_id ASC) AS rnk
  FROM scored WHERE raw < 0.35
)
WHERE rnk <= 3
ORDER BY anchor_id, rank
"""


@register(
    "mine_hard_negatives",
    oracle=HARD_NEG_ORACLE,
    tags=("vector", "llm", "training", "topk"),
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (E3×training): per anchor, the 3 most
    similar NON-positive vectors (raw cosine < 0.35, the near-dup
    threshold) — the maximally-confusable negatives a contrastive
    embedding loss learns most from. operators/similarity.py:
    mine_hard_negatives; LSH buckets are the documented candidate
    stage at scale."""
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 10)
    return SIM.mine_hard_negatives(emb, anchors, k=3, positive_threshold=0.35).orderBy(
        "anchor_id", "rank"
    )


@register("text_bpe_tokenize", oracle=None, tags=("text", "llm", "training"))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL learned-merge BPE (operators/bpe.py), not the regex
    approximation (that stays as text_token_count_bpe): distributed
    word-frequency count → driver-side greedy merge loop (|vocab|,
    not |corpus| — the PQ-codebook pattern) → Arrow-batched apply
    with a per-worker word cache. Iterative training is not
    SQL-expressible → rows-only here; the learned merges and
    segmentations are pinned against a pure-Python reference in
    tests/test_operators.py."""
    from data_lake_with_spark_spark.operators import bpe as BPE

    docs = _t(spark, sf_dir, "documents")
    merges = BPE.learn_bpe_merges(docs, n_merges=40)
    return (
        BPE.apply_bpe(docs, merges)
        .select("doc_id", "n_bpe_tokens", F.col("bpe_tokens").alias("bpe_tokens"))
        .orderBy("doc_id")
    )


AUDIO_ENERGY_ORACLE = """
WITH s AS (
  SELECT doc_id, UNNEST(range(64)) AS i FROM documents WHERE doc_id < 200
), pcm AS (
  SELECT doc_id, i // 16 AS frame_idx,
         ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
  FROM s
)
SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(MAX(ABS(v)) AS INTEGER) AS peak
FROM pcm GROUP BY doc_id, frame_idx
ORDER BY media_id, frame_idx
"""


@register(
    "multimodal_audio_energy",
    oracle=AUDIO_ENERGY_ORACLE,
    tags=("multimodal", "llm", "decode"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction (E5): decode real WAV bytes
    (stdlib decoder, same path as decode_audio_wav), split the PCM
    into 16-sample frames, and compute per-frame energy (Σv², exact
    integer math) and peak — the VAD/loudness-gating primitives of an
    audio data pipeline. The frame split is a JVM posexplode over the
    decoded array; all arithmetic stays integral so the analytic
    oracle hash-matches bit-for-bit."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_wav_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    frames = dec.select(
        "media_id",
        F.posexplode("values").alias("i", "v"),
    ).select(
        "media_id",
        (F.col("i") / 16).cast("int").alias("frame_idx"),
        F.col("v").cast("bigint").alias("v"),
    )
    return (
        frames.groupBy("media_id", "frame_idx")
        .agg(
            F.sum(F.col("v") * F.col("v")).alias("energy"),
            F.max(F.abs("v")).cast("int").alias("peak"),
        )
        .orderBy("media_id", "frame_idx")
    )


# One driver-side source of truth for the quantized DFT basis: the
# same integer rows feed the Spark literals AND this generated SQL.
_DFT_VALUES = ", ".join(
    f"({k}, {cc}, {cs})" for k, cc, cs in MM.dft_coefficients((1, 4, 8), 64)
)

SPECTRAL_ORACLE = f"""
WITH s AS (
  SELECT doc_id, UNNEST(range(64)) AS i FROM documents WHERE doc_id < 200
), pcm AS (
  SELECT doc_id, i, ((doc_id * 31 + i * 7) % 65536) - 32768 AS v
  FROM s
), coef AS (
  SELECT k, UNNEST(range(64)) AS i, UNNEST(cc) AS c, UNNEST(cs) AS sn
  FROM (VALUES {_DFT_VALUES}) AS t(k, cc, cs)
), corr AS (
  SELECT p.doc_id, c.k,
         SUM(CAST(p.v AS BIGINT) * c.c) AS re,
         SUM(CAST(p.v AS BIGINT) * c.sn) AS im
  FROM pcm p JOIN coef c USING (i)
  GROUP BY 1, 2
)
SELECT doc_id AS media_id, CAST(k AS INTEGER) AS k,
       FLOOR(((re / 1000000.0) * (re / 1000000.0)
              + (im / 1000000.0) * (im / 1000000.0)) * 1e4 + 0.5) / 1e4
         AS power
FROM corr ORDER BY media_id, k
"""


@register(
    "multimodal_spectral_power",
    oracle=SPECTRAL_ORACLE,
    tags=("multimodal", "llm", "decode"),
)
def multimodal_spectral_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT spectral power at fixed bins (E5): decode real WAV bytes,
    correlate the PCM against a driver-quantized integer trig basis —
    exact BIGINT folds per (clip, bin), doubles only in the final
    power — so frequency-domain feature extraction hash-matches a SQL
    oracle generated from the same coefficient table. Zero shuffles:
    3 basis rows broadcast, two zip_with folds per clip. See
    operators/multimodal.py:spectral_power."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.attach_wav_payloads(docs, "doc_id")
    dec = MM.decode_media(media)
    return MM.spectral_power(dec, ks=(1, 4, 8)).orderBy("media_id", "k")


COOC_ORACLE = r"""
WITH dt AS (
  SELECT DISTINCT doc_id,
         UNNEST(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt
), na AS (
  SELECT tok, COUNT(*) AS n FROM dt GROUP BY tok
), pairs AS (
  SELECT a.tok AS a, b.tok AS b, COUNT(*) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
)
SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
       FLOOR((n_ab * n.n_docs * 1.0 / (x.n * y.n)) * 1e6 + 0.5) / 1e6 AS lift
FROM pairs JOIN na x ON a = x.tok JOIN na y ON b = y.tok CROSS JOIN n
WHERE n_ab >= 5
ORDER BY lift DESC, a ASC, b ASC
LIMIT 20
"""


@register(
    "text_cooccurrence_lift",
    oracle=COOC_ORACLE,
    tags=("text", "llm", "agg"),
)
def text_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift (PMI's rational core, kept log-free so
    it stays engine-exact): top-20 doc-level token pairs by
    n_ab·N/(n_a·n_b). Pair generation happens INSIDE the scan as a
    per-row HOF over the sorted distinct-token array — work is
    Σ C(distinct_tokens_per_doc, 2), bounded per document, with one
    hash agg after; never the posting-list self-join whose cost
    explodes on common tokens. Marginals reuse the exploded distinct
    (doc, token) pairs; the final ranking is a distributed top-k."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(TXT.tokens("text"))).alias("t"),
    )
    pairs_col = F.expr(
        "flatten(transform(t, (x, i) ->"
        " transform(slice(t, i + 2, size(t)), y -> struct(x AS a, y AS b))))"
    )
    pair_counts = (
        toks.select(F.explode(pairs_col).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    dt = toks.select("doc_id", F.explode("t").alias("tok"))
    na = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    n_docs = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    lift = (
        F.col("n_ab") * F.col("n_docs") * F.lit(1.0) / (F.col("x_n") * F.col("y_n"))
    )
    return (
        pair_counts.join(
            F.broadcast(na.select(F.col("tok").alias("a"), F.col("n").alias("x_n"))),
            "a",
        )
        .join(
            F.broadcast(na.select(F.col("tok").alias("b"), F.col("n").alias("y_n"))),
            "b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (F.floor(lift * 1e6 + F.lit(0.5)) / 1e6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


BYTESTATS_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, md5(text) || md5(text || 'x') AS hx FROM documents
), b AS (
  SELECT media_id,
         (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
  FROM m, (SELECT UNNEST(range(32)) AS i) r
)
SELECT media_id,
       CAST(32 AS BIGINT) AS n_bytes,
       CAST(SUM(byte) AS BIGINT) AS byte_sum,
       CAST(bit_xor(byte) AS INTEGER) AS byte_xor,
       CAST(MIN(byte) AS INTEGER) AS byte_min,
       CAST(MAX(byte) AS INTEGER) AS byte_max
FROM b GROUP BY media_id ORDER BY media_id
"""


@register(
    "multimodal_bytestats_arrow",
    oracle=BYTESTATS_ORACLE,
    tags=("multimodal", "llm", "arrow"),
)
def multimodal_bytestats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload byte statistics via the ``mapInArrow`` seam —
    completes the Python-UDF surface matrix (pandas_udf / GROUPED_AGG
    / grouped-map / cogrouped / mapInPandas / stateful / UDTF /
    mapInArrow): record batches stay in Arrow end to end, the payload
    bytes are touched as numpy views over Arrow buffers, and the
    deterministic synthetic payloads (unhex(md5(text))×2, the E5
    plumbing convention) let DuckDB recompute every statistic from
    hex arithmetic — an ORACLED Arrow-native binary kernel."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    return MM.byte_stats_arrow(media).orderBy("media_id")


TRAINSET_ORACLE = r"""
WITH quality AS (
  SELECT doc_id,
         (LEAST(length(text) / 400.0, 1.0)
          + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
          + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                         / length(text) * 4, 1.0))) / 3.0 AS q
  FROM documents
), eligible AS (
  SELECT d.doc_id, d.text FROM documents d JOIN quality USING (doc_id)
  WHERE q >= 0.5
), survivors AS (
  SELECT MIN(doc_id) AS doc_id FROM eligible GROUP BY md5(text)
), kept AS (
  SELECT e.doc_id, e.text FROM eligible e JOIN survivors USING (doc_id)
  WHERE e.doc_id >= 20
), toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS g
  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
  WHERE len(t) >= 8
), contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM sh c JOIN sh b ON c.g = b.g
  WHERE b.doc_id < 20 AND c.doc_id >= 20
), clean AS (
  SELECT k.doc_id, k.text FROM kept k
  LEFT JOIN contaminated c ON k.doc_id = c.doc_id
  WHERE c.doc_id IS NULL
), stats AS (
  SELECT CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) % 8 AS shard,
         len(string_split_regex(trim(text), '\s+')) AS n_tok
  FROM clean
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM stats GROUP BY shard ORDER BY shard
"""


@register(
    "pipeline_trainset_stats",
    oracle=TRAINSET_ORACLE,
    tags=("text", "llm", "dedup", "pipeline", "training"),
)
def pipeline_trainset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END trainset build, composed from the pipeline's
    own stages and verified as ONE query: quality gate (≥0.5 raw
    score) → exact content dedup (min doc_id per md5 fingerprint) →
    benchmark decontamination (drop any doc sharing a word 8-gram
    with the doc_id<20 eval set — inverted-index semi join, xxhash64
    keys, benchmark side broadcast) → content-addressed 8-way shard
    assignment → per-shard doc and token counts. Every stage is the
    scale shape its standalone query documents; composing them costs
    no extra scans of the corpus beyond the stages themselves, and
    the single oracle proves the stage BOUNDARIES (filter-before-
    dedup, dedup-before-decontaminate) agree too — the integration
    property the per-stage oracles can't see."""
    docs = _t(spark, sf_dir, "documents")
    eligible = docs.where(_quality_raw("text") >= 0.5)
    survivors = (
        eligible.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = eligible.join(survivors, "doc_id").where(F.col("doc_id") >= 20)
    grams = DD.shingle_table(docs, n=8).select(
        "id", F.xxhash64("shingle").alias("g")
    )
    bench = grams.where(F.col("id") < 20).select("g").distinct()
    contaminated = (
        grams.where(F.col("id") >= 20)
        .join(F.broadcast(bench), "g")
        .select(F.col("id").alias("doc_id"))
        .distinct()
    )
    clean = kept.join(contaminated, "doc_id", "left_anti")
    shard = F.expr(
        "pmod(CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT), 8)"
    )
    return (
        clean.select(
            shard.alias("shard"),
            TXT.token_count(F.col("text")).alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("shard")
    )


VIDEO_DECIMATE_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         md5(text) || md5(text || 'f') || md5(text || 'g') AS h
  FROM documents
), s AS (
  -- frames 0,2,4 of six 8-byte frames = hex chars [1,16], [33,48], [65,80]
  SELECT media_id,
         sha256(substr(h, 1, 16) || substr(h, 33, 16) || substr(h, 65, 16)) AS d
  FROM m
), b AS (
  SELECT media_id,
         list_sum(list_transform(range(8), i ->
             (strpos('0123456789abcdef', substr(d, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 2 * i + 2, 1)) - 1))) AS sm
  FROM s
)
SELECT media_id,
       CAST(3 AS BIGINT) AS n_frames_sampled,
       CAST(24 AS BIGINT) AS n_bytes,
       FLOOR(sm / 255.0 * 1000000.0 + 0.5) / 1000000.0 AS feature_sum
FROM b ORDER BY media_id
"""


@register(
    "multimodal_video_decimate", oracle=VIDEO_DECIMATE_ORACLE, tags=("multimodal", "llm")
)
def multimodal_video_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-rate decimation (E5 — decode / extract /
    resize / FRAME-SAMPLE): 6-frame fake videos decimated to every 2nd
    frame by pure JVM byte slicing (payload shrinks 2× before any
    Arrow stage — operators/multimodal.py:frame_decimate), then
    Arrow-batched feature extraction over the kept frames.
    Value-verified end-to-end: the oracle re-derives the sampled
    payload as the hex spans of frames 0/2/4 and the features via
    sha256(hex) — the gather, the metadata rewrite, and the Arrow
    stage all hash-check."""
    docs = _t(spark, sf_dir, "documents")
    vid = MM.attach_fake_video(docs, "doc_id", "text")
    sam = MM.frame_decimate(vid, every=2)
    feats = MM.fake_feature_extract(sam)
    byte_sum = F.aggregate(
        "feature_bytes", F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return (
        sam.select(
            "media_id",
            F.col("meta.n_frames").alias("n_frames_sampled"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .join(feats, "media_id")
        .select(
            "media_id",
            "n_frames_sampled",
            "n_bytes",
            pround(byte_sum / F.lit(255.0), 6).alias("feature_sum"),
        )
        .orderBy("media_id")
    )


_LSHP_CTES = LSH_PORTABLE_ORACLE.split("\nSELECT query_id, neighbor_id, CAST(rnk")[0]

RECALL_MRR_ORACLE = _LSHP_CTES + """, ann AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored)
  WHERE rnk <= 10
), ex_scored AS (
  SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id,
         FLOOR(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM e qe, e ce
  WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
), exact AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM ex_scored)
  WHERE rnk <= 10
), ov AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM ann a JOIN exact x USING (query_id, neighbor_id)
  GROUP BY a.query_id
), best AS (
  SELECT query_id, neighbor_id AS best_id FROM exact WHERE rnk = 1
), hit AS (
  SELECT b.query_id, a.rnk AS hit_rank
  FROM best b LEFT JOIN ann a
    ON a.query_id = b.query_id AND a.neighbor_id = b.best_id
), qs AS (
  SELECT DISTINCT vec_id AS query_id FROM e WHERE vec_id < 10
)
SELECT q.query_id AS query_id,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       FLOOR((COALESCE(ov.n_overlap, 0) / 10.0) * 10000.0 + 0.5) / 10000.0
         AS recall_at_10,
       FLOOR(COALESCE(1.0 / hit.hit_rank, 0.0) * 1000000.0 + 0.5) / 1000000.0
         AS reciprocal_rank
FROM qs q
LEFT JOIN ov ON ov.query_id = q.query_id
LEFT JOIN hit ON hit.query_id = q.query_id
ORDER BY q.query_id"""


@register(
    "ml_recall_mrr_at_k",
    oracle=RECALL_MRR_ORACLE,
    tags=("vector", "llm", "topk", "training"),
)
def ml_recall_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval quality as an ORACLED query: recall@10 and the
    reciprocal rank of the true nearest neighbor, grading the
    portable hyperplane-LSH top-10 against exact brute-force cosine
    per query -- the offline eval loop every vector-index deployment
    runs before swapping indexes. Both rankings are deterministic
    (integer plane dots / portable-rounded cosines, id tie-breaks),
    so the METRICS themselves hash-check cross-engine -- unlike the
    seeded-numpy fast paths whose recall is pinned by pytest only.
    Recall denominator is fixed k (absent candidates score zero);
    MRR = 1/rank of the exact-best neighbor inside the ANN list, 0 on
    a miss.

    Both rankings feed two consumers each (overlap + best-hit), so
    they are lazy shared caches — uncached, the LSH pipeline and the
    brute-force scorer re-ran per consumer (13 effective FileScans,
    round-9 scan audit)."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    emb = _t(spark, sf_dir, "embeddings")
    ann = shared(_lshp_topk(spark, emb, k=10))
    queries = emb.where(F.col("vec_id") < 10)
    exact = shared(SIM.brute_force_topk(emb, queries, k=10))
    ov = (
        ann.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    best = exact.where(F.col("rank") == 1).select(
        "query_id", F.col("neighbor_id").alias("best_id")
    )
    hit = best.join(
        ann.select("query_id", F.col("neighbor_id").alias("best_id"),
                   F.col("rank").alias("hit_rank")),
        ["query_id", "best_id"],
        "left",
    ).select("query_id", "hit_rank")
    qs = queries.select(F.col("vec_id").alias("query_id"))
    return (
        qs.join(ov, "query_id", "left")
        .join(hit, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0).cast("bigint")).alias("n_overlap"),
            pround(F.coalesce("n_overlap", F.lit(0).cast("bigint")) / F.lit(10.0), 4).alias(
                "recall_at_10"
            ),
            pround(
                F.coalesce(F.lit(1.0) / F.col("hit_rank"), F.lit(0.0)), 6
            ).alias("reciprocal_rank"),
        )
        .orderBy("query_id")
    )


import math as _math

_NDCG_W = {i: int(_math.floor(1e6 / _math.log2(i + 1) + 0.5)) for i in range(1, 11)}
_NDCG_IDCG = sum((11 - i) * _NDCG_W[i] for i in range(1, 11))
_NDCG_VALUES = ", ".join(f"({i}, {w})" for i, w in _NDCG_W.items())

NDCG_ORACLE = _LSHP_CTES + """, ann AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM scored)
  WHERE rnk <= 10
), ex_scored AS (
  SELECT qe.vec_id AS query_id, ce.vec_id AS neighbor_id,
         FLOOR(list_dot_product(qe.v, ce.v)
               / (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM e qe, e ce
  WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
), exact AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id ASC) AS rnk
    FROM ex_scored)
  WHERE rnk <= 10
), w AS (
  SELECT * FROM (VALUES {wvals}) AS v(i, wt)
), dcg AS (
  SELECT a.query_id,
         CAST(SUM(COALESCE(11 - x.rnk, 0) * w.wt) AS BIGINT) AS dcg_scaled
  FROM ann a
  JOIN w ON w.i = a.rnk
  LEFT JOIN exact x ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
  GROUP BY a.query_id
), qs AS (
  SELECT DISTINCT vec_id AS query_id FROM e WHERE vec_id < 10
)
SELECT q.query_id AS query_id,
       CAST(COALESCE(d.dcg_scaled, 0) AS BIGINT) AS dcg_scaled,
       FLOOR((COALESCE(d.dcg_scaled, 0) / {idcg}.0) * 1000000.0 + 0.5) / 1000000.0
         AS ndcg_at_10
FROM qs q LEFT JOIN dcg d ON d.query_id = q.query_id
ORDER BY q.query_id""".replace("{wvals}", _NDCG_VALUES).replace("{idcg}", str(_NDCG_IDCG))


@register(
    "ml_ndcg_at_k",
    oracle=NDCG_ORACLE,
    tags=("vector", "llm", "topk", "training"),
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the portable-LSH ranking against brute-force graded
    relevance (rel = 11 - exact rank, 0 outside the exact top-10) --
    the position-sensitive companion of ml_recall_mrr_at_k. The
    1/log2(i+1) discount weights are PRECOMPUTED integer constants
    (i <= 10), embedded identically in the Spark plan and the SQL
    twin -- no runtime transcendental at all, so DCG is an exact
    integer sum; IDCG is the same constant for every query (the exact
    list always carries rels 10..1), leaving ONE portable-rounded
    division."""
    emb = _t(spark, sf_dir, "embeddings")
    ann = _lshp_topk(spark, emb, k=10)
    queries = emb.where(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, queries, k=10)
    wdf = spark.createDataFrame(
        [(i, w) for i, w in _NDCG_W.items()], "i int, wt bigint"
    )
    dcg = (
        ann.join(F.broadcast(wdf), ann["rank"] == wdf["i"])
        .join(
            exact.select(
                "query_id", "neighbor_id", F.col("rank").alias("x_rnk")
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.coalesce(F.lit(11) - F.col("x_rnk"), F.lit(0)) * F.col("wt")
            )
            .cast("bigint")
            .alias("dcg_scaled")
        )
    )
    qs = queries.select(F.col("vec_id").alias("query_id"))
    return (
        qs.join(dcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("dcg_scaled", F.lit(0).cast("bigint")).alias("dcg_scaled"),
            pround(
                F.coalesce("dcg_scaled", F.lit(0).cast("bigint"))
                / F.lit(float(_NDCG_IDCG)),
                6,
            ).alias("ndcg_at_10"),
        )
        .orderBy("query_id")
    )


_MHP_CTES = MINHASH_PORTABLE_ORACLE.split("), sizes AS (")[0] + ")"

MINHASH_ERR_ORACLE = _MHP_CTES + """, sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.a_id
  JOIN sh b ON b.doc_id = c.b_id AND a.shingle = b.shingle
  GROUP BY c.a_id, c.b_id
), agree AS (
  SELECT c.a_id, c.b_id, CAST(COUNT_IF(sa.v = sb.v) AS BIGINT) AS n_agree
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id AND sb.i = sa.i
  GROUP BY c.a_id, c.b_id
), rounded AS (
  SELECT g.a_id, g.b_id, g.n_agree,
         FLOOR((g.n_agree / 16.0) * 1000000.0 + 0.5) / 1000000.0 AS jaccard_est,
         FLOOR((i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter))
               * 1000000.0 + 0.5) / 1000000.0 AS jaccard_exact
  FROM agree g
  JOIN inter i ON i.a_id = g.a_id AND i.b_id = g.b_id
  JOIN sizes sa ON g.a_id = sa.doc_id
  JOIN sizes sb ON g.b_id = sb.doc_id
)
SELECT a_id, b_id, n_agree, jaccard_est, jaccard_exact,
       FLOOR(ABS(jaccard_est - jaccard_exact) * 1000000.0 + 0.5) / 1000000.0
         AS abs_err
FROM rounded ORDER BY a_id, b_id"""


@register(
    "ml_minhash_jaccard_error",
    oracle=MINHASH_ERR_ORACLE,
    tags=("dedup", "llm", "minhash", "training"),
)
def ml_minhash_jaccard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy eval for the MinHash pipeline: on every
    band-candidate pair, the signature-estimated Jaccard (matching
    components / 16) next to the EXACT shingle Jaccard and their
    absolute error -- the calibration readout that tells a dedup
    operator whether 16 permutations x 4x4 banding is enough for the
    corpus before trusting the threshold (the ANN counterpart is
    ml_recall_mrr_at_k). Portable hash family end to end, so the
    error table itself is value-verified; candidates still come only
    from the band join (never all pairs). Exact intersections are
    JVM array_intersect over the per-doc distinct-shingle arrays."""
    docs = _t(spark, sf_dir, "documents")
    sigs = _mh_portable_sigs(docs)
    cand = _mh_band_candidates(sigs)
    sa = sigs.select(
        F.col("doc_id").alias("a_id"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b_id"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(16)],
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(1, 16)
    ) + (F.col("a0") == F.col("b0")).cast("int")
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    est = F.floor((F.col("n_agree") / F.lit(16.0)) * 1e6 + 0.5) / 1e6
    exact = (
        F.floor((F.col("n_inter") * F.lit(1.0) / F.col("n_union")) * 1e6 + 0.5)
        / 1e6
    )
    rounded = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            agree.cast("bigint").alias("n_agree"),
            n_inter.alias("n_inter"),
            n_union.alias("n_union"),
        )
        .select(
            "a_id",
            "b_id",
            "n_agree",
            est.alias("jaccard_est"),
            exact.alias("jaccard_exact"),
        )
    )
    return rounded.select(
        "a_id",
        "b_id",
        "n_agree",
        "jaccard_est",
        "jaccard_exact",
        (
            F.floor(
                F.abs(F.col("jaccard_est") - F.col("jaccard_exact")) * 1e6 + 0.5
            )
            / 1e6
        ).alias("abs_err"),
    ).orderBy("a_id", "b_id")


def _neardup_trainset_oracle() -> str:
    mh_body = MINHASH_PORTABLE_ORACLE.split("WITH ", 1)[1]
    ctes, final = mh_body.split("\nSELECT i.a_id")
    ctes = ctes.replace("FROM documents", "FROM eligible")
    return (
        r"""WITH quality AS (
  SELECT doc_id,
         (LEAST(length(text) / 400.0, 1.0)
          + LEAST(len(string_split_regex(trim(text), '\s+')) / 60.0, 1.0)
          + (1.0 - LEAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                         / length(text) * 4, 1.0))) / 3.0 AS q
  FROM documents
), eligible AS (
  SELECT d.doc_id, d.text, d.lang FROM documents d JOIN quality USING (doc_id)
  WHERE q >= 0.5
), """
        + ctes
        + r""", dropped AS (
  SELECT DISTINCT i.b_id AS doc_id
  FROM inter i
  JOIN sizes sa ON i.a_id = sa.doc_id
  JOIN sizes sb ON i.b_id = sb.doc_id
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
), clean AS (
  SELECT e.doc_id, e.text, e.lang FROM eligible e
  LEFT JOIN dropped d ON e.doc_id = d.doc_id
  WHERE d.doc_id IS NULL
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
         AS total_tokens
FROM clean GROUP BY lang ORDER BY lang"""
    )


@register(
    "pipeline_neardup_trainset",
    oracle=_neardup_trainset_oracle(),
    tags=("text", "llm", "dedup", "pipeline", "training", "minhash"),
)
def pipeline_neardup_trainset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEAR-DUP flavor of the end-to-end trainset build, verified
    as one query: quality gate (>= 0.5 raw score) -> portable-MinHash
    near-dup keep-first over the SURVIVING docs only (band candidates
    + exact Jaccard >= 0.5, drop every doc with a smaller-id
    near-dup; candidates never cross the quality boundary -- the
    stage-ordering property the single chained oracle proves) ->
    per-language doc and token counts. Complements
    pipeline_trainset_stats (exact dedup + decontamination branch);
    together they are the two canonical corpus-build topologies.
    Shuffle budget = the stages' own: one quality map, the banded
    self-join, one rollup."""
    docs = _t(spark, sf_dir, "documents")
    eligible = docs.where(_quality_raw("text") >= 0.5).select(
        "doc_id", "text", "lang"
    )
    dropped = (
        _mh_near_pairs(eligible, threshold=0.5)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    clean = eligible.join(dropped, "doc_id", "left_anti")
    return (
        clean.select("lang", TXT.token_count(F.col("text")).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang")
    )
