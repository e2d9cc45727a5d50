"""Round-7 extended operators: binary-quantized ANN, changelog
compaction, model calibration, rank statistics, tokenizer evaluation.

Same discipline as the rest of the registry: integer-exact or
deterministically-rounded outputs, full DuckDB oracles, no cartesian
products (broadcast-of-bounded-queries only), no Python in the hot
path. These extend the LLM-pipeline surface (SURVEY §2.10) beyond the
reference's own operators (reference scope: /root/reference/etl.py —
these have no counterpart there; they are the training-data-pipeline
extensions the build brief mandates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions import text as TXT
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Binary (sign-bit) vector quantization + Hamming-shortlist ANN
# ---------------------------------------------------------------------------

HAMMING_TOPK_ORACLE = r"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         v[UNNEST(range(len(v))) + 1] AS x
  FROM e
), codes AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dim < 32 AND x > 0
                       THEN (CAST(1 AS BIGINT) << dim) ELSE 0 END) AS BIGINT) AS code_lo,
         CAST(SUM(CASE WHEN dim >= 32 AND x > 0
                       THEN (CAST(1 AS BIGINT) << (dim - 32)) ELSE 0 END) AS BIGINT) AS code_hi
  FROM comp GROUP BY vec_id
), q AS (
  SELECT vec_id AS query_id, code_lo AS qlo, code_hi AS qhi
  FROM codes WHERE vec_id < 10
), ham AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.code_lo, q.qlo))
              + bit_count(xor(c.code_hi, q.qhi)) AS INTEGER) AS hamming
  FROM codes c, q WHERE c.vec_id <> q.query_id
), shortlist AS (
  SELECT query_id, neighbor_id, hamming
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming ASC, neighbor_id ASC) AS rn
        FROM ham)
  WHERE rn <= 60
), scored AS (
  SELECT s.query_id, s.neighbor_id, s.hamming,
         FLOOR(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM shortlist s
  JOIN e a ON a.vec_id = s.query_id
  JOIN e b ON b.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, hamming, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rnk
      FROM scored)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "vector_topk_hamming",
    oracle=HAMMING_TOPK_ORACLE,
    tags=("vector", "llm", "approx", "topk", "quantize"),
)
def vector_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: 64-dim float vectors collapse to a 64-bit
    sign code (two 32-bit BIGINT halves — a single `1<<63` overflows
    DuckDB's signed shift, and two int32 popcounts are how a columnar
    engine would SIMD it anyway), Hamming top-60 shortlist per query by
    XOR+popcount, exact cosine rerank to top-5 (measured candidate
    recall vs exact top-5: 0.70 at the test scales — the honest 1
    bit/dim number on near-isotropic vectors; clustered corpora and
    fatter shortlist ratios do better, and the rerank keeps precision
    exact). The memory story at
    100 TB: 32× corpus compression (8 bytes/vector), the shortlist
    scan touches only integer codes (queries broadcast, corpus never
    shuffled until the ≤60-row-per-query rerank join), and every stage
    is integer math — fully oracle-checkable, unlike float-score ANN.
    """
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    codes = comp.groupBy("vec_id").agg(
        F.sum(
            F.when(
                (F.col("dim") < 32) & (F.col("x") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), dim)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("code_lo"),
        F.sum(
            F.when(
                (F.col("dim") >= 32) & (F.col("x") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), dim - 32)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("code_hi"),
    )
    q = codes.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("code_lo").alias("qlo"),
        F.col("code_hi").alias("qhi"),
    )
    ham = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("code_lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("code_hi").bitwiseXOR(F.col("qhi")))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    w_short = W.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    shortlist = (
        ham.withColumn("rn", F.row_number().over(w_short))
        .where(F.col("rn") <= 60)
        .drop("rn")
    )
    from data_lake_with_spark_spark.functions.vector import dot, norm

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    b = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    score = dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv")))
    scored = (
        shortlist.join(F.broadcast(a), "query_id")
        .join(b, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            (F.floor(score * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w_rank = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "hamming",
            "score",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# CDC changelog compaction (net-effect per key)
# ---------------------------------------------------------------------------

CHANGELOG_COMPACT_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op
  FROM events
), ordered AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes,
         MIN(event_id) OVER (PARTITION BY user_id) AS first_event_id
  FROM log
)
SELECT user_id,
       CAST(n_changes AS INTEGER) AS n_changes,
       first_event_id,
       event_id AS last_event_id,
       op AS last_op,
       CASE WHEN op = 'D' THEN 'DELETE' ELSE 'UPSERT' END AS net,
       CASE WHEN op = 'D' THEN NULL ELSE value END AS last_value
FROM ordered
WHERE rn = 1
ORDER BY user_id
"""


@register(
    "cdc_changelog_compact",
    oracle=CHANGELOG_COMPACT_ORACLE,
    tags=("cdc", "lakehouse"),
)
def cdc_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — the Debezium/Flink-upsert primitive: a
    keyed stream of I/U/D changes collapses to its NET effect (last
    write wins; a trailing delete tombstones the key), so a downstream
    MERGE applies one row per key instead of replaying every change.
    The event log stands in as the changelog (signup=I, error=D, rest
    =U), ordered by (ts, event_id). Plan: one window shuffle on the
    key — the same shape a 1000-executor compactor would run, since
    per-key change history co-locates under hash partitioning."""
    ev = _t(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    key = W.partitionBy("user_id")
    ordered = log.select(
        "user_id",
        "event_id",
        "op",
        "value",
        F.row_number()
        .over(key.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(key).cast("int").alias("n_changes"),
        F.min("event_id").over(key).alias("first_event_id"),
    )
    return (
        ordered.where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_changes",
            "first_event_id",
            F.col("event_id").alias("last_event_id"),
            F.col("op").alias("last_op"),
            F.when(F.col("op") == "D", F.lit("DELETE"))
            .otherwise(F.lit("UPSERT"))
            .alias("net"),
            F.when(F.col("op") == "D", F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Model calibration (reliability bins + exact ECE numerator)
# ---------------------------------------------------------------------------

CALIBRATION_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) % 1000000 AS conf_ppm,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
  FROM orders
)
SELECT CAST(conf_ppm // 100000 AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(label) AS BIGINT) AS positives,
       CAST(SUM(conf_ppm) AS BIGINT) AS conf_sum_ppm,
       CAST(ABS(SUM(label) * 1000000 - SUM(conf_ppm)) AS BIGINT) AS ece_num
FROM scored
GROUP BY 1
ORDER BY bin
"""


@register(
    "ml_calibration_ece",
    oracle=CALIBRATION_ORACLE,
    tags=("ml", "stats"),
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins with the EXACT expected-calibration-
    error numerator: confidence in ppm (integer), 10 equal bins,
    per-bin |positives·1e6 − Σconf| — ECE = Σ ece_num / (N·1e6) with
    one float division left to the reader, so every emitted cell is
    order-independent BIGINT math (the calibration readout every
    quality-classifier training run ends with). Confidence is a
    deterministic price-derived pseudo-score: the engine contract is
    the binning + exact-gap math, not the toy score. One hash-agg on
    a 10-value key — map-side combine makes it a broadcast-scale
    shuffle at any corpus size."""
    orders = _t(spark, sf_dir, "orders")
    scored = orders.select(
        (
            F.floor(F.col("o_totalprice") * 100).cast("bigint") % 1000000
        ).alias("conf_ppm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    return (
        scored.groupBy(
            F.expr("CAST(conf_ppm div 100000 AS INT)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("positives"),
            F.sum("conf_ppm").cast("bigint").alias("conf_sum_ppm"),
            F.abs(
                F.sum("label") * F.lit(1000000) - F.sum("conf_ppm")
            )
            .cast("bigint")
            .alias("ece_num"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (one-vs-rest, distinct-value spine, average-rank ties)
# ---------------------------------------------------------------------------

MANN_WHITNEY_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS v FROM events
), spine AS (
  SELECT v, COUNT(*) AS cnt FROM s GROUP BY v
), ranked AS (
  SELECT v, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cumb
  FROM spine
), per_type AS (
  SELECT event_type, v, COUNT(*) AS cnt_t FROM s GROUP BY event_type, v
)
SELECT p.event_type,
       CAST(SUM(p.cnt_t) AS BIGINT) AS n,
       CAST(SUM(p.cnt_t * (2 * r.cumb + r.cnt + 1))
            - SUM(p.cnt_t) * (SUM(p.cnt_t) + 1) AS BIGINT) AS u2
FROM per_type p JOIN ranked r ON p.v = r.v
GROUP BY p.event_type
ORDER BY p.event_type
"""


@register(
    "stats_mann_whitney_u",
    oracle=MANN_WHITNEY_ORACLE,
    tags=("stats",),
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (doubled, exact) for each event type against the
    pooled sample — the nonparametric two-sample location test, via
    the rank-sum identity with AVERAGE ranks over ties: doubled rank
    sums (2·cum_before + cnt + 1 per distinct value) keep tie math in
    BIGINT, u2 = 2·(R₁ − n₁(n₁+1)/2). Same 100 TB shape as
    ml_auc_rank_sum: rows collapse to the distinct-score spine first
    (hash-agg with map-side combine), the only ordered window runs
    over distinct values, never rows."""
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_type", F.floor(F.col("value") * 1e6).cast("bigint").alias("v")
    )
    spine = s.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = spine.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("cumb"),
    )
    per_type = s.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_t")
    )
    return (
        per_type.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cnt_t").cast("bigint").alias("n"),
            (
                F.sum(F.col("cnt_t") * (2 * F.col("cumb") + F.col("cnt") + 1))
                - F.sum("cnt_t") * (F.sum("cnt_t") + 1)
            )
            .cast("bigint")
            .alias("u2"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility (tokens-per-word by language)
# ---------------------------------------------------------------------------

FERTILITY_ORACLE = r"""
SELECT lang,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))) AS BIGINT) AS n_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))) * 1000000
            // SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS fertility_ppm,
       CAST(SUM(n_chars) * 1000000
            // SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))) AS BIGINT) AS chars_per_token_ppm
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register(
    "training_tokenizer_fertility",
    oracle=FERTILITY_ORACLE,
    tags=("training", "text", "llm"),
)
def training_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — tokens emitted per whitespace
    word and characters per token, the readout that decides whether a
    tokenizer taxes some languages with more tokens per word (fertility
    > 1e6 ppm means sub-word splitting dominates). Integer ppm via
    floor-division on BIGINT sums; one hash-agg on the language key."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "n_chars",
        TXT.token_count("text").cast("bigint").alias("w"),
        F.size(TXT.bpe_ish_tokens("text")).cast("bigint").alias("t"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("t").cast("bigint").alias("n_tokens"),
            F.expr("CAST(sum(t) * 1000000 div sum(w) AS BIGINT)").alias(
                "fertility_ppm"
            ),
            F.expr(
                "CAST(sum(n_chars) * 1000000 div sum(t) AS BIGINT)"
            ).alias("chars_per_token_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Zone-map pruning simulation (min/max file skipping)
# ---------------------------------------------------------------------------

_ZONE_PREDS = [
    (1, "1993-01-01", "1993-03-31"),
    (2, "1995-06-01", "1995-08-31"),
    (3, "1997-01-01", "1997-12-31"),
]

_ZONE_PREDS_SQL = ", ".join(
    f"({i}, DATE '{lo}', DATE '{hi}')" for i, lo, hi in _ZONE_PREDS
)

ZONE_MAP_ORACLE = f"""
WITH l AS (
  SELECT l_orderkey // 4096 AS file_id, CAST(l_shipdate AS DATE) AS sd
  FROM lineitem
), zone AS (
  SELECT file_id, MIN(sd) AS mn, MAX(sd) AS mx, COUNT(*) AS cnt
  FROM l GROUP BY file_id
), preds AS (SELECT * FROM (VALUES {_ZONE_PREDS_SQL}) AS t(pred_id, lo, hi)),
files AS (
  SELECT p.pred_id,
         CAST(COUNT(*) AS BIGINT) AS files_total,
         CAST(SUM(CASE WHEN z.mx < p.lo OR z.mn > p.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS files_pruned,
         CAST(SUM(CASE WHEN z.mx < p.lo OR z.mn > p.hi THEN 0 ELSE z.cnt END) AS BIGINT)
           AS rows_scanned
  FROM zone z CROSS JOIN preds p
  GROUP BY p.pred_id
), matched AS (
  SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS rows_matched
  FROM l JOIN preds p ON l.sd >= p.lo AND l.sd <= p.hi
  GROUP BY p.pred_id
)
SELECT f.pred_id, f.files_total, f.files_pruned, f.rows_scanned,
       COALESCE(m.rows_matched, 0) AS rows_matched,
       CASE WHEN f.rows_scanned > 0
            THEN CAST(COALESCE(m.rows_matched, 0) * 1000000 // f.rows_scanned AS BIGINT)
            ELSE NULL END AS scan_efficiency_ppm
FROM files f LEFT JOIN matched m USING (pred_id)
ORDER BY f.pred_id
"""


@register(
    "layout_zone_map_pruning",
    oracle=ZONE_MAP_ORACLE,
    tags=("layout", "lakehouse"),
)
def layout_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) file-skipping simulation — the quantitative
    readout behind every lakehouse layout decision: rows land in
    synthetic 4096-order-key files (the natural ingest clustering),
    each file publishes a [min,max] ship-date zone map, and each probe
    predicate reports files pruned, rows scanned vs matched, and scan
    efficiency in ppm. This is exactly what parquet row-group /
    Delta-file skipping does at 100 TB — the query quantifies how much
    a date-clustered layout saves per predicate (compare with
    layout_zorder_locality, which measures multi-column clustering).
    One hash-agg for zone maps + one broadcast range probe; the
    3-predicate frame is a bounded broadcast multiplier."""
    li = _t(spark, sf_dir, "lineitem")
    preds = spark.createDataFrame(
        [(i, lo, hi) for i, lo, hi in _ZONE_PREDS], "pred_id int, lo string, hi string"
    ).select("pred_id", F.col("lo").cast("date"), F.col("hi").cast("date"))
    l = li.select(
        F.expr("l_orderkey div 4096").alias("file_id"),
        F.col("l_shipdate").cast("date").alias("sd"),
    )
    zone = l.groupBy("file_id").agg(
        F.min("sd").alias("mn"), F.max("sd").alias("mx"), F.count(F.lit(1)).alias("cnt")
    )
    pruned = (F.col("mx") < F.col("lo")) | (F.col("mn") > F.col("hi"))
    files = (
        zone.crossJoin(F.broadcast(preds))
        .groupBy("pred_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("files_total"),
            F.sum(F.when(pruned, 1).otherwise(0)).cast("bigint").alias("files_pruned"),
            F.sum(F.when(pruned, 0).otherwise(F.col("cnt")))
            .cast("bigint")
            .alias("rows_scanned"),
        )
    )
    matched = (
        l.join(
            F.broadcast(preds),
            (F.col("sd") >= F.col("lo")) & (F.col("sd") <= F.col("hi")),
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    return (
        files.join(matched, "pred_id", "left")
        .select(
            "pred_id",
            "files_total",
            "files_pruned",
            "rows_scanned",
            F.coalesce(F.col("rows_matched"), F.lit(0)).cast("bigint").alias(
                "rows_matched"
            ),
            F.when(
                F.col("rows_scanned") > 0,
                F.expr(
                    "CAST(coalesce(rows_matched, 0) * 1000000 div rows_scanned AS BIGINT)"
                ),
            ).alias("scan_efficiency_ppm"),
        )
        .orderBy("pred_id")
    )


# ---------------------------------------------------------------------------
# Harmonic centrality (3-hop, exact rational weights) on the near-dup graph
# ---------------------------------------------------------------------------

HARMONIC_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), p1 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ed
), p2 AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst
  FROM p1 a JOIN ed b ON a.dst = b.src
  WHERE a.src <> b.dst
), p3 AS MATERIALIZED (
  SELECT DISTINCT a.src, b.dst
  FROM p2 a JOIN ed b ON a.dst = b.src
  WHERE a.src <> b.dst
), dist AS (
  SELECT src, dst, MIN(d) AS d FROM (
    SELECT src, dst, 1 AS d FROM p1
    UNION ALL SELECT src, dst, 2 FROM p2
    UNION ALL SELECT src, dst, 3 FROM p3
  ) GROUP BY src, dst
)
SELECT src AS id,
       CAST(COUNT(*) AS BIGINT) AS n_reach_3hop,
       CAST(SUM(12 // d) AS BIGINT) AS harmonic12
FROM dist
GROUP BY src
ORDER BY id
"""


@register(
    "graph_harmonic_centrality",
    oracle=HARMONIC_ORACLE,
    tags=("graph", "llm"),
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop harmonic centrality on the near-dup graph: Σ 1/d over
    nodes within distance 3, kept exact by scoring in twelfths
    (12/d ∈ {12, 6, 4} — the lcm trick, no float accumulation). The
    truncated-horizon form is the one that actually runs at scale
    (full harmonic centrality needs all-pairs distances; bounded-hop
    harmonic over a k-NN graph is the standard centrality readout for
    dedup-cluster hubs). Distances come from three unrolled
    frontier-expansion joins with DISTINCT collapse between rounds —
    each level shuffles on node keys only; no cartesian. Input capped
    at vec_id < 400 like the other oracled graph queries (the same
    cap is in the oracle; bench measures kernels on the
    sf-proportional graph instead).

    The symmetrized near-dup edge frame feeds all three frontier
    expansions; a lazy ``shared`` cache stops the LSH candidate
    generator re-running per hop (was 48 effective FileScans —
    round-8 scan audit). p1/p2 are each referenced twice (next hop +
    the distance union), so they cache too."""
    from data_lake_with_spark_spark.operators.plan_cache import shared
    from data_lake_with_spark_spark.operators.similarity import lsh_near_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = lsh_near_pairs(emb, threshold=0.35)
    ed = shared(
        pairs.select(
            F.col("a_id").alias("src"), F.col("b_id").alias("dst")
        ).unionAll(
            pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
        )
    )
    p1 = shared(ed.distinct())
    p2 = shared(
        p1.alias("a")
        .join(ed.alias("b"), F.col("a.dst") == F.col("b.src"))
        .where(F.col("a.src") != F.col("b.dst"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .distinct()
    )
    p3 = (
        p2.alias("a")
        .join(ed.alias("b"), F.col("a.dst") == F.col("b.src"))
        .where(F.col("a.src") != F.col("b.dst"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .distinct()
    )
    dist = (
        p1.withColumn("d", F.lit(1))
        .unionAll(p2.withColumn("d", F.lit(2)))
        .unionAll(p3.withColumn("d", F.lit(3)))
        .groupBy("src", "dst")
        .agg(F.min("d").alias("d"))
    )
    return (
        dist.groupBy(F.col("src").alias("id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reach_3hop"),
            F.sum(F.expr("12 div d")).cast("bigint").alias("harmonic12"),
        )
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# Perceptual image dedup by DCT pHash
# ---------------------------------------------------------------------------


def _dct_coeff(u: int, x: int) -> int:
    import math

    return int(math.floor(math.cos((2 * x + 1) * u * math.pi / 16) * 1024 + 0.5))


_DCT_VALUES = ", ".join(
    f"({u}, {x}, {_dct_coeff(u, x)})" for u in range(5) for x in range(8)
)

# 25-bit hash → 4 pigeonhole bands (lossless for hamming ≤ 3):
# (band, right-shift, mask).
_PHASH_BANDS = [(0, 0, 127), (1, 7, 63), (2, 13, 63), (3, 19, 63)]

_PHASH_BANDS_SQL = ", ".join(f"({k}, {s}, {m})" for k, s, m in _PHASH_BANDS)

PHASH_ORACLE = f"""
WITH lead AS (
  SELECT doc_id, doc_id - doc_id % 25 AS lead_id FROM documents
), base AS (
  SELECT doc_id AS lead_id,
         md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z') AS h
  FROM documents
), m AS (
  SELECT l.doc_id, b.h FROM lead l JOIN base b USING (lead_id)
), px AS (
  SELECT doc_id, i, i // 8 AS x, i % 8 AS y,
         CASE WHEN i = doc_id % 64
              THEN ((strpos('0123456789abcdef', substr(h, 2 * i + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(h, 2 * i + 2, 1)) - 1)
                  + (doc_id % 7) * 16) % 256
              ELSE (strpos('0123456789abcdef', substr(h, 2 * i + 1, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(h, 2 * i + 2, 1)) - 1)
         END AS p
  FROM m, UNNEST(range(64)) AS u(i)
), ctab AS (SELECT * FROM (VALUES {_DCT_VALUES}) AS t(u, x, c)),
d AS MATERIALIZED (
  SELECT px.doc_id, cu.u, cv.u AS v,
         CAST(SUM(px.p * cu.c * cv.c) AS BIGINT) AS dc
  FROM px JOIN ctab cu ON cu.x = px.x JOIN ctab cv ON cv.x = px.y
  GROUP BY px.doc_id, cu.u, cv.u
), rk AS (
  SELECT doc_id, u, v, dc,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dc, u, v) AS rn
  FROM d
), med AS (
  SELECT doc_id, SUM(CASE WHEN rn = 13 THEN dc END) AS c13 FROM rk GROUP BY doc_id
), ph AS MATERIALIZED (
  SELECT rk.doc_id,
         CAST(SUM(CASE WHEN rk.dc > med.c13
                       THEN (CAST(1 AS BIGINT) << (5 * rk.u + rk.v))
                       ELSE 0 END) AS BIGINT) AS ph
  FROM rk JOIN med USING (doc_id) GROUP BY rk.doc_id
), bands AS (
  SELECT doc_id, ph, b.k, (ph >> b.s) & b.m AS key
  FROM ph CROSS JOIN (SELECT * FROM (VALUES {_PHASH_BANDS_SQL}) AS t(k, s, m)) b
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.ph AS ha, b.ph AS hb
  FROM bands a JOIN bands b
    ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
ORDER BY a_id, b_id
"""


@register(
    "dedup_image_phash",
    oracle=PHASH_ORACLE,
    tags=("dedup", "multimodal", "llm", "approx"),
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE dedup by DCT pHash — the frequency-domain
    upgrade of dedup_image_ahash: each 8×8 raster runs a 2-D DCT-II
    with a ×1024-quantized cosine table (the dft_coefficients trick:
    the constants are computed once driver-side and embedded
    identically in the plan and the oracle, so every coefficient is
    exact BIGINT math), the 5×5 low-frequency block thresholds
    against its own median coefficient into a 25-bit hash, and
    candidate pairs come from a 4-band pigeonhole join (lossless for
    hamming ≤ 3) with exact popcount verify. pHash survives
    brightness/contrast shifts that flip aHash bits because the
    comparison basis is spectral shape, not raw pixel mean. Same
    synthetic perturbed-raster corpus as aHash (20 base images, 25
    single-pixel variants each). Plan: pixels and hashes are
    per-row JVM byte/HOF math; the only joins are two broadcast
    cosine-table joins (40 rows) and the banded bucket equi-join —
    never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    lead = docs.select("doc_id", F.expr("doc_id - doc_id % 25").alias("lead_id"))
    base = docs.select(
        F.col("doc_id").alias("lead_id"),
        F.concat(
            F.md5("text"),
            F.md5(F.concat("text", F.lit("x"))),
            F.md5(F.concat("text", F.lit("y"))),
            F.md5(F.concat("text", F.lit("z"))),
        ).alias("h"),
    )
    m = lead.join(F.broadcast(base), "lead_id").select("doc_id", "h")
    px = m.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), i -> CAST(IF(i = doc_id % 64, "
                "(conv(substr(h, 2 * i + 1, 2), 16, 10) + (doc_id % 7) * 16) % 256, "
                "conv(substr(h, 2 * i + 1, 2), 16, 10)) AS BIGINT))"
            )
        ).alias("i", "p"),
    ).select(
        "doc_id",
        F.expr("i div 8").alias("x"),
        (F.col("i") % 8).alias("y"),
        "p",
    )
    ctab = spark.createDataFrame(
        [(u, x, _dct_coeff(u, x)) for u in range(5) for x in range(8)],
        "u int, x int, c bigint",
    )
    cu = ctab.select(F.col("u"), F.col("x"), F.col("c").alias("cu"))
    cv = ctab.select(
        F.col("u").alias("v"), F.col("x").alias("y"), F.col("c").alias("cvv")
    )
    d = (
        px.join(F.broadcast(cu), "x")
        .join(F.broadcast(cv), "y")
        .groupBy("doc_id", "u", "v")
        .agg(F.sum(F.col("p") * F.col("cu") * F.col("cvv")).cast("bigint").alias("dc"))
    )
    w_doc = W.partitionBy("doc_id")
    rk = d.select(
        "doc_id",
        "u",
        "v",
        "dc",
        F.row_number().over(w_doc.orderBy("dc", "u", "v")).alias("rn"),
    )
    med = rk.withColumn(
        "c13", F.sum(F.when(F.col("rn") == 13, F.col("dc"))).over(w_doc)
    )
    ph = med.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("dc") > F.col("c13"),
                F.expr("shiftleft(CAST(1 AS BIGINT), 5 * u + v)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("ph")
    )
    bands = ph.select(
        "doc_id",
        "ph",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("ph", s).bitwiseAND(F.lit(mask))
                    for _, s, mask in _PHASH_BANDS
                ]
            )
        ).alias("k", "key"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.ph").alias("ha"),
            F.col("b.ph").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("a_id", "b_id", hamming.cast("int").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# Asymmetric binary ANN (float query x sign-code corpus)
# ---------------------------------------------------------------------------

ASYM_TOPK_ORACLE = r"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         v[UNNEST(range(len(v))) + 1] AS x
  FROM e
), codes AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dim < 32 AND x > 0
                       THEN (CAST(1 AS BIGINT) << dim) ELSE 0 END) AS BIGINT) AS code_lo,
         CAST(SUM(CASE WHEN dim >= 32 AND x > 0
                       THEN (CAST(1 AS BIGINT) << (dim - 32)) ELSE 0 END) AS BIGINT) AS code_hi
  FROM comp GROUP BY vec_id
), qc AS (
  SELECT vec_id AS query_id, dim, CAST(FLOOR(x * 1000 + 0.5) AS BIGINT) AS qx
  FROM comp WHERE vec_id < 10
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(q.qx * (2 * ((CASE WHEN q.dim < 32
                                     THEN c.code_lo >> q.dim
                                     ELSE c.code_hi >> (q.dim - 32) END) & 1) - 1))
              AS BIGINT) AS score2
  FROM qc q JOIN codes c ON c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id
), shortlist AS (
  SELECT query_id, neighbor_id, score2
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score2 DESC, neighbor_id ASC) AS rn
        FROM scored)
  WHERE rn <= 30
), reranked AS (
  SELECT s.query_id, s.neighbor_id, s.score2,
         FLOOR(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               * 1e6 + 0.5) / 1e6 AS score
  FROM shortlist s
  JOIN e a ON a.vec_id = s.query_id
  JOIN e b ON b.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, score2, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC) AS rnk
      FROM reranked)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "vector_topk_asymmetric",
    oracle=ASYM_TOPK_ORACLE,
    tags=("vector", "llm", "approx", "topk", "quantize"),
)
def vector_topk_asymmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric binary ANN — the standard quality upgrade over
    symmetric Hamming (vector_topk_hamming): the CORPUS stays in
    64-bit sign codes (same 32x compression, same 8-byte scan) but the
    QUERY keeps its float components (scaled to exact integers,
    floor(x*1000+0.5)), scoring each code by the signed sum
    sum_i qx_i * (+-1 per corpus bit) — exactly the query's dot product
    with the +-1 vector the code represents, so quantization error
    applies on ONE side only. A 30-candidate asymmetric shortlist
    measures 0.88 candidate recall vs exact top-5 at sf0.01 — HALF the
    shortlist budget of the symmetric Hamming pipeline for more recall
    (0.70 at 60) — and the exact cosine rerank keeps precision exact.
    All-integer shortlist scores, fully oracled. Plan: codes never
    explode — the per-pair score is one JVM HOF fold over the query's
    broadcast component array with shift/mask bit reads; 10 queries x
    corpus code rows, vector payloads only move for the ≤30-per-query
    rerank join."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    codes = comp.groupBy("vec_id").agg(
        F.sum(
            F.when(
                (F.col("dim") < 32) & (F.col("x") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), dim)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("code_lo"),
        F.sum(
            F.when(
                (F.col("dim") >= 32) & (F.col("x") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), dim - 32)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("code_hi"),
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("qarr"),
    )
    half = (
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> "
        "acc + element_at(qarr, i + {off}) * "
        "(2 * (shiftright({code}, i) & CAST(1 AS BIGINT)) - 1))"
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.expr(half.format(off=1, code="code_lo"))
                + F.expr(half.format(off=33, code="code_hi"))
            )
            .cast("bigint")
            .alias("score2"),
        )
    )
    w_short = W.partitionBy("query_id").orderBy(
        F.desc("score2"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w_short))
        .where(F.col("rn") <= 30)
        .drop("rn")
    )
    from data_lake_with_spark_spark.functions.vector import dot, norm

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    b = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    cos = dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv")))
    reranked = (
        shortlist.join(F.broadcast(a), "query_id")
        .join(b, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "score2",
            (F.floor(cos * 1e6 + 0.5) / 1e6).alias("score"),
        )
    )
    w_rank = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "score2",
            "score",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

REF_INTEGRITY_ORACLE = """
WITH rels AS (
  SELECT 'lineitem.l_orderkey->orders' AS relation,
         (SELECT COUNT(*) FROM lineitem) AS child_rows,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
            ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS orphans
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
            ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
            ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
)
SELECT relation, CAST(child_rows AS BIGINT) AS child_rows,
       CAST(orphans AS BIGINT) AS orphans,
       CAST(orphans * 1000000 // child_rows AS BIGINT) AS orphan_ppm
FROM rels
ORDER BY relation
"""


@register(
    "dq_referential_integrity",
    oracle=REF_INTEGRITY_ORACLE,
    tags=("dq", "join"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned-foreign-key counts for
    every parent-child relation in the star schema (the data-contract
    check a lake runs after every ingest — a nonzero orphan_ppm means
    a fact landed before its dimension or a dimension row was
    deleted). Each relation is one left-anti-shaped probe: child keys
    against the parent's primary key, counted. The parent sides are
    dimension-sized -> broadcast joins; the child side never shuffles.

    scan-audit waiver: 8 scans = 4 relations x 2 sides — auditing N
    foreign keys is N independent single-column probes (each lineitem
    scan reads ONE pruned key column), not a re-derived shared
    subtree."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")

    def probe(relation: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        return (
            child.select(F.col(ck))
            .join(F.broadcast(parent.select(pk)), child[ck] == parent[pk], "left")
            .agg(
                F.lit(relation).alias("relation"),
                F.count(F.lit(1)).cast("bigint").alias("child_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("orphans"),
            )
            .select(
                "relation",
                "child_rows",
                "orphans",
                F.expr("CAST(orphans * 1000000 div child_rows AS BIGINT)").alias(
                    "orphan_ppm"
                ),
            )
        )

    return (
        probe("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(
            probe("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey")
        )
        .unionByName(
            probe(
                "lineitem.l_suppkey->supplier", li, "l_suppkey", supplier, "s_suppkey"
            )
        )
        .unionByName(
            probe("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey")
        )
        .orderBy("relation")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (integer state, truncating division)
# ---------------------------------------------------------------------------

HOLT_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS prio,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
         SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1, 2
), series AS (
  SELECT prio, list(STRUCT_PACK(x := x, l := CAST(NULL AS BIGINT),
                                t := CAST(NULL AS BIGINT))
                    ORDER BY mth) AS arr,
         COUNT(*) AS n_periods
  FROM m GROUP BY prio
), folded AS (
  SELECT prio, n_periods,
         list_reduce(arr, (acc, e) -> CASE
           WHEN acc.l IS NULL THEN
             -- acc is the RAW first element (list_reduce seeds with
             -- it): initialize l=acc.x, t=0 AND fold e in the same
             -- step, or the second period would be silently dropped
             STRUCT_PACK(
               x := e.x,
               l := (e.x + 3 * acc.x) // 4,
               t := ((e.x + 3 * acc.x) // 4 - acc.x) // 8)
           ELSE
             STRUCT_PACK(
               x := e.x,
               l := (e.x + 3 * (acc.l + acc.t)) // 4,
               t := (7 * acc.t + ((e.x + 3 * (acc.l + acc.t)) // 4 - acc.l)) // 8)
           END) AS s
  FROM series
)
SELECT prio,
       CAST(n_periods AS BIGINT) AS n_periods,
       CAST(COALESCE(s.l, s.x) AS BIGINT) AS level_cents,
       CAST(COALESCE(s.t, 0) AS BIGINT) AS trend_cents,
       CAST(COALESCE(s.l, s.x) + COALESCE(s.t, 0) AS BIGINT) AS forecast_1,
       CAST(COALESCE(s.l, s.x) + 3 * COALESCE(s.t, 0) AS BIGINT) AS forecast_3
FROM folded
ORDER BY prio
"""


@register(
    "timeseries_holt_forecast",
    oracle=HOLT_ORACLE,
    tags=("timeseries", "stats"),
)
def timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) with
    α=1/4, β=1/8 in PURE INTEGER arithmetic: the recurrence
    l' = (x + 3(l+t)) div 4, t' = (7t + (l'−l)) div 8 over the
    monthly revenue series (cents) — both engines truncate integer
    division toward zero, so the sequential fold is bit-identical and
    the classically-unoracleable recursive smoother becomes fully
    oracled (the EWMA→Holt step the dashboard forecast needs). The
    fold itself is a per-group JVM HOF over the collected month
    series — bounded by CALENDAR length (≤ ~84 elements), not row
    count, so collect_list here is the two-phase bounded-artifact
    pattern, distributed-safe at any fact-table size (the heavy
    work — the monthly rollup — is one hash-agg)."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("mth"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias("x")
    )
    series = m.groupBy("prio").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(mth, x))), "
            "e -> named_struct('x', e.x, 'l', CAST(NULL AS BIGINT), "
            "'t', CAST(NULL AS BIGINT)))"
        ).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n_periods"),
    )
    fold = (
        "aggregate(slice(arr, 2, size(arr) - 1), "
        "named_struct('x', arr[0].x, 'l', arr[0].x, 't', CAST(0 AS BIGINT)), "
        "(acc, e) -> named_struct("
        "'x', e.x, "
        "'l', (e.x + 3 * (acc.l + acc.t)) div 4, "
        "'t', (7 * acc.t + ((e.x + 3 * (acc.l + acc.t)) div 4 - acc.l)) div 8))"
    )
    return (
        series.select(
            "prio",
            "n_periods",
            F.expr(fold).alias("s"),
        )
        .select(
            "prio",
            "n_periods",
            F.col("s.l").cast("bigint").alias("level_cents"),
            F.col("s.t").cast("bigint").alias("trend_cents"),
            (F.col("s.l") + F.col("s.t")).cast("bigint").alias("forecast_1"),
            (F.col("s.l") + 3 * F.col("s.t")).cast("bigint").alias("forecast_3"),
        )
        .orderBy("prio")
    )


# ---------------------------------------------------------------------------
# Nearest as-of join
# ---------------------------------------------------------------------------

ASOF_NEAREST_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, CAST(epoch_ms(ts) AS BIGINT) AS cts_ms
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.event_id, p.user_id, p.ts_ms, c.click_id, c.cts_ms,
         ABS(p.ts_ms - c.cts_ms) AS delta_ms,
         CASE WHEN c.cts_ms <= p.ts_ms THEN 0 ELSE 1 END AS fwd
  FROM p JOIN c USING (user_id)
), best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                                 ORDER BY delta_ms, fwd, click_id) AS rn
    FROM cand) WHERE rn = 1
)
SELECT p.event_id, p.user_id, p.ts_ms,
       b.click_id, b.cts_ms AS click_ts_ms, b.delta_ms,
       CASE WHEN b.click_id IS NULL THEN NULL
            WHEN b.fwd = 0 THEN 'backward' ELSE 'forward' END AS direction
FROM p LEFT JOIN best b ON b.event_id = p.event_id
ORDER BY p.event_id
"""


@register(
    "join_asof_nearest",
    oracle=ASOF_NEAREST_ORACLE,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'):
    each purchase paired with the user's closest click in EITHER
    direction — |delta| minimized, ties to the backward candidate then
    the smallest click id (a total order, hence fully oracled against
    a dumb all-candidates ranking). The engine runs the
    union+interleaved-window trick in both directions over one shuffle
    on the user key (operators/joins.py:asof_join_nearest) — no
    candidate explosion, unlike the oracle's O(pairs) formulation.
    Timestamps compared as epoch-ms integers so tie resolution has one
    well-defined resolution on every engine."""
    from data_lake_with_spark_spark.functions.time import epoch_ms
    from data_lake_with_spark_spark.operators.joins import asof_join_nearest

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_ms("ts").alias("ts_ms")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        epoch_ms("ts").alias("cts_ms"),
    )
    joined = asof_join_nearest(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts_ms",
        right_ts="cts_ms",
        right_id="click_id",
        right_cols=[],
        suffix="_n",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("click_id_n").alias("click_id"),
        F.col("cts_ms_n").alias("click_ts_ms"),
        F.col("_delta").cast("bigint").alias("delta_ms"),
        F.col("_direction").alias("direction"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Data-skipping payoff: z-order vs linear layout under the same predicates
# ---------------------------------------------------------------------------

_PV_BITS = 6  # 64 buckets/dim, 64 files per layout — matches layout_zorder_locality


def _pv_morton_sql(bp: str, bs: str, bits: int) -> str:
    parts = []
    for j in range(bits):
        parts.append(f"((({bp} >> {j}) & 1) << {2 * j})")
        parts.append(f"((({bs} >> {j}) & 1) << {2 * j + 1})")
    return " | ".join(parts)


# (pred_id, pk_lo8, pk_hi8, sk_lo8, sk_hi8) — bounds in eighths of each
# key range, materialized to inclusive [lo, hi] against the global
# min/max so both engines derive identical literal predicates.
_PV_PREDS = [(1, 0, 1, 0, 1), (2, 2, 3, 4, 5), (3, 0, 8, 3, 4)]

_PV_PREDS_SQL = ", ".join(f"({p}, {a}, {b}, {c}, {d})" for p, a, b, c, d in _PV_PREDS)

PRUNE_VS_ORACLE = f"""
WITH r AS (
  SELECT MIN(l_orderkey) AS omin, MAX(l_orderkey) AS omax,
         MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
  FROM lineitem
), preds AS (
  SELECT pid,
         pmin + ((pmax - pmin + 1) * plo8) // 8 AS plo,
         CASE WHEN phi8 = 8 THEN pmax
              ELSE pmin + ((pmax - pmin + 1) * phi8) // 8 - 1 END AS phi,
         smin + ((smax - smin + 1) * slo8) // 8 AS slo,
         CASE WHEN shi8 = 8 THEN smax
              ELSE smin + ((smax - smin + 1) * shi8) // 8 - 1 END AS shi
  FROM (VALUES {_PV_PREDS_SQL}) AS t(pid, plo8, phi8, slo8, shi8), r
), rows_keyed AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         ((l_orderkey - omin) * 64) // (omax - omin + 1) AS fl,
         (({_pv_morton_sql(f"((l_partkey - pmin) * {1 << _PV_BITS}) // (pmax - pmin + 1)",
                           f"((l_suppkey - smin) * {1 << _PV_BITS}) // (smax - smin + 1)",
                           _PV_BITS)})) >> {_PV_BITS} AS fz
  FROM lineitem, r
), zlin AS (
  SELECT fl, MIN(pk) AS mnp, MAX(pk) AS mxp, MIN(sk) AS mns, MAX(sk) AS mxs,
         COUNT(*) AS cnt
  FROM rows_keyed GROUP BY fl
), zz AS (
  SELECT fz, MIN(pk) AS mnp, MAX(pk) AS mxp, MIN(sk) AS mns, MAX(sk) AS mxs,
         COUNT(*) AS cnt
  FROM rows_keyed GROUP BY fz
), lin AS (
  SELECT p.pid,
         CAST(SUM(CASE WHEN z.mnp <= p.phi AND z.mxp >= p.plo
                        AND z.mns <= p.shi AND z.mxs >= p.slo
                       THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned_linear,
         CAST(SUM(CASE WHEN z.mnp <= p.phi AND z.mxp >= p.plo
                        AND z.mns <= p.shi AND z.mxs >= p.slo
                       THEN z.cnt ELSE 0 END) AS BIGINT) AS rows_scanned_linear
  FROM zlin z CROSS JOIN preds p GROUP BY p.pid
), zord AS (
  SELECT p.pid,
         CAST(SUM(CASE WHEN z.mnp <= p.phi AND z.mxp >= p.plo
                        AND z.mns <= p.shi AND z.mxs >= p.slo
                       THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned_zorder,
         CAST(SUM(CASE WHEN z.mnp <= p.phi AND z.mxp >= p.plo
                        AND z.mns <= p.shi AND z.mxs >= p.slo
                       THEN z.cnt ELSE 0 END) AS BIGINT) AS rows_scanned_zorder
  FROM zz z CROSS JOIN preds p GROUP BY p.pid
), m AS (
  SELECT p.pid, CAST(COUNT(*) AS BIGINT) AS rows_matched
  FROM rows_keyed k JOIN preds p
    ON k.pk >= p.plo AND k.pk <= p.phi AND k.sk >= p.slo AND k.sk <= p.shi
  GROUP BY p.pid
)
SELECT l.pid AS pred_id, l.files_scanned_linear, l.rows_scanned_linear,
       z.files_scanned_zorder, z.rows_scanned_zorder,
       COALESCE(m.rows_matched, 0) AS rows_matched
FROM lin l JOIN zord z ON l.pid = z.pid LEFT JOIN m ON m.pid = l.pid
ORDER BY pred_id
"""


@register(
    "layout_pruning_zorder_vs_linear",
    oracle=PRUNE_VS_ORACLE,
    tags=("layout", "lakehouse"),
)
def layout_pruning_zorder_vs_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE data-skipping payoff readout: the same 2-D predicates
    probed against zone maps of two 64-file layouts of lineitem —
    ingest-linear (order-key ranges) vs z-ordered on
    (l_partkey, l_suppkey) (the layout_zorder_locality morton key).
    Linear files have tight ORDER-key spans but full part/supp spans,
    so every file survives a part x supp predicate (scan all rows);
    z-ordered files own key-space hyper-rectangles, so most files
    prune. files/rows_scanned per layout + rows_matched quantify
    exactly what OPTIMIZE ZORDER BY buys — the before/after a
    lakehouse operator looks at before paying for a re-cluster. All
    map-side key math (one min/max stats broadcast), two ≤64-row zone
    aggregations, a 3-row broadcast predicate probe."""
    # scan-audit waiver: 9 scans = layout comparison — zone maps are
    # built and probed once PER PHYSICAL LAYOUT (linear + z-ordered),
    # and comparing N layouts requires scanning each; not a re-derived
    # shared subtree.
    from data_lake_with_spark_spark.operators.zorder import morton_from_buckets

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    rng = li.agg(
        F.min("l_orderkey").alias("omin"),
        F.max("l_orderkey").alias("omax"),
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    nb = 1 << _PV_BITS
    keyed = li.crossJoin(F.broadcast(rng)).select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.expr("((l_orderkey - omin) * 64) div (omax - omin + 1)").alias("fl"),
        F.expr(f"((l_partkey - pmin) * {nb}) div (pmax - pmin + 1)").alias("bp"),
        F.expr(f"((l_suppkey - smin) * {nb}) div (smax - smin + 1)").alias("bs"),
    )
    keyed = keyed.withColumn(
        "fz",
        F.shiftright(
            morton_from_buckets([F.col("bp"), F.col("bs")], bits=_PV_BITS), _PV_BITS
        ),
    )
    preds = (
        spark.createDataFrame(
            _PV_PREDS, "pid int, plo8 int, phi8 int, slo8 int, shi8 int"
        )
        .crossJoin(F.broadcast(rng))
        .select(
            "pid",
            F.expr("pmin + ((pmax - pmin + 1) * plo8) div 8").alias("plo"),
            F.expr(
                "CASE WHEN phi8 = 8 THEN pmax "
                "ELSE pmin + ((pmax - pmin + 1) * phi8) div 8 - 1 END"
            ).alias("phi"),
            F.expr("smin + ((smax - smin + 1) * slo8) div 8").alias("slo"),
            F.expr(
                "CASE WHEN shi8 = 8 THEN smax "
                "ELSE smin + ((smax - smin + 1) * shi8) div 8 - 1 END"
            ).alias("shi"),
        )
    )
    overlap = (
        (F.col("mnp") <= F.col("phi"))
        & (F.col("mxp") >= F.col("plo"))
        & (F.col("mns") <= F.col("shi"))
        & (F.col("mxs") >= F.col("slo"))
    )

    def zone_probe(file_col: str, fsuffix: str):
        zone = keyed.groupBy(file_col).agg(
            F.min("pk").alias("mnp"),
            F.max("pk").alias("mxp"),
            F.min("sk").alias("mns"),
            F.max("sk").alias("mxs"),
            F.count(F.lit(1)).alias("cnt"),
        )
        return (
            zone.crossJoin(F.broadcast(preds))
            .groupBy("pid")
            .agg(
                F.sum(F.when(overlap, 1).otherwise(0))
                .cast("bigint")
                .alias(f"files_scanned_{fsuffix}"),
                F.sum(F.when(overlap, F.col("cnt")).otherwise(0))
                .cast("bigint")
                .alias(f"rows_scanned_{fsuffix}"),
            )
        )

    lin = zone_probe("fl", "linear")
    zord = zone_probe("fz", "zorder")
    matched = (
        keyed.join(
            F.broadcast(preds),
            (F.col("pk") >= F.col("plo"))
            & (F.col("pk") <= F.col("phi"))
            & (F.col("sk") >= F.col("slo"))
            & (F.col("sk") <= F.col("shi")),
        )
        .groupBy("pid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    return (
        lin.join(zord, "pid")
        .join(matched, "pid", "left")
        .select(
            F.col("pid").alias("pred_id"),
            "files_scanned_linear",
            "rows_scanned_linear",
            "files_scanned_zorder",
            "rows_scanned_zorder",
            F.coalesce(F.col("rows_matched"), F.lit(0))
            .cast("bigint")
            .alias("rows_matched"),
        )
        .orderBy("pred_id")
    )


# ---------------------------------------------------------------------------
# Near-dup rate by source (dedup diagnostics slice)
# ---------------------------------------------------------------------------

from data_lake_with_spark_spark.plans.llm_ops import (  # noqa: E402
    MINHASH_PORTABLE_ORACLE,
    _mh_near_pairs,
)

DEDUP_RATE_ORACLE = f"""
WITH pairs AS (
{MINHASH_PORTABLE_ORACLE}
), dup AS (
  SELECT DISTINCT doc_id FROM (
    SELECT a_id AS doc_id FROM pairs
    UNION ALL SELECT b_id AS doc_id FROM pairs)
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dup_ppm
FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
GROUP BY d.source
ORDER BY d.source
"""


@register(
    "training_dedup_rate_by_source",
    oracle=DEDUP_RATE_ORACLE,
    tags=("training", "dedup", "dq", "llm"),
)
def training_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate rate sliced by source — the dedup DIAGNOSTIC a
    corpus curator reads before deciding which feeds to throttle:
    fraction of each source's documents participating in at least one
    verified near-dup pair (the portable MinHash pipeline at Jaccard
    >= 0.5, so the readout is fully oracled end-to-end through the
    LSH). A source with dup_ppm an order of magnitude above the
    corpus average is a crawler trap or a mirror. Plan: the shared
    _mh_near_pairs front end + one distinct + one broadcast-sized
    per-source agg. The pair frame feeds both endpoint projections,
    so it is a lazy shared cache — uncached, the whole MinHash
    pipeline ran twice (9 effective FileScans, round-9 scan audit)."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    docs = _t(spark, sf_dir, "documents")
    pairs = shared(_mh_near_pairs(docs, threshold=0.5))
    dup = (
        pairs.select(F.col("a_id").alias("doc_id"))
        .unionAll(pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup_docs"),
            F.expr(
                "CAST(sum(coalesce(is_dup, 0)) * 1000000 div count(1) AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between sources
# ---------------------------------------------------------------------------

JS_ORACLE = """
WITH r AS (
  SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
), cell AS (
  SELECT source, ((n_chars - mn) * 10) // (mx - mn + 1) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents, r GROUP BY 1, 2
), n AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY source
), grid AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n AS na, b.n AS nb, g.bucket,
         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
  FROM n a JOIN n b ON a.source < b.source
  CROSS JOIN (SELECT DISTINCT bucket FROM cell) g
  LEFT JOIN cell ca ON ca.source = a.source AND ca.bucket = g.bucket
  LEFT JOIN cell cb ON cb.source = b.source AND cb.bucket = g.bucket
  WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0
), scored AS (
  SELECT src_a, src_b, na, nb,
         CASE WHEN ca > 0 THEN ca * (
           CAST(FLOOR(ln(CAST(ca AS DOUBLE)) * 1e6) AS BIGINT)
           - CAST(FLOOR(ln(CAST(na AS DOUBLE)) * 1e6) AS BIGINT)
           + CAST(FLOOR(ln(CAST(2 AS DOUBLE) * na * nb) * 1e6) AS BIGINT)
           - CAST(FLOOR(ln(CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na) * 1e6) AS BIGINT)
         ) ELSE 0 END AS wa,
         CASE WHEN cb > 0 THEN cb * (
           CAST(FLOOR(ln(CAST(cb AS DOUBLE)) * 1e6) AS BIGINT)
           - CAST(FLOOR(ln(CAST(nb AS DOUBLE)) * 1e6) AS BIGINT)
           + CAST(FLOOR(ln(CAST(2 AS DOUBLE) * na * nb) * 1e6) AS BIGINT)
           - CAST(FLOOR(ln(CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na) * 1e6) AS BIGINT)
         ) ELSE 0 END AS wb
  FROM grid
)
SELECT src_a, src_b,
       FLOOR((CAST(SUM(wa) AS BIGINT) * 1.0 / na / 2
              + CAST(SUM(wb) AS BIGINT) * 1.0 / nb / 2) / 1e6 * 1e6 + 0.5) / 1e6
         AS js_divergence
FROM scored GROUP BY src_a, src_b, na, nb
ORDER BY src_a, src_b
"""


@register(
    "stats_jensen_shannon",
    oracle=JS_ORACLE,
    tags=("stats", "quality", "llm"),
)
def stats_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every pair of
    sources over their document-length-decile distributions — the
    SYMMETRIC, bounded drift metric (JS = KL(P||M)/2 + KL(Q||M)/2,
    M the even mixture) corpus monitoring prefers over raw KL because
    it tolerates zero cells and orders pairs stably. Mixture
    log-probs stay exact: ln M = ln(ca*nb + cb*na) - ln(2*na*nb) —
    integer arguments only — and every per-cell log is QUANTIZED to
    an integer before summation (the stats_kl_weekday trick), so the
    pair scores are engine-identical. Plan: one (source, decile)
    hash-agg; the pair grid is sources^2 x 10 cells — broadcast-scale
    regardless of corpus size."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    docs = _t(spark, sf_dir, "documents")
    r = docs.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    # the |sources|×10 cell histogram feeds four branches (totals,
    # bucket spine, both pair sides) — uncached, the corpus scan+agg
    # re-ran per branch (10 effective FileScans, round-9 scan audit)
    cell = shared(
        docs.crossJoin(F.broadcast(r))
        .select(
            "source",
            F.expr("((n_chars - mn) * 10) div (mx - mn + 1)").alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = shared(
        cell.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    )
    buckets = cell.select("bucket").distinct()
    a = n.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    b = n.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    ca = cell.select(
        F.col("source").alias("src_a"), "bucket", F.col("c").alias("ca")
    )
    cb = cell.select(
        F.col("source").alias("src_b"), "bucket", F.col("c").alias("cb")
    )
    grid = (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .crossJoin(F.broadcast(buckets))
        .join(ca, ["src_a", "bucket"], "left")
        .join(cb, ["src_b", "bucket"], "left")
        .select(
            "src_a",
            "src_b",
            "na",
            "nb",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .where(F.col("ca") + F.col("cb") > 0)
    )
    lq = lambda col: F.floor(F.log(col) * 1e6).cast("long")  # noqa: E731
    ln_m_num = lq(F.col("ca").cast("double") * F.col("nb") + F.col("cb").cast("double") * F.col("na"))
    ln_2nanb = lq(F.lit(2.0) * F.col("na") * F.col("nb"))
    wa = F.when(
        F.col("ca") > 0,
        F.col("ca")
        * (lq(F.col("ca").cast("double")) - lq(F.col("na").cast("double")) + ln_2nanb - ln_m_num),
    ).otherwise(F.lit(0))
    wb = F.when(
        F.col("cb") > 0,
        F.col("cb")
        * (lq(F.col("cb").cast("double")) - lq(F.col("nb").cast("double")) + ln_2nanb - ln_m_num),
    ).otherwise(F.lit(0))
    return (
        grid.select("src_a", "src_b", "na", "nb", wa.alias("wa"), wb.alias("wb"))
        .groupBy("src_a", "src_b", "na", "nb")
        .agg(
            (
                F.floor(
                    (
                        F.sum("wa").cast("bigint") * 1.0 / F.col("na") / 2
                        + F.sum("wb").cast("bigint") * 1.0 / F.col("nb") / 2
                    )
                    / 1e6
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("js_divergence")
        )
        .select("src_a", "src_b", "js_divergence")
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# IVF + PQ composed ANN (the production FAISS-style architecture), portable
# ---------------------------------------------------------------------------

IVFPQ_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), comp AS (
  SELECT vec_id, UNNEST(range(len(v))) AS dim,
         CAST(FLOOR(v[UNNEST(range(len(v))) + 1] * 1000 + 0.5) AS BIGINT) AS x
  FROM e
), coarse AS (
  SELECT vec_id - 26 AS cell, dim, x AS cx FROM comp
  WHERE vec_id >= 26 AND vec_id < 34
), d2c AS (
  SELECT comp.vec_id, coarse.cell,
         SUM((comp.x - coarse.cx) * (comp.x - coarse.cx)) AS d
  FROM comp JOIN coarse ON comp.dim = coarse.dim
  GROUP BY comp.vec_id, coarse.cell
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM d2c) WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM d2c WHERE vec_id < 10) WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
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
    FROM d2) WHERE rn = 1
), dtable AS (
  SELECT vec_id AS query_id, j, c, d FROM d2 WHERE vec_id < 10
), adc AS (
  SELECT cd.query_id, cd.neighbor_id, CAST(SUM(t.d) AS BIGINT) AS d2_adc
  FROM cand cd
  JOIN codes k ON k.vec_id = cd.neighbor_id
  JOIN dtable t ON t.query_id = cd.query_id AND t.j = k.j AND t.c = k.code
  GROUP BY cd.query_id, cd.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, d2_adc
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2_adc ASC, neighbor_id ASC) AS rnk
      FROM adc)
WHERE rnk <= 5
ORDER BY query_id, rank
"""


@register(
    "vector_topk_ivfpq_portable",
    oracle=IVFPQ_ORACLE,
    tags=("vector", "llm", "approx", "topk", "ivf", "pq"),
)
def vector_topk_ivfpq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ COMPOSED — the production ANN architecture (FAISS
    IVFPQ): a coarse quantizer (8 landmark cells, vec_id 26-33) prunes
    the corpus to the query's nprobe=2 nearest cells, then PQ
    asymmetric-distance scoring (the 16-landmark 8-subspace codebook
    from vector_topk_pq_portable, vec_id 10-25) ranks only the
    surviving candidates — coarse pruning bounds WORK, product codes
    bound MEMORY, and with portable integer components every stage is
    bit-reproducible in SQL (completes the portable-twin sweep with
    the two-level composition the separate IVF and PQ queries stop
    short of). Like the other *_portable twins this PROVES THE
    ALGORITHM, not retrieval quality: arbitrary-landmark codebooks on
    near-isotropic unnormalized vectors measure ~0.15 recall@5 vs
    exact cosine — production quality comes from k-means-trained
    codebooks (vector_topk_pq / vector_topk_ivf, the rows-only fast
    paths) and from residual encoding, neither of which changes the
    plan shape verified here. Plan: one explode, broadcast landmark joins, hash-aggs
    for assignment/codes, a cell-keyed candidate equi-join, and the
    broadcast ADC table join — candidates per query are nprobe/ncells
    of the corpus, never all of it; no vector payload moves after the
    explode.

    comp (the exploded integer components) is a tracked shared()
    cache: the coarse landmarks, coarse distances, PQ landmarks and
    PQ distances all slice it — uncached, the embeddings scan
    re-derived 8x (round-10 scan audit)."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    emb = _t(spark, sf_dir, "embeddings")
    comp = shared(
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        ).select(
            "vec_id",
            "dim",
            (F.floor(F.col("x") * 1000 + 0.5)).cast("bigint").alias("x"),
        )
    )
    coarse = comp.where((F.col("vec_id") >= 26) & (F.col("vec_id") < 34)).select(
        (F.col("vec_id") - 26).alias("cell"), "dim", F.col("x").alias("cx")
    )
    d2c = (
        comp.join(F.broadcast(coarse), "dim")
        .groupBy("vec_id", "cell")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("d"))
    )
    w_cell = W.partitionBy("vec_id").orderBy("d", "cell")
    assign = (
        d2c.withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    probes = (
        d2c.where(F.col("vec_id") < 10)
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= 2)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    lm = comp.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 26)).select(
        (F.col("vec_id") - 10).alias("c"), "dim", F.col("x").alias("lx")
    )
    d2 = (
        comp.join(F.broadcast(lm), "dim")
        .groupBy("vec_id", "c", (F.col("dim") / 8).cast("int").alias("j"))
        .agg(F.sum((F.col("x") - F.col("lx")) * (F.col("x") - F.col("lx"))).alias("d"))
    )
    w_code = W.partitionBy("vec_id", "j").orderBy("d", "c")
    codes = (
        d2.withColumn("rn", F.row_number().over(w_code))
        .where(F.col("rn") == 1)
        .select("vec_id", "j", F.col("c").alias("code"))
    )
    dtable = d2.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "j", F.col("c").alias("code"), "d"
    )
    adc = (
        cand.join(codes, cand.neighbor_id == codes.vec_id)
        .join(F.broadcast(dtable), ["query_id", "j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("bigint").alias("d2_adc"))
    )
    w_rank = W.partitionBy("query_id").orderBy(F.asc("d2_adc"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "d2_adc",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Interval-overlap join (both sides are intervals)
# ---------------------------------------------------------------------------

INTERVAL_OVERLAP_ORACLE = """
WITH s AS (
  SELECT user_id, strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
         CAST(epoch_ms(MIN(ts)) AS BIGINT) AS s_start,
         CAST(epoch_ms(MAX(ts)) AS BIGINT) AS s_end
  FROM events GROUP BY 1, 2
), inc AS (
  SELECT event_id AS incident_id,
         CAST(epoch_ms(ts) AS BIGINT) AS i_start,
         CAST(epoch_ms(ts) AS BIGINT) + 600000 AS i_end
  FROM events WHERE event_type = 'error'
)
SELECT s.user_id, s.day, i.incident_id,
       CAST(LEAST(s.s_end, i.i_end) - GREATEST(s.s_start, i.i_start) AS BIGINT)
         AS overlap_ms
FROM s JOIN inc i
  ON s.s_start <= i.i_end AND i.i_start <= s.s_end
ORDER BY s.user_id, s.day, i.incident_id
"""


@register(
    "join_interval_overlap",
    oracle=INTERVAL_OVERLAP_ORACLE,
    tags=("join", "range", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join — both sides are intervals (unlike the
    point-vs-band range joins): each user's daily activity span
    [first event, last event] against every global error-incident
    window [error ts, +10 min], emitting the exact overlap in ms.
    Engine strategy: explode each interval into the day-width time
    buckets it covers (activity spans ≤ 2 buckets by construction,
    incident windows ≤ 2), equi-join on bucket, DISTINCT-collapse the
    double-bucket duplicates, verify the exact overlap predicate —
    the O(Σ bucket²) blocking discipline of every near-dup join,
    never the O(n·m) theta join the oracle runs. At 100 TB the
    bucket is also the physical partition key, and bucket width is
    tuned to the p99 interval length."""
    from data_lake_with_spark_spark.functions.time import epoch_ms

    ev = _t(spark, sf_dir, "events")
    s = (
        ev.groupBy(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.min(epoch_ms("ts")).alias("s_start"),
            F.max(epoch_ms("ts")).alias("s_end"),
        )
    )
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        epoch_ms("ts").alias("i_start"),
        (epoch_ms("ts") + 600000).alias("i_end"),
    )
    day_ms = 86_400_000
    sb = s.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"s_start div {day_ms}"), F.expr(f"s_end div {day_ms}")
            )
        ).alias("bucket"),
    )
    ib = inc.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"i_start div {day_ms}"), F.expr(f"i_end div {day_ms}")
            )
        ).alias("bucket"),
    )
    return (
        sb.join(ib, "bucket")
        .where(
            (F.col("s_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("s_end"))
        )
        .select(
            "user_id",
            "day",
            "incident_id",
            (
                F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
            ).cast("bigint").alias("overlap_ms"),
        )
        .distinct()
        .orderBy("user_id", "day", "incident_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter false-positive calibration
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 3

BLOOM_FPP_ORACLE = f"""
WITH members AS (
  SELECT DISTINCT o_custkey AS key FROM orders
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_members, MAX(key) AS mx FROM members
), bits AS (
  SELECT DISTINCT
         CAST('0x' || substring(md5(CAST(m.key AS VARCHAR) || ':' || CAST(h.i AS VARCHAR)), 1, 8) AS BIGINT)
           % {_BLOOM_M} AS pos
  FROM members m CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) h
), probes AS (
  SELECT mx + 1 + UNNEST(range(1000)) AS key FROM stats
), probe_hits AS (
  SELECT p.key,
         SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
  FROM probes p
  CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) h
  LEFT JOIN bits b
    ON b.pos = CAST('0x' || substring(md5(CAST(p.key AS VARCHAR) || ':' || CAST(h.i AS VARCHAR)), 1, 8) AS BIGINT)
               % {_BLOOM_M}
  GROUP BY p.key
)
SELECT s.n_members,
       CAST({_BLOOM_M} AS BIGINT) AS m_bits,
       CAST({_BLOOM_K} AS BIGINT) AS k_hashes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
       CAST(1000 AS BIGINT) AS n_probes,
       (SELECT CAST(SUM(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
        FROM probe_hits) AS false_positives,
       (SELECT CAST(SUM(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END) * 1000000
                    // 1000 AS BIGINT)
        FROM probe_hits) AS fpp_ppm
FROM stats s
"""


@register(
    "dq_bloom_fpp",
    oracle=BLOOM_FPP_ORACLE,
    tags=("dq", "sketch"),
)
def dq_bloom_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive calibration — the measured check
    behind every bloom-indexed point-read path (sources/versioned.py's
    bloom indexes included): build an m=4096, k=3 filter over the
    distinct order custkeys with md5-derived positions (portable, so
    the whole filter state is oracle-checkable), probe 1000 keys
    KNOWN to be absent (max+1..), and report the measured
    false-positive rate in ppm alongside the occupancy that drives
    it. A measured fpp far above (1 - e^(-kn/m))^k means the hash
    family is clustering — the calibration a storage engine runs
    before trusting absence proofs. Plan: one distinct, one
    bits-per-key explode into a ≤m-row DISTINCT bit set (broadcast),
    1000 probe rows join it — nothing scales with the fact table
    beyond the first distinct."""
    orders = _t(spark, sf_dir, "orders")
    members = orders.select(F.col("o_custkey").alias("key")).distinct()
    stats = members.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max("key").alias("mx"),
    )
    hseq = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i")
    pos = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("key"), F.col("i"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % _BLOOM_M
    )
    bits = members.select("key", hseq).select(pos.alias("pos")).distinct()
    probes = stats.select(
        F.explode(
            F.sequence(F.col("mx") + 1, F.col("mx") + 1000)
        ).alias("key")
    )
    probe_hits = (
        probes.select("key", hseq)
        .select("key", pos.alias("pos"))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
    )
    fp = probe_hits.agg(
        F.sum(F.when(F.col("hits") == _BLOOM_K, 1).otherwise(0))
        .cast("bigint")
        .alias("false_positives")
    )
    nbits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    return (
        stats.select("n_members")
        .crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(fp))
        .select(
            "n_members",
            F.lit(_BLOOM_M).cast("bigint").alias("m_bits"),
            F.lit(_BLOOM_K).cast("bigint").alias("k_hashes"),
            "bits_set",
            F.lit(1000).cast("bigint").alias("n_probes"),
            "false_positives",
            F.expr("CAST(false_positives * 1000000 div 1000 AS BIGINT)").alias(
                "fpp_ppm"
            ),
        )
    )
