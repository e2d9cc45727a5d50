"""Queries mirroring the reference's operator inventory (SURVEY §2.1-2.7).

Each query re-expresses one reference operator over the driver testdata
(the reference's Sparkify feeds don't exist here; the mapping is
noted per query). The reference's bugs are NOT reproduced — e.g. its
"dedup" join that was a no-op (reference ``etl.py:115-117``, SURVEY
§2.9 B1) is implemented as the intended left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.time import epoch_ms

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- P1 + P5: projection + distinct (reference etl.py:102,132,182,211) ----

PROJ_DISTINCT_ORACLE = """
SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_custkey, o_orderstatus, o_orderpriority
"""


@register("proj_distinct", oracle=PROJ_DISTINCT_ORACLE, tags=("projection", "reference"))
def proj_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + distinct — the reference's dimension-extraction
    pattern (``songs_table = df.select(...).distinct()``)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_custkey", "o_orderstatus", "o_orderpriority")
    )


# --- P2: equality / predicate filters (reference etl.py:112 et al.) -------

FILTER_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type = 'purchase' AND value > 100.0
ORDER BY event_id
"""


@register("filter_predicates", oracle=FILTER_ORACLE, tags=("filter", "reference"))
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive pushdown-able predicates (equality + range)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# --- J2: left-outer enrichment join with aliases (etl.py:244-247) ---------

LEFT_OUTER_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
FROM events e
LEFT OUTER JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
"""


@register("join_left_outer_enrich", oracle=LEFT_OUTER_ORACLE, tags=("join", "reference"))
def join_left_outer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-enrichment left-outer join, keeping unmatched facts — the
    reference's songplays join (``etl.py:244-247``): all plays retained
    even when the dimension misses."""
    ev = _t(spark, sf_dir, "events").alias("e")
    cust = _t(spark, sf_dir, "customer").alias("c")
    return (
        ev.join(cust, F.col("e.user_id") == F.col("c.c_custkey"), "left_outer")
        .select("e.event_id", "e.user_id", "e.event_type", "c.c_name", "c.c_mktsegment")
        .orderBy("event_id")
    )


# --- J1 (intended semantics): left-anti "new rows only" -------------------

LEFT_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


@register("join_left_anti_new_rows", oracle=LEFT_ANTI_ORACLE, tags=("join", "reference"))
def join_left_anti_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's *intended* incremental-upsert
    dedup (``etl.py:114`` comment; the shipped left-outer was a no-op,
    SURVEY §2.9 B1). Here: customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- J3: compound-key (3-column) equi-join (etl.py:275-277) ---------------

COMPOUND_KEY_ORACLE = """
SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_quantity
FROM lineitem l
LEFT JOIN (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey
           FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00') old
  ON  l.l_orderkey = old.l_orderkey
  AND l.l_partkey  = old.l_partkey
  AND l.l_suppkey  = old.l_suppkey
WHERE old.l_orderkey IS NULL
"""


@register("join_compound_key_anti", oracle=COMPOUND_KEY_ORACLE, tags=("join", "reference"))
def join_compound_key_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-column compound-key anti join — the reference's songplays
    new-vs-existing key ``(start_time, song_id, sessionId)``
    (``etl.py:275-277``), over lineitem's natural compound key."""
    li = _t(spark, sf_dir, "lineitem")
    # no .distinct() on the probe side: anti joins are duplicate-
    # insensitive on the build side, and the dedup shuffle costs more
    # than the larger hash table (measured 0.7s -> 0.45s at sf0.1)
    old = li.where(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    key = ["l_orderkey", "l_partkey", "l_suppkey"]
    # No global ORDER BY: the result is an append-set (~full-table
    # sized) — an upsert probe at 100 TB must not end in an unbounded
    # sort, and the correctness compare is order-insensitive.
    return li.join(old, key, "left_anti").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )


# --- F1: epoch-millis → timestamp, builtin not UDF (etl.py:173-177) -------

EPOCH_ORACLE = """
SELECT
  event_id,
  epoch_ms(ts)                        AS ts_millis,
  make_timestamp(epoch_ms(ts) * 1000) AS ts_roundtrip
FROM events
ORDER BY event_id
"""


@register("epoch_ms_to_timestamp", oracle=EPOCH_ORACLE, tags=("scalar", "time", "reference"))
def epoch_ms_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-ms ↔ timestamp, replacing the reference's row-at-a-time
    Python UDF (``etl.py:173``: datetime.fromtimestamp + strftime +
    cast) with JVM builtins ``unix_millis``/``timestamp_millis`` —
    same semantics, no Python-worker round trip."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            epoch_ms("ts").alias("ts_millis"),
            F.timestamp_millis(epoch_ms("ts")).alias("ts_roundtrip"),
        )
        .orderBy("event_id")
    )


# --- F2-F8: time dimension derivation (etl.py:209-211 + README intent) ----

TIME_DIM_ORACLE = """
SELECT DISTINCT
  ts                                   AS start_time,
  CAST(HOUR(ts) AS INTEGER)            AS hour,
  CAST(DAYOFMONTH(ts) AS INTEGER)      AS day,
  CAST(WEEKOFYEAR(ts) AS INTEGER)      AS week,
  CAST(MONTH(ts) AS INTEGER)           AS month,
  CAST(YEAR(ts) AS INTEGER)            AS year,
  CAST(DAYOFWEEK(ts) + 1 AS INTEGER)   AS weekday
FROM events
ORDER BY start_time
"""


@register("time_dimension", oracle=TIME_DIM_ORACLE, tags=("scalar", "time", "reference"))
def time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's time-dimension build (``etl.py:209-211``):
    distinct timestamps exploded into calendar fields, including the
    ``weekday`` its README declared but the code never computed
    (SURVEY §2.9 B8). DuckDB's dayofweek is 0=Sunday vs Spark's
    1=Sunday, hence the +1 in the oracle."""
    ev = _t(spark, sf_dir, "events")
    # distinct on ts FIRST (round-14 optimization, guide §2.3): every
    # calendar field is a pure function of ts, so dedup before deriving
    # them — the distinct exchange then carries ONE column instead of
    # seven and the field math runs once per SURVIVING timestamp,
    # parallel, after the shuffle. Identical rows (A/B-checked).
    return (
        ev.select(F.col("ts").alias("start_time"))
        .distinct()
        .orderBy("start_time")
        .select(
            "start_time",
            F.hour("start_time").alias("hour"),
            F.dayofmonth("start_time").alias("day"),
            F.weekofyear("start_time").alias("week"),
            F.month("start_time").alias("month"),
            F.year("start_time").alias("year"),
            F.dayofweek("start_time").alias("weekday"),
        )
    )


# --- E6: JSON property extraction on events.props -------------------------

JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
ORDER BY event_id
"""


@register("json_extract_props", oracle=JSON_ORACLE, tags=("scalar", "json"))
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from a string column (E6)."""
    ev = _t(spark, sf_dir, "events")
    # parse AFTER the presentation sort (round-14 optimization): the
    # range exchange samples its child, so a pre-sort parse ran the
    # JSON extraction twice (sampling pass + shuffle pass); above the
    # sort it runs exactly once per row, post-shuffle and parallel.
    # No optimizer rule moves projections below a Sort, so the shape
    # is stable. Identical rows (A/B-checked).
    return (
        ev.select("event_id", "props")
        .orderBy("event_id")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        )
    )


JSON_MAP_ORACLE = """
SELECT
  event_id,
  CAST(len(json_keys(props)) AS INTEGER)    AS n_keys,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
ORDER BY event_id
"""


@register("json_to_map_props", oracle=JSON_MAP_ORACLE, tags=("scalar", "json", "map"))
def json_to_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full JSON parse to MapType (vs the single-path get_json_object):
    from_json → map<string,bigint> → size/element access."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(
            "event_id",
            F.size(m).alias("n_keys"),
            m.getItem("k").alias("k_val"),
        )
        .orderBy("event_id")
    )


ARRAY_OPS_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS INTEGER)            AS dim,
  CAST(embedding[1] AS DOUBLE)               AS first_dim,
  CAST(list_max(embedding) AS DOUBLE)        AS max_dim,
  CAST(list_min(embedding) AS DOUBLE)        AS min_dim,
  CAST(list_max(embedding[1:4]) AS DOUBLE)   AS max_head
FROM embeddings
ORDER BY vec_id
"""


@register("array_ops_embeddings", oracle=ARRAY_OPS_ORACLE, tags=("scalar", "array", "vector"))
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column: size, index,
    min/max, slice — raw float values (no arithmetic) so the float→
    double upcast is exact on both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_dim"),
            F.array_max("embedding").cast("double").alias("max_dim"),
            F.array_min("embedding").cast("double").alias("min_dim"),
            F.array_max(F.slice("embedding", 1, 4)).cast("double").alias("max_head"),
        )
        .orderBy("vec_id")
    )


POSEXPLODE_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         UNNEST(range(len(string_split(text, ' ')))) AS pos,
         UNNEST(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id < 100
)
SELECT doc_id, CAST(pos AS INTEGER) AS pos, token
FROM tok WHERE token <> ''
ORDER BY doc_id, pos
"""


@register("lateral_posexplode_tokens", oracle=POSEXPLODE_ORACLE, tags=("scalar", "array", "lateral"))
def lateral_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral surface: posexplode a tokenized column into
    position-indexed rows (the LATERAL VIEW / UNNEST WITH ORDINALITY
    analog). Positions come from the generator itself, not a window —
    no shuffle at all; the explode is pipelined inside the scan stage.
    The DuckDB oracle zips parallel UNNESTs (range + list) since it
    lacks WITH ORDINALITY."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .where(F.col("token") != "")
        .orderBy("doc_id", "pos")
    )


NULL_HANDLING_ORACLE = """
SELECT e.event_id,
       COALESCE(c.c_name, '(anonymous)')            AS who,
       CAST(c.c_custkey IS NULL AS BOOLEAN)         AS is_anon,
       NULLIF(e.event_type, 'error')                AS type_or_null,
       CASE WHEN c.c_acctbal IS NULL THEN -1.0
            ELSE ROUND(c.c_acctbal, 2) END          AS bal_or_default
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
"""


@register("scalar_null_handling", oracle=NULL_HANDLING_ORACLE, tags=("scalar",))
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / null-test scalars over an outer join's null
    side."""
    ev = _t(spark, sf_dir, "events").alias("e")
    cust = _t(spark, sf_dir, "customer").alias("c")
    return (
        ev.join(cust, F.col("e.user_id") == F.col("c.c_custkey"), "left_outer")
        .select(
            "e.event_id",
            F.coalesce("c.c_name", F.lit("(anonymous)")).alias("who"),
            F.col("c.c_custkey").isNull().alias("is_anon"),
            F.nullif("e.event_type", F.lit("error")).alias("type_or_null"),
            F.when(F.col("c.c_acctbal").isNull(), -1.0)
            .otherwise(F.round("c.c_acctbal", 2))
            .alias("bal_or_default"),
        )
        .orderBy("event_id")
    )


# --- A4: surrogate key generation (etl.py:271-278) — rows-only ------------


@register("surrogate_keys", oracle=None, tags=("scalar", "reference", "nondeterministic"))
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key assignment continuing from a max (the reference's
    ``monotonically_increasing_id() + max_cnt``, ``etl.py:271-278``,
    with its NameError bug B3 fixed). IDs are partition-dependent →
    never oracle'd (rows-only check). The deterministic alternative
    for dense keys is row_number over an explicit total order."""
    orders = _t(spark, sf_dir, "orders")
    base = 1_000_000  # stands in for max(existing surrogate key) + 1
    return orders.select(
        (F.monotonically_increasing_id() + F.lit(base)).alias("songplay_like_id"),
        "o_orderkey",
    )


# --- §2.7 UDTF surface (extension): LATERAL table function ----------------

UDTF_SENTENCES_ORACLE = r"""
WITH punct AS (
  -- the synthetic corpus has no sentence terminators; derive them
  -- deterministically so the UDTF's multi-row expansion is exercised
  SELECT doc_id, replace(text, 'table', 'table.') AS text
  FROM documents
  WHERE doc_id < 50
), parts AS (
  SELECT
    doc_id,
    UNNEST(range(1, len(regexp_split_to_array(text, '[.!?]+\s+')) + 1)) AS pos1,
    UNNEST(regexp_split_to_array(text, '[.!?]+\s+'))                    AS frag
  FROM punct
), kept AS (
  SELECT
    doc_id, frag,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos1) - 1 AS sent_idx
  FROM parts
  WHERE TRIM(frag) <> ''
)
SELECT
  doc_id,
  CAST(sent_idx AS INT)  AS sent_idx,
  frag                   AS sentence,
  CAST(len(list_filter(regexp_split_to_array(frag, '\s+'), x -> x <> ''))
       AS INT)           AS n_words
FROM kept
"""


@register(
    "lateral_udtf_sentences",
    oracle=UDTF_SENTENCES_ORACLE,
    tags=("udtf", "lateral", "text"),
)
def lateral_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (functions/udtf.py): LATERAL-join the
    split_sentences table function against documents in plain SQL —
    the one-row-in/many-rows-out seam the reference's scalar-only UDF
    surface (SURVEY §2.7) lacks. Output is a pure function of the
    text, so the DuckDB oracle re-derives the identical rows with
    regexp_split + UNNEST + renumber. Small-input by policy: hot text
    paths stay JVM-side (functions/text.py); the UDTF seam is for
    logic builtins genuinely can't express."""
    from data_lake_with_spark_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        # the synthetic corpus has no punctuation; derive terminators
        # deterministically so multi-row expansion is exercised
        .withColumn("text", F.expr("replace(text, 'table', 'table.')"))
        .createOrReplaceTempView("udtf_docs")
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


# --- §1.3 semi-structured type surface: VARIANT (Spark 4) ------------------

VARIANT_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
           THEN 1 ELSE 0 END) AS BIGINT)                            AS n_hi,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("variant_extract_props", oracle=VARIANT_ORACLE, tags=("scalar", "json", "variant"))
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the JSON props
    column once into VariantType and extract typed paths with
    variant_get — the open-schema alternative to get_json_object
    string re-parsing (variant stores a parsed binary encoding, so N
    path extractions don't re-parse N times; the Delta/Iceberg v3
    semi-structured column story). Aggregated per event type so the
    oracle pins both the parse and the typed extraction."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k_val"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("k_val") >= 50).cast("bigint")).alias("n_hi"),
            F.sum("k_val").alias("sum_k"),
        )
        .orderBy("event_type")
    )
