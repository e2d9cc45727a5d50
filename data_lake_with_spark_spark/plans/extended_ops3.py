"""Round-7 third-session batch: data-driven attribution, interval
estimation, schema profiling, and the remaining analytics families.

Same registry discipline as plans/extended_ops.py / extended_ops2.py:
integer-exact or deterministically-rounded outputs, full DuckDB
oracles, no cartesian products, no Python in the hot path. These are
training-pipeline / product-analytics extensions beyond the
reference's own surface (reference scope: /root/reference/etl.py — no
counterpart there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution (4-channel coalition game)
# ---------------------------------------------------------------------------

# The four touch channels and their journey-set bits. The game has
# n = 4 players, so the Shapley weight of a coalition S not containing
# the player is |S|!·(n−1−|S|)!  (denominator n! = 24 applied once at
# the end): |S|=0 → 6, 1 → 2, 2 → 2, 3 → 6.
_SHAPLEY_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}
# Static coalition lattice: for every channel, every coalition S with
# the channel absent — (channel, S, S∪{channel}, weight). 4×8 = 32
# rows, enumerated once at module load and shared verbatim by the
# Spark literal frame and the generated oracle VALUES list.
_SHAPLEY_LATTICE = [
    (name, mask, mask | bit, _SHAPLEY_W[bin(mask).count("1")])
    for name, bit in _SHAPLEY_CHANNELS
    for mask in range(16)
    if mask & bit == 0
]

_SHAPLEY_VALUES = ", ".join(
    f"('{c}', {ms}, {msb}, {w})" for c, ms, msb, w in _SHAPLEY_LATTICE
)

_SHAPLEY_BITS_SQL = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END"
)

ATTRIBUTION_SHAPLEY_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS widx,
         {_SHAPLEY_BITS_SQL} AS bit,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), j AS (
  SELECT user_id, widx, bit_or(bit) AS mask, MAX(conv) AS converted
  FROM ev GROUP BY user_id, widx
), v AS (
  SELECT mask,
         CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS v_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_j
  FROM j GROUP BY mask
), lat(channel, mask_s, mask_sb, w) AS (
  VALUES {_SHAPLEY_VALUES}
)
SELECT lat.channel,
       CAST(SUM(lat.w * (COALESCE(vb.v_ppm, 0) - COALESCE(vs.v_ppm, 0)))
            AS BIGINT) AS shapley_num,
       CAST(SUM(lat.w * (COALESCE(vb.v_ppm, 0) - COALESCE(vs.v_ppm, 0)))
            // 24 AS BIGINT) AS shapley_ppm
FROM lat
LEFT JOIN v vs ON lat.mask_s = vs.mask
LEFT JOIN v vb ON lat.mask_sb = vb.mask
GROUP BY lat.channel
ORDER BY lat.channel
"""


@register(
    "attribution_shapley",
    oracle=ATTRIBUTION_SHAPLEY_ORACLE,
    tags=("analytics", "attribution", "shapley"),
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Shapley-value channel attribution (Zhao et al.
    2018 shape): journeys are (user, epoch-week) pairs, a journey's
    coalition is the set of non-purchase channels touched that week,
    and the characteristic function v(S) is the empirical conversion
    rate (exact ppm, truncating div) of journeys whose coalition is
    EXACTLY S — unobserved coalitions contribute v = 0. With 4
    channels the 2⁴ lattice is fully enumerable, so the Shapley value
    is computed EXACTLY (no permutation sampling): for each channel,
    Σ over the 8 coalitions without it of |S|!·(3−|S|)!·(v(S∪{c})−v(S)),
    divided once by 4! = 24 (truncation toward zero — Spark `div` and
    DuckDB `//` agree on negative marginals). Unlike last-touch /
    U-shaped (attribution_last_touch, attribution_position_based) this
    credits channels by their marginal lift over every coalition, the
    fairness-axiom answer to cross-channel synergy.

    Scale shape: ONE keyed shuffle — the (user, week) journey
    aggregate with map-side bit_or/max combine; the conversion-rate
    table is ≤16 rows and the coalition lattice is a 32-row literal,
    so both Shapley joins are broadcast hash joins over static frames.
    At 100 TB the only data-sized stage is the journey agg, which
    partitions on user and combines before the exchange.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7").alias("widx"),
        F.expr(_SHAPLEY_BITS_SQL).alias("bit"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    journeys = ev.groupBy("user_id", "widx").agg(
        F.bit_or("bit").alias("mask"), F.max("conv").alias("converted")
    )
    v = journeys.groupBy("mask").agg(
        (F.sum("converted") * F.lit(1000000)).alias("knum"),
        F.count(F.lit(1)).alias("n_j"),
    ).select("mask", F.expr("knum div n_j").cast("bigint").alias("v_ppm"))

    lat = spark.createDataFrame(
        _SHAPLEY_LATTICE, "channel string, mask_s bigint, mask_sb bigint, w bigint"
    )
    vs = v.select(F.col("mask").alias("mask_s"), F.col("v_ppm").alias("v_s"))
    vb = v.select(F.col("mask").alias("mask_sb"), F.col("v_ppm").alias("v_b"))
    marg = (
        lat.join(F.broadcast(vs), "mask_s", "left")
        .join(F.broadcast(vb), "mask_sb", "left")
        .select(
            "channel",
            (
                F.col("w")
                * (F.coalesce("v_b", F.lit(0)) - F.coalesce("v_s", F.lit(0)))
            ).alias("contrib"),
        )
    )
    return (
        marg.groupBy("channel")
        .agg(F.sum("contrib").cast("bigint").alias("shapley_num"))
        .select(
            "channel",
            "shapley_num",
            F.expr("shapley_num div 24").cast("bigint").alias("shapley_ppm"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Wilson score confidence intervals for segment conversion rates
# ---------------------------------------------------------------------------

WILSON_CI_ORACLE = f"""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_active
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
    ON c.c_custkey = o.o_custkey
  GROUP BY c_mktsegment
), w AS (
  SELECT c_mktsegment, n_customers, n_active,
         CAST(n_active AS DOUBLE) / CAST(n_customers AS DOUBLE) AS p,
         CAST(n_customers AS DOUBLE) AS nn
  FROM seg
)
SELECT c_mktsegment AS mktsegment, n_customers, n_active,
       CAST(n_active * 1000000 // n_customers AS BIGINT) AS p_ppm,
       {pround_sql(
           "((p + 3.8416 / (2.0 * nn)) - 1.96 * sqrt((p * (1.0 - p)"
           " + 3.8416 / (4.0 * nn)) / nn)) / (1.0 + 3.8416 / nn)", 6)}
         AS wilson_lo,
       {pround_sql(
           "((p + 3.8416 / (2.0 * nn)) + 1.96 * sqrt((p * (1.0 - p)"
           " + 3.8416 / (4.0 * nn)) / nn)) / (1.0 + 3.8416 / nn)", 6)}
         AS wilson_hi
FROM w
ORDER BY mktsegment
"""


@register(
    "stats_wilson_ci",
    oracle=WILSON_CI_ORACLE,
    tags=("stats", "interval", "binomial"),
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the per-segment
    customer activation rate (share of customers with ≥1 order). The
    Wilson interval is the standard fix for the Wald interval's
    misbehavior at small n / extreme p (never leaves [0,1], no zero
    width at p̂ ∈ {0,1}). The rate itself is exact integer ppm; the
    bounds use the float path deliberately — every operation in the
    formula (+ − × ÷ sqrt) is IEEE-correctly-rounded and therefore
    bit-identical across engines given the identical expression tree
    (the sqrt-only portability rule from timeseries_cross_correlation),
    then portable-rounded to 6 dp.

    Scale shape: one distinct-projection shuffle on o_custkey (map-side
    combine), one left-semi-shaped join on the customer key, one
    5-group agg; the interval math is per-group scalar arithmetic.
    """
    cust = _t(spark, sf_dir, "customer")
    active = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    seg = (
        cust.join(active, cust.c_custkey == active.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("o_custkey").isNotNull().cast("bigint")).alias("n_active"),
        )
    )
    p = F.col("n_active").cast("double") / F.col("n_customers").cast("double")
    nn = F.col("n_customers").cast("double")
    z2 = F.lit(3.8416)
    center = p + z2 / (F.lit(2.0) * nn)
    margin = F.lit(1.96) * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nn)) / nn)
    denom = F.lit(1.0) + z2 / nn
    return seg.select(
        F.col("c_mktsegment").alias("mktsegment"),
        "n_customers",
        "n_active",
        F.expr("n_active * 1000000 div n_customers").cast("bigint").alias("p_ppm"),
        pround((center - margin) / denom, 6).alias("wilson_lo"),
        pround((center + margin) / denom, 6).alias("wilson_hi"),
    ).orderBy("mktsegment")


# ---------------------------------------------------------------------------
# Functional-dependency discovery (schema profiling)
# ---------------------------------------------------------------------------

# Candidate FDs to grade: (table, lhs, rhs). A fixed candidate set —
# production FD miners (TANE/HyFD) prune a lattice, but the per-
# candidate measurement below IS their inner loop.
_FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_brand"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"),
]


def _fd_oracle_one(tbl: str, lhs: str, rhs: str) -> str:
    return f"""
  SELECT '{tbl}' AS tbl, '{lhs}->{rhs}' AS fd,
         CAST(COUNT(*) AS BIGINT) AS lhs_card,
         CAST(SUM(tot) AS BIGINT) AS n_rows,
         CAST(SUM(mx) * 1000000 // SUM(tot) AS BIGINT) AS conf_ppm
  FROM (
    SELECT {lhs} AS x, MAX(c) AS mx, SUM(c) AS tot
    FROM (SELECT {lhs}, {rhs}, COUNT(*) AS c FROM {tbl} GROUP BY {lhs}, {rhs})
    GROUP BY {lhs}
  )"""


DQ_FD_DISCOVERY_ORACLE = (
    "\nUNION ALL\n".join(_fd_oracle_one(t, l, r) for t, l, r in _FD_CANDIDATES)
    + "\nORDER BY tbl, fd"
)


@register(
    "dq_fd_discovery",
    oracle=DQ_FD_DISCOVERY_ORACLE,
    tags=("dq", "profiling", "fd"),
)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency discovery over a fixed
    candidate set: for each X→Y candidate, confidence = the fraction
    of rows kept by the best Y per X group (Σₓ maxᵧ count(x,y) / N,
    exact ppm) — 1.0 iff the FD holds exactly (g₃-error complement,
    the measure TANE/HyFD-style profilers compute per lattice node).
    Reports the LHS cardinality alongside so a user can spot
    key-like columns vs genuine dependencies.

    Scale shape: per candidate, two hash-agg shuffles with map-side
    combine — (x, y) counts, then per-x max/sum — followed by a
    scalar fold; candidates touch different tables and union into one
    result. Nothing is ever joined row-to-row, so the profile cost is
    a handful of independent aggregations regardless of table width.
    """
    parts = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        pair = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(lhs).alias("x"), F.col(rhs).alias("y"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        perx = pair.groupBy("x").agg(
            F.max("c").alias("mx"), F.sum("c").alias("tot")
        )
        parts.append(
            perx.agg(
                F.count(F.lit(1)).cast("bigint").alias("lhs_card"),
                F.sum("tot").cast("bigint").alias("n_rows"),
                F.sum("mx").cast("bigint").alias("keep"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                "lhs_card",
                "n_rows",
                F.expr("keep * 1000000 div n_rows").cast("bigint").alias("conf_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "fd")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — positional near-dup detection
# ---------------------------------------------------------------------------

WINNOWING_ORACLE = r"""
WITH d AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
  FROM documents
), h AS (
  SELECT doc_id,
         list_transform(range(1, length(norm) - 15 + 1), i ->
           CAST('0x' || substring(md5(substring(norm, i, 16)), 1, 8) AS BIGINT)
         ) AS hs
  FROM d WHERE length(norm) >= 23
), f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(hs) - 8 + 2), j ->
           list_min(list_slice(hs, j, j + 7)))) AS fps
  FROM h
), e AS (
  SELECT doc_id, unnest(fps) AS fp FROM f
), rare AS (
  SELECT fp FROM e GROUP BY fp HAVING COUNT(*) <= 8
), er AS (
  SELECT e.doc_id, e.fp FROM e JOIN rare USING (fp)
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps FROM er GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
  FROM er a JOIN er b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= 3
)
SELECT p.doc_a, p.doc_b, p.shared_fps,
       sa.n_fps AS size_a, sb.n_fps AS size_b,
       CAST(p.shared_fps * 1000000 // LEAST(sa.n_fps, sb.n_fps) AS BIGINT)
         AS containment_ppm
FROM pairs p
JOIN sz sa ON p.doc_a = sa.doc_id
JOIN sz sb ON p.doc_b = sb.doc_id
ORDER BY doc_a, doc_b
"""


@register(
    "text_winnowing_fingerprints",
    oracle=WINNOWING_ORACLE,
    tags=("text", "dedup", "winnowing"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing near-dup detection (Schleimer et al. 2003):
    16-char k-gram rolling hashes (portable 32-bit md5 prefix), window
    w = 8 min-selection — the winnowing guarantee picks ≥1 fingerprint
    per w consecutive grams, so any shared run ≥ k+w−1 chars yields a
    shared fingerprint — then an inverted-index self-join reports doc
    pairs sharing ≥3 fingerprints with containment ppm. Fingerprints
    with document frequency > 8 are dropped FIRST (template
    boilerplate: on this corpus the cap cuts candidate pairs ~700×
    without touching genuine near-dup families — the standard
    heavy-hitter discipline of plagiarism/near-dup indexes).

    Complements the hash-bucket families (dedup_minhash_lsh,
    dedup_simhash): winnowing is positional, so it localizes WHERE the
    overlap is and catches contained excerpts MinHash dilutes.

    Scale shape: hashing and window-min selection are per-row HOF
    column math (zero shuffle, whole-stage codegen); the posting index
    shuffles once on fingerprint, and the df ≤ 8 cap bounds every
    posting list, so the pair fanout is ≤ C(8,2) per fingerprint —
    Σ postings², never corpus². No cartesian anywhere.
    """
    docs = _t(spark, sf_dir, "documents")
    fps = (
        docs.select(
            "doc_id",
            F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")).alias("norm"),
        )
        .where(F.length("norm") >= 23)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, length(norm) - 15), i -> "
                "CAST(conv(substring(md5(substring(norm, i, 16)), 1, 8), 16, 10)"
                " AS BIGINT))"
            ).alias("hs"),
        )
        # Barrier: materialize the per-position hash array ONCE before
        # the window-min fan-out references it ~m times — without it,
        # CollapseProject inlines the m-term md5 transform into every
        # window min (O(m²) md5 calls per document; the ARCHITECTURE.md
        # HOF expression-duplication lesson).
        .repartition("doc_id")
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(hs) - 7), j -> "
                "array_min(slice(hs, j, 8))))"
            ).alias("fps"),
        )
    )
    # explode_outer, not explode: InferFiltersFromGenerate turns an
    # inner explode into a `size(fps) > 0` filter that Catalyst pushes
    # below the repartition barrier, re-inlining the O(m²) md5 window
    # expression into the scan stage (observed: the single pre-shuffle
    # task runs ~80k md5+regexp evaluations PER ROW and never
    # finishes). Outer generate infers nothing; the barrier holds, and
    # the null guard filters on the generated column, above the
    # Generate. Every doc with norm ≥ 23 chars has ≥1 fingerprint, so
    # semantics are unchanged.
    e = fps.select("doc_id", F.explode_outer("fps").alias("fp")).where(
        F.col("fp").isNotNull()
    )
    rare = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= 8)
    er = e.join(rare.select("fp"), "fp")
    sz = er.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_fps"))
    a = er.select(F.col("doc_id").alias("doc_a"), "fp")
    b = er.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .where(F.col("shared_fps") >= 3)
    )
    return (
        pairs.join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_fps", "size_a"), "doc_a")
        .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_fps", "size_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "shared_fps", "size_a", "size_b",
            F.expr("shared_fps * 1000000 div least(size_a, size_b)")
            .cast("bigint").alias("containment_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Markov next-item recommender (transition matrix with Laplace smoothing)
# ---------------------------------------------------------------------------

MARKOV_NEXT_ITEM_ORACLE = """
WITH spend AS (
  SELECT o.o_custkey, o.o_orderkey, o.o_orderdate, p.p_brand,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS brand_spend
  FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate, p.p_brand
), dom AS (
  SELECT o_custkey, o_orderkey, o_orderdate, p_brand
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY o_orderkey
             ORDER BY brand_spend DESC, p_brand ASC
           ) AS brn
    FROM spend
  ) WHERE brn = 1
), seq AS (
  SELECT o_custkey, p_brand,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
         ) AS rn
  FROM dom
), tr AS (
  SELECT a.p_brand AS cur_brand, b.p_brand AS next_brand,
         CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM seq a JOIN seq b
    ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
  GROUP BY a.p_brand, b.p_brand
), v AS (
  SELECT CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS vocab FROM part
), tot AS (
  SELECT cur_brand, SUM(n_trans) AS row_tot FROM tr GROUP BY cur_brand
), scored AS (
  SELECT tr.cur_brand, tr.next_brand, tr.n_trans,
         CAST((tr.n_trans + 1) * 1000000 // (tot.row_tot + v.vocab) AS BIGINT)
           AS prob_ppm,
         ROW_NUMBER() OVER (
           PARTITION BY tr.cur_brand
           ORDER BY tr.n_trans DESC, tr.next_brand ASC
         ) AS rnk
  FROM tr JOIN tot ON tr.cur_brand = tot.cur_brand CROSS JOIN v
)
SELECT cur_brand, next_brand, n_trans, prob_ppm, CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= 3
ORDER BY cur_brand, rnk
"""


@register(
    "recsys_markov_next_item",
    oracle=MARKOV_NEXT_ITEM_ORACLE,
    tags=("recsys", "markov", "sequence"),
)
def recsys_markov_next_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-item recommender: each order is
    represented by its dominant brand (argmax of exact-decimal brand
    spend within the basket, tie-break brand asc — the per-line
    sequence would be ill-defined: this dataset has duplicate
    (orderkey, linenumber) rows, so any line-level ROW_NUMBER ties
    nondeterministically); per-customer order sequences (total order
    by orderdate + unique orderkey) then yield brand→brand transition
    counts, and Laplace-smoothed conditional probability P(next|cur) =
    (N+1)/(rowtotal+|V|) in exact truncating ppm ranks the top-3
    recommendations per antecedent brand (tie-break: count desc,
    brand asc). The "customers who bought X next bought Y" baseline —
    the sequence-aware sibling of recsys_item_item_topk's co-purchase
    cosine.

    Scale shape: one fact-sized join pipeline (lineitem⋈orders,
    broadcast part), a per-order spend agg with map-side combine, ONE
    window shuffle on the customer key for sequencing, then the lag
    self-join stays in the same partitioning (AQE reuses the
    exchange); transition/total aggregates collapse to |brands|² ≤ 625
    rows, and the vocabulary scalar broadcasts. At 100 TB only the
    basket agg and the sequencing window are data-sized, and both
    partition cleanly on their keys.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    spend = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate", "p_brand")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("brand_spend"))
    )
    dom = (
        spend.withColumn(
            "brn",
            F.row_number().over(
                W.partitionBy("o_orderkey").orderBy(
                    F.desc("brand_spend"), F.asc("p_brand")
                )
            ),
        )
        .where(F.col("brn") == 1)
        .drop("brn", "brand_spend")
    )
    seq = dom.select(
        "o_custkey",
        "p_brand",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    nxt = seq.select(
        F.col("o_custkey").alias("ck"),
        F.col("p_brand").alias("next_brand"),
        (F.col("rn") - 1).alias("prev_rn"),
    )
    tr = (
        seq.join(
            nxt,
            (seq.o_custkey == nxt.ck) & (seq.rn == nxt.prev_rn),
        )
        .groupBy(F.col("p_brand").alias("cur_brand"), "next_brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    vocab = p.agg(F.countDistinct("p_brand").cast("bigint").alias("vocab"))
    tot = tr.groupBy("cur_brand").agg(F.sum("n_trans").alias("row_tot"))
    scored = (
        tr.join(tot, "cur_brand")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cur_brand",
            "next_brand",
            "n_trans",
            F.expr("(n_trans + 1) * 1000000 div (row_tot + vocab)")
            .cast("bigint")
            .alias("prob_ppm"),
            F.row_number()
            .over(
                W.partitionBy("cur_brand").orderBy(
                    F.desc("n_trans"), F.asc("next_brand")
                )
            )
            .cast("bigint")
            .alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )
    return scored.orderBy("cur_brand", "rnk")


# ---------------------------------------------------------------------------
# Grid-density DBSCAN (GriDBSCAN phase 1: dense-cell clustering)
# ---------------------------------------------------------------------------

_DBSCAN_CELL = 20_000_000  # micro-degree cell edge (matches spatial_knn_grid)
_DBSCAN_MINPTS = 3
_DBSCAN_ROUNDS = 8  # pointer-jumping reach ~2^8 ≥ any dense-cell path here

_DBSCAN_OFFSETS = ", ".join(
    f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
)


def _dbscan_oracle(n_iter: int = _DBSCAN_ROUNDS) -> str:
    head = f"""WITH pts AS MATERIALIZED (
  SELECT c_custkey AS id,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8)
              AS BIGINT) % 180000000 AS x,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8)
              AS BIGINT) % 360000000 AS y
  FROM customer WHERE c_custkey < 1500
), cells AS MATERIALIZED (
  SELECT x // {_DBSCAN_CELL} AS cx, y // {_DBSCAN_CELL} AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
), dense AS MATERIALIZED (
  SELECT cx, cy, cx * 1000 + cy AS cid, n FROM cells WHERE n >= {_DBSCAN_MINPTS}
), off(dx, dy) AS (VALUES {_DBSCAN_OFFSETS}),
pairs AS MATERIALIZED (
  SELECT a.cid AS a_id, b.cid AS b_id
  FROM dense a JOIN off ON TRUE
  JOIN dense b ON b.cx = a.cx + off.dx AND b.cy = a.cy + off.dy
  WHERE a.cid < b.cid
), ed AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
), l0 AS MATERIALIZED (
  SELECT DISTINCT src AS id, src AS lab FROM ed
)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", l{i} AS MATERIALIZED (
  SELECT l.id, LEAST(LEAST(l.lab, pj.lab), MIN(n.lab)) AS lab
  FROM l{i - 1} l
  JOIN l{i - 1} pj ON pj.id = l.lab
  JOIN ed ON ed.src = l.id
  JOIN l{i - 1} n ON n.id = ed.dst
  GROUP BY l.id, l.lab, pj.lab
)"""
        )
    return "".join(ctes) + f"""
, clustered AS (
  SELECT COALESCE(l.lab, d.cid) AS cluster, d.n
  FROM dense d LEFT JOIN l{n_iter} l ON l.id = d.cid
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n) AS BIGINT) AS n_points
FROM clustered GROUP BY cluster
UNION ALL
SELECT -1, 0, CAST(COALESCE(SUM(n), 0) AS BIGINT)
FROM cells WHERE n < {_DBSCAN_MINPTS}
ORDER BY n_points DESC, cluster
"""


@register(
    "spatial_dbscan_grid",
    oracle=_dbscan_oracle(),
    tags=("spatial", "clustering", "iterative"),
)
def spatial_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density DBSCAN (the GriDBSCAN / DBSCAN-on-cells phase 1):
    points land in fixed 20M-micro-degree cells, cells with ≥ minPts
    points are core, and clusters are the connected components of the
    8-neighborhood adjacency graph over core cells (pointer-jumping
    min-label flooding, pinned 8 rounds — the unrolled oracle-twin
    mode of operators/graph.py:min_label_components); isolated core
    cells cluster alone and sub-threshold cells report as the noise
    row (cluster = −1). Same portable md5 micro-degree coordinates as
    spatial_knn_grid. This is how density clustering actually scales:
    the per-cell histogram replaces DBSCAN's per-point ε-range query,
    so no point-to-point join ever happens.

    Scale shape: one cell-histogram shuffle with map-side combine
    (O(points) scan, O(cells) state); the adjacency join fans each
    core cell out ×9 map-side (literal offsets) and equi-joins on the
    neighbor cell key; the CC kernel then runs on the DENSE-CELL graph
    — ≤ grid-size nodes regardless of point count, which is the whole
    point of gridding at 100 TB.
    """
    from data_lake_with_spark_spark.operators.graph import min_label_components

    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 1500)

    def coord(salt: str, mod: int):
        return F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(c_custkey AS STRING),"
            f" '{salt}')), 1, 8), 16, 10) AS BIGINT), {mod})"
        )

    pts = cust.select(
        coord("lat", 180000000).alias("x"), coord("lon", 360000000).alias("y")
    )
    cells = (
        pts.select(
            F.expr(f"x div {_DBSCAN_CELL}").alias("cx"),
            F.expr(f"y div {_DBSCAN_CELL}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    dense = cells.where(F.col("n") >= _DBSCAN_MINPTS).select(
        "cx", "cy", (F.col("cx") * 1000 + F.col("cy")).alias("cid"), "n"
    )
    off = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    probes = dense.crossJoin(F.broadcast(off)).select(
        F.col("cid").alias("a_id"),
        (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"),
    )
    pairs = (
        probes.join(
            dense.select(
                F.col("cx").alias("nx"), F.col("cy").alias("ny"),
                F.col("cid").alias("b_id"),
            ),
            ["nx", "ny"],
        )
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    labels = min_label_components(pairs, n_iter=_DBSCAN_ROUNDS)
    clustered = dense.join(
        labels.select(F.col("id").alias("cid"), "lab"), "cid", "left"
    ).select(F.coalesce("lab", "cid").alias("cluster"), "n")
    clusters = clustered.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_points"),
    )
    noise = cells.where(F.col("n") < _DBSCAN_MINPTS).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_points")
    ).select(
        F.lit(-1).cast("bigint").alias("cluster"),
        F.lit(0).cast("bigint").alias("n_cells"),
        "n_points",
    )
    return clusters.unionByName(noise).orderBy(F.desc("n_points"), "cluster")
