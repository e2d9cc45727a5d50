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
from data_lake_with_spark_spark.operators.plan_cache import shared
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

    scan-audit waiver: 6 scans = 6 FD candidates — profiling N
    candidate dependencies is N independent two-column passes (each
    scan pruned to its own (lhs, rhs) pair, several over different
    tables), not a re-derived shared subtree.
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
    # shared(): the exploded posting frame feeds the df filter AND the
    # self-join sides; without it column pruning specializes each
    # branch's copy of the md5 frontend past ReuseExchange's
    # identical-canonical-plan test (observed: 8 parquet scans, 0
    # reuse) — the dedup.py shared-shingle-frame discipline, tracked
    # so release_shared_caches() reclaims the storage between queries.
    e = shared(
        fps.select("doc_id", F.explode_outer("fps").alias("fp")).where(
            F.col("fp").isNotNull()
        )
    )
    rare = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= 8)
    er = shared(e.join(rare.select("fp"), "fp"))
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
    from data_lake_with_spark_spark.operators.plan_cache import shared

    # seq feeds both sides of the lag self-join and tr feeds both the
    # row totals and the scoring join; uncached, the 3-table basket
    # pipeline re-ran per reference (13 effective FileScans, round-9
    # scan audit) — exchange reuse does NOT deduplicate across the
    # aliased self-join, a lazy shared cache does.
    seq = shared(
        dom.select(
            "o_custkey",
            "p_brand",
            F.row_number()
            .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
            .alias("rn"),
        )
    )
    nxt = seq.select(
        F.col("o_custkey").alias("ck"),
        F.col("p_brand").alias("next_brand"),
        (F.col("rn") - 1).alias("prev_rn"),
    )
    tr = shared(
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


# ---------------------------------------------------------------------------
# Isotonic calibration (exact weighted PAV via the minimax formula)
# ---------------------------------------------------------------------------

ISOTONIC_ORACLE = """
WITH scored AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) % 1000000 AS conf_ppm,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
  FROM orders
), bins AS (
  SELECT CAST(conf_ppm // 50000 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS pos
  FROM scored GROUP BY 1
), idxd AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bin) AS idx,
         SUM(n) OVER (ORDER BY bin) AS cum_n,
         SUM(pos) OVER (ORDER BY bin) AS cum_pos
  FROM bins
), seg AS (
  SELECT j.idx AS ji, k.idx AS ki,
         CAST((k.cum_pos - j.cum_pos + j.pos) * 1000000
              // (k.cum_n - j.cum_n + j.n) AS BIGINT) AS wavg_ppm
  FROM idxd j JOIN idxd k ON j.idx <= k.idx
), inner_min AS (
  SELECT seg.ji, i.idx AS ii, MIN(seg.wavg_ppm) AS wmin
  FROM seg JOIN idxd i ON seg.ki >= i.idx AND seg.ji <= i.idx
  GROUP BY seg.ji, i.idx
), iso AS (
  SELECT ii AS idx, CAST(MAX(wmin) AS BIGINT) AS iso_ppm
  FROM inner_min GROUP BY ii
)
SELECT b.bin, b.n, b.pos,
       CAST(b.pos * 1000000 // b.n AS BIGINT) AS raw_ppm,
       iso.iso_ppm
FROM idxd b JOIN iso ON b.idx = iso.idx
ORDER BY b.bin
"""


@register(
    "ml_isotonic_calibration",
    oracle=ISOTONIC_ORACLE,
    tags=("ml", "calibration", "isotonic"),
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration of the
    reliability curve — the sklearn IsotonicRegression / Zadrozny-Elkan
    calibrator — solved EXACTLY via the minimax characterization of
    weighted L2 isotonic regression: ŷᵢ = max_{j≤i} min_{k≥i}
    wavg(y, [j..k]). Same score/label convention as
    ml_calibration_ece (price-derived confidence ppm, status-F label),
    20 reliability bins. Segment averages are truncating-ppm
    rationals; floor is monotone, so min/max of floored averages IS
    the floored exact solution — bit-exact, no float accumulation.
    Where ml_calibration_ece MEASURES miscalibration, this query FITS
    the correction a serving system would apply.

    Scale shape: one data-sized hash-agg (20-bin histogram, map-side
    combine); everything after runs on the ≤20-row bin frame — the
    O(B³) minimax enumeration is 1 330 tiny rows of broadcast joins,
    independent of data size. The classic two-phase bounded-artifact
    pattern, kept fully lazy (the bin frame never hits the driver).
    """
    orders = _t(spark, sf_dir, "orders")
    bins = (
        orders.select(
            (F.floor(F.col("o_totalprice") * 100).cast("bigint") % 1000000).alias(
                "conf_ppm"
            ),
            (F.col("o_orderstatus") == "F").cast("int").alias("label"),
        )
        .groupBy(F.expr("conf_ppm div 50000").cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
        )
    )
    wb = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    idxd = bins.select(
        "bin", "n", "pos",
        F.row_number().over(W.orderBy("bin")).alias("idx"),
        F.sum("n").over(wb).alias("cum_n"),
        F.sum("pos").over(wb).alias("cum_pos"),
    )
    j = idxd.select(
        F.col("idx").alias("ji"), F.col("n").alias("jn"),
        F.col("pos").alias("jpos"), F.col("cum_n").alias("jcn"),
        F.col("cum_pos").alias("jcp"),
    )
    k = idxd.select(
        F.col("idx").alias("ki"), F.col("cum_n").alias("kcn"),
        F.col("cum_pos").alias("kcp"),
    )
    seg = j.join(F.broadcast(k), F.col("ji") <= F.col("ki")).select(
        "ji", "ki",
        F.expr("(kcp - jcp + jpos) * 1000000 div (kcn - jcn + jn)")
        .cast("bigint").alias("wavg_ppm"),
    )
    spine = idxd.select(F.col("idx").alias("ii"))
    inner_min = (
        seg.join(
            F.broadcast(spine),
            (F.col("ki") >= F.col("ii")) & (F.col("ji") <= F.col("ii")),
        )
        .groupBy("ji", "ii")
        .agg(F.min("wavg_ppm").alias("wmin"))
    )
    iso = inner_min.groupBy(F.col("ii").alias("idx")).agg(
        F.max("wmin").cast("bigint").alias("iso_ppm")
    )
    return (
        idxd.join(iso, "idx")
        .select(
            "bin", "n", "pos",
            F.expr("pos * 1000000 div n").cast("bigint").alias("raw_ppm"),
            "iso_ppm",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (leakage-safe variant)
# ---------------------------------------------------------------------------

TARGET_ENC_OOF_ORACLE = """
WITH j AS (
  SELECT p.p_brand,
         CAST(((l.l_orderkey * 2654435761) % 4294967296) % 5 AS BIGINT) AS fold,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), bf AS (
  SELECT p_brand, fold,
         CAST(COUNT(*) AS BIGINT) AS n_bf,
         CAST(SUM(ret) AS BIGINT) AS r_bf
  FROM j GROUP BY p_brand, fold
), tot AS (
  SELECT p_brand, fold, n_bf, r_bf,
         SUM(n_bf) OVER (PARTITION BY p_brand) AS n_b,
         SUM(r_bf) OVER (PARTITION BY p_brand) AS r_b,
         SUM(n_bf) OVER (PARTITION BY fold) AS n_f,
         SUM(r_bf) OVER (PARTITION BY fold) AS r_f,
         SUM(n_bf) OVER () AS n_all,
         SUM(r_bf) OVER () AS r_all
  FROM bf
)
SELECT p_brand, fold,
       CAST(n_b - n_bf AS BIGINT) AS n_other,
       FLOOR((
         (CAST(r_b - r_bf AS DOUBLE)
          + 50.0 * (CAST(r_all - r_f AS DOUBLE) / CAST(n_all - n_f AS DOUBLE)))
         / (CAST(n_b - n_bf AS DOUBLE) + 50.0)
       ) * 1e6 + 0.5) / 1e6 AS target_enc_oof
FROM tot
ORDER BY p_brand, fold
"""


@register(
    "feature_target_encoding_oof",
    oracle=TARGET_ENC_OOF_ORACLE,
    tags=("ml", "feature", "encoding"),
)
def feature_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-FOLD m-estimate target encoding — the leakage-safe form
    of feature_target_encoding: a row in fold f is encoded using only
    the OTHER folds' statistics, enc = (r₋f + m·prior₋f)/(n₋f + m)
    with m = 50 and the prior itself fold-excluded. Folds are the
    content-addressed multiplicative hash of the order key
    (training_cv_folds' split), so rows of one order share a fold and
    order-level leakage is closed too. Emits the (brand, fold)
    encoding table a trainer would join onto its features.

    Scale shape: broadcast part dim onto lineitem (no fact shuffle),
    ONE (brand, fold) hash-agg with map-side combine; every subtraction
    after that runs on the |brands|×k ≤ 125-row partial frame via
    windows — the fold-exclusion trick (total − fold part) never
    rescans the data, which is what makes OOF encoding O(1) extra
    work at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_returnflag"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.expr("((l_orderkey * 2654435761) % 4294967296) % 5")
        .cast("bigint").alias("fold"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    bf = j.groupBy("p_brand", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bf"),
        F.sum("ret").cast("bigint").alias("r_bf"),
    )
    tot = bf.select(
        "p_brand", "fold", "n_bf", "r_bf",
        F.sum("n_bf").over(W.partitionBy("p_brand")).alias("n_b"),
        F.sum("r_bf").over(W.partitionBy("p_brand")).alias("r_b"),
        F.sum("n_bf").over(W.partitionBy("fold")).alias("n_f"),
        F.sum("r_bf").over(W.partitionBy("fold")).alias("r_f"),
        F.sum("n_bf").over(W.partitionBy()).alias("n_all"),
        F.sum("r_bf").over(W.partitionBy()).alias("r_all"),
    )
    prior = (F.col("r_all") - F.col("r_f")).cast("double") / (
        F.col("n_all") - F.col("n_f")
    ).cast("double")
    enc = (
        (F.col("r_b") - F.col("r_bf")).cast("double") + F.lit(50.0) * prior
    ) / ((F.col("n_b") - F.col("n_bf")).cast("double") + F.lit(50.0))
    return tot.select(
        "p_brand", "fold",
        (F.col("n_b") - F.col("n_bf")).cast("bigint").alias("n_other"),
        pround(enc, 6).alias("target_enc_oof"),
    ).orderBy("p_brand", "fold")


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (MASE)
# ---------------------------------------------------------------------------

MASE_ORACLE = """
WITH bounds AS (
  SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1 FROM orders
), spine AS (
  SELECT unnest(generate_series(0,
           date_diff('day', (SELECT d0 FROM bounds), (SELECT d1 FROM bounds))
         )) AS idx
), prio AS (
  SELECT DISTINCT o_orderpriority FROM orders
), grid AS (
  SELECT p.o_orderpriority, s.idx FROM prio p JOIN spine s ON TRUE
), daily AS (
  SELECT o_orderpriority,
         date_diff('day', (SELECT d0 FROM bounds), o_orderdate) AS idx,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), series AS (
  SELECT g.o_orderpriority, g.idx, COALESCE(d.y, 0) AS y
  FROM grid g LEFT JOIN daily d
    ON g.o_orderpriority = d.o_orderpriority AND g.idx = d.idx
), lagged AS (
  SELECT o_orderpriority, idx, y,
         LAG(y, 7) OVER (PARTITION BY o_orderpriority ORDER BY idx) AS y7,
         LAG(y, 1) OVER (PARTITION BY o_orderpriority ORDER BY idx) AS y1
  FROM series
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(y - y7)) AS BIGINT) AS mae_model_sum,
       CAST(SUM(ABS(y - y1)) AS BIGINT) AS mae_naive_sum,
       CAST(SUM(ABS(y - y7)) * 1000000 // SUM(ABS(y - y1)) AS BIGINT) AS mase_ppm
FROM lagged WHERE idx >= 7
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "ml_forecast_backtest_mase",
    oracle=MASE_ORACLE,
    tags=("ml", "timeseries", "forecast"),
)
def ml_forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest with MASE (mean absolute scaled error,
    Hyndman-Koehler): per order priority, the weekly seasonal-naive
    forecast ŷ(t) = y(t−7) over the zero-filled complete daily spine,
    scored against the one-step naive ŷ(t) = y(t−1) — MASE < 1 means
    the seasonal model beats the naive benchmark. Counts are integers,
    so both MAE sums are exact and the ratio is truncating ppm: the
    whole backtest is bit-exact with no float in sight. The model-
    selection gate a forecasting pipeline runs before promoting a
    seasonal model.

    Scale shape: one (priority, day) hash-agg with map-side combine;
    the spine is a broadcast literal sequence off a 1-row bounds agg
    (never a data-sized generate), the zero-fill is a broadcast-right
    join onto the tiny grid, and the lag windows partition per
    priority over ≤ years×365 rows each. Only the daily histogram
    stage ever sees the fact table.
    """
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("idx")
    )
    prio = orders.select("o_orderpriority").distinct()
    grid = prio.crossJoin(F.broadcast(spine))
    daily = (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(
            "o_orderpriority",
            F.datediff("o_orderdate", "d0").cast("bigint").alias("idx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    series = grid.join(daily, ["o_orderpriority", "idx"], "left").select(
        "o_orderpriority", "idx", F.coalesce("y", F.lit(0)).alias("y")
    )
    wl = W.partitionBy("o_orderpriority").orderBy("idx")
    lagged = series.select(
        "o_orderpriority", "idx", "y",
        F.lag("y", 7).over(wl).alias("y7"),
        F.lag("y", 1).over(wl).alias("y1"),
    ).where(F.col("idx") >= 7)
    return (
        lagged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("y") - F.col("y7"))).cast("bigint").alias("mae_model_sum"),
            F.sum(F.abs(F.col("y") - F.col("y1"))).cast("bigint").alias("mae_naive_sum"),
        )
        .select(
            "o_orderpriority", "n_days", "mae_model_sum", "mae_naive_sum",
            F.expr("mae_model_sum * 1000000 div mae_naive_sum")
            .cast("bigint").alias("mase_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control over per-nation proportion z-tests
# ---------------------------------------------------------------------------

# Driver-quantized two-sided normal tail: p_two_ppm[b] =
# round(2·(1−Φ(b/20))·1e6) for z buckets b = 0..99 (z ≥ 5 → bucket
# 99). Computed ONCE at module load with math.erf and embedded as the
# same literal list in the Spark plan and the oracle SQL — the
# dft_coefficients driver-quantized-constants pattern, which keeps
# libm's ln/exp/erf differences out of the data path entirely.
import math as _math

_BH_PTAB = [
    round(2.0 * (1.0 - 0.5 * (1.0 + _math.erf((b / 20.0) / _math.sqrt(2.0)))) * 1e6)
    for b in range(100)
]
_BH_PTAB_SQL = "[" + ", ".join(str(v) for v in _BH_PTAB) + "]"
_BH_ALPHA_PPM = 50_000  # α = 0.05

STATS_FDR_BH_ORACLE = f"""
WITH per AS (
  SELECT n.n_name,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS k_f
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
), gtot AS (
  SELECT SUM(n_orders) AS n_all, SUM(k_f) AS k_all FROM per
), z AS (
  SELECT per.n_name, per.n_orders, per.k_f,
         (CAST(per.k_f AS DOUBLE) / CAST(per.n_orders AS DOUBLE)
          - CAST(gtot.k_all AS DOUBLE) / CAST(gtot.n_all AS DOUBLE))
         / sqrt((CAST(gtot.k_all AS DOUBLE) / CAST(gtot.n_all AS DOUBLE))
                * (1.0 - CAST(gtot.k_all AS DOUBLE) / CAST(gtot.n_all AS DOUBLE))
                / CAST(per.n_orders AS DOUBLE)) AS zv
  FROM per CROSS JOIN gtot
), pv AS (
  SELECT n_name, n_orders, k_f, zv,
         ({_BH_PTAB_SQL})[
           CAST(LEAST(FLOOR(ABS(zv) * 20.0), 99.0) AS INTEGER) + 1
         ] AS p_ppm
  FROM z
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY p_ppm, n_name) AS rnk,
         COUNT(*) OVER () AS m
  FROM pv
), kmax AS (
  SELECT COALESCE(MAX(CASE WHEN p_ppm * m <= rnk * {_BH_ALPHA_PPM}
                           THEN rnk ELSE 0 END), 0) AS kv
  FROM ranked
)
SELECT r.n_name, r.n_orders, r.k_f,
       FLOOR(r.zv * 1e4 + 0.5) / 1e4 AS z,
       CAST(r.p_ppm AS BIGINT) AS p_ppm,
       CAST(r.rnk AS BIGINT) AS rnk,
       r.rnk <= k.kv AS rejected
FROM ranked r CROSS JOIN kmax k
ORDER BY rnk, n_name
"""


@register(
    "stats_fdr_bh",
    oracle=STATS_FDR_BH_ORACLE,
    tags=("stats", "fdr", "multiple-testing"),
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across 25 simultaneous
    two-proportion z-tests (each nation's order-fulfillment rate vs
    the global rate): p-values come from a driver-quantized two-sided
    normal-tail table (z bucketed at 0.05 — the quantized-
    transcendentals pattern; z itself is sqrt-and-divide doubles,
    IEEE-identical across engines), then the step-up rule rejects
    ranks 1..k* where k* = max{r : p(r)·m ≤ r·α} — evaluated in PURE
    INTEGER arithmetic (p_ppm·m vs r·α_ppm), so the multiple-testing
    decision is bit-exact. The dashboard-wide "which segments really
    deviate" screen that a naive per-test α would flood with false
    positives.

    Scale shape: one fact-sized join + 25-group hash-agg with map-side
    combine; everything downstream (z, table lookup, ranking, the k*
    scalar) runs on the 25-row test frame via windows and a broadcast
    scalar join.
    """
    from data_lake_with_spark_spark.operators.plan_cache import shared

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    # the 25-row test frame feeds the global scalar, the p-value
    # projection, the ranking, AND the k* scalar — uncached, the
    # fact-sized orders⋈customer join re-ran per reference (12
    # effective FileScans, round-9 scan audit)
    per = shared(
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("o_orderstatus") == "F").cast("int"))
            .cast("bigint").alias("k_f"),
        )
    )
    glob = per.agg(
        F.sum("n_orders").alias("n_all"), F.sum("k_f").alias("k_all")
    )
    p0 = F.col("k_all").cast("double") / F.col("n_all").cast("double")
    zv = (
        F.col("k_f").cast("double") / F.col("n_orders").cast("double") - p0
    ) / F.sqrt(p0 * (F.lit(1.0) - p0) / F.col("n_orders").cast("double"))
    ptab = F.array(*[F.lit(v) for v in _BH_PTAB])
    pv = (
        per.crossJoin(F.broadcast(glob))
        .select("n_name", "n_orders", "k_f", zv.alias("zv"))
        .select(
            "n_name", "n_orders", "k_f", "zv",
            F.element_at(
                ptab,
                (F.least(F.floor(F.abs(F.col("zv")) * 20.0), F.lit(99.0)))
                .cast("int") + 1,
            ).alias("p_ppm"),
        )
    )
    ranked = pv.select(
        "*",
        F.row_number().over(W.orderBy("p_ppm", "n_name")).alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_ppm") * F.col("m")
                    <= F.col("rnk") * F.lit(_BH_ALPHA_PPM),
                    F.col("rnk"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("kv")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "n_name", "n_orders", "k_f",
            pround(F.col("zv"), 4).alias("z"),
            F.col("p_ppm").cast("bigint").alias("p_ppm"),
            F.col("rnk").cast("bigint").alias("rnk"),
            (F.col("rnk") <= F.col("kv")).alias("rejected"),
        )
        .orderBy("rnk", "n_name")
    )


# ---------------------------------------------------------------------------
# Quantile normalization across groups (vigintile mapping table)
# ---------------------------------------------------------------------------

QUANTILE_NORMALIZE_ORACLE = """
WITH ranked AS (
  SELECT c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
         NTILE(20) OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
         ) AS vigintile
  FROM customer
), per AS (
  SELECT c_mktsegment, CAST(vigintile AS BIGINT) AS vigintile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) * 10000 // COUNT(*) AS BIGINT) AS group_avg_ud
  FROM ranked GROUP BY 1, 2
)
SELECT c_mktsegment AS mktsegment, vigintile, n, group_avg_ud,
       CAST(SUM(group_avg_ud) OVER (PARTITION BY vigintile)
            // COUNT(*) OVER (PARTITION BY vigintile) AS BIGINT) AS ref_ud
FROM per
ORDER BY mktsegment, vigintile
"""


@register(
    "feature_quantile_normalize",
    oracle=QUANTILE_NORMALIZE_ORACLE,
    tags=("ml", "feature", "normalization"),
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization mapping table (the microarray/batch-
    effect standard, Bolstad et al.): per segment, account balances
    split into 20 equal-count vigintiles (total order: value then
    key), each vigintile's group mean in exact micro-dollars
    (cents·10⁴, truncating div), and the REFERENCE distribution = the
    cross-segment mean of those vigintile means — replacing each
    group's vigintile values with ref_ud forces every segment onto the
    identical distribution while preserving within-group ranks.
    Emitted as the (group, vigintile) → reference lookup a feature
    pipeline would broadcast-join onto its rows. Integer end-to-end:
    the averaged averages are integer-div rationals, so no float
    accumulation order can leak in.

    Scale shape: ONE window shuffle partitioned on the segment key
    (NTILE), one (segment, vigintile) hash-agg with map-side combine,
    then windows over the 100-row mapping table. The normalization
    APPLY step (not materialized here) is a broadcast join — nothing
    data-sized moves twice.
    """
    cust = _t(spark, sf_dir, "customer")
    ranked = cust.select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.ntile(20)
        .over(W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey"))
        .alias("vigintile"),
    )
    per = ranked.groupBy(
        "c_mktsegment", F.col("vigintile").cast("bigint").alias("vigintile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("SUM(cents) * 10000 div COUNT(*)").cast("bigint").alias("group_avg_ud"),
    )
    wv = W.partitionBy("vigintile")
    return per.select(
        F.col("c_mktsegment").alias("mktsegment"),
        "vigintile", "n", "group_avg_ud",
        (
            F.sum("group_avg_ud").over(wv) / F.count(F.lit(1)).over(wv)
        ).cast("bigint").alias("ref_ud"),
    ).orderBy("mktsegment", "vigintile")


# ---------------------------------------------------------------------------
# Leave-one-source-out data valuation
# ---------------------------------------------------------------------------

LOSO_SOURCE_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars_sum
  FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n_docs) AS n_all, SUM(chars_sum) AS chars_all FROM per
)
SELECT per.source, per.n_docs,
       CAST(tot.chars_all * 1000000 // tot.n_all AS BIGINT) AS mean_all_uchar,
       CAST((tot.chars_all - per.chars_sum) * 1000000
            // (tot.n_all - per.n_docs) AS BIGINT) AS mean_without_uchar,
       CAST((tot.chars_all - per.chars_sum) * 1000000
            // (tot.n_all - per.n_docs)
            - tot.chars_all * 1000000 // tot.n_all AS BIGINT) AS delta_uchar
FROM per CROSS JOIN tot
ORDER BY delta_uchar DESC, source
"""


@register(
    "training_loso_source_value",
    oracle=LOSO_SOURCE_ORACLE,
    tags=("training", "data-valuation", "llm"),
)
def training_loso_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation: for each document source,
    the corpus-level metric (mean doc length, exact micro-chars)
    recomputed WITHOUT that source, and the signed delta vs the full
    corpus — a positive delta means dropping the source RAISES corpus
    quality, the cheap first pass of data-valuation sweeps (LOO is the
    m=1 truncation of Data Shapley) that decides which crawl sources
    earn their tokens in the training mixture. Pure sufficient-
    statistic algebra: leave-out means come from (total − part), never
    a rescan per source.

    Scale shape: one source-keyed hash-agg with map-side combine over
    the corpus, a 1-row total broadcast back onto the ≤|sources| frame
    — the entire sweep over k sources costs ONE scan, not k scans,
    which is the only way LOO valuation survives a 100 TB corpus.
    """
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("n_all"), F.sum("chars_sum").alias("chars_all")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs",
            F.expr("chars_all * 1000000 div n_all")
            .cast("bigint").alias("mean_all_uchar"),
            F.expr(
                "(chars_all - chars_sum) * 1000000 div (n_all - n_docs)"
            ).cast("bigint").alias("mean_without_uchar"),
            F.expr(
                "(chars_all - chars_sum) * 1000000 div (n_all - n_docs)"
                " - chars_all * 1000000 div n_all"
            ).cast("bigint").alias("delta_uchar"),
        )
        .orderBy(F.desc("delta_uchar"), "source")
    )


# ---------------------------------------------------------------------------
# HMM Viterbi sequence scoring (max-sum DP in integer micro-nats)
# ---------------------------------------------------------------------------

# 2-state HMM (Active / Idle) over the 5 event types. All parameters
# are driver-quantized integer micro-nat log-probs (round(ln(p)·1e6))
# computed once here and embedded as identical literals in the Spark
# plan and the oracle SQL — Viterbi is max-plus only, so the DP is
# exact integer arithmetic (no logsumexp, which would NOT be portable).
def _lp(x: float) -> int:
    return round(_math.log(x) * 1e6)


# emission probs by event code 1..5 = click, view, signup, error, purchase
_HMM_EM_A = [_lp(p) for p in (0.30, 0.30, 0.05, 0.05, 0.30)]
_HMM_EM_I = [_lp(p) for p in (0.18, 0.30, 0.10, 0.40, 0.02)]
_HMM_T = {k: _lp(p) for k, p in
          dict(aa=0.80, ai=0.20, ia=0.30, ii=0.70).items()}
_HMM_EMA_SQL = "[" + ", ".join(map(str, _HMM_EM_A)) + "]"
_HMM_EMI_SQL = "[" + ", ".join(map(str, _HMM_EM_I)) + "]"
_HMM_CODE_SQL = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
    "WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 5 END"
)

HMM_VITERBI_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS tms, event_id,
         {_HMM_CODE_SQL} AS code
  FROM events
), seqs AS (
  SELECT user_id,
         list(code ORDER BY tms, event_id) AS codes
  FROM ev GROUP BY user_id
), em AS (
  SELECT user_id, len(codes) AS n_events,
         list_transform(codes, c -> {{'a': ({_HMM_EMA_SQL})[c],
                                      'i': ({_HMM_EMI_SQL})[c]}}) AS elems
  FROM seqs
), vit AS (
  SELECT user_id, n_events,
         list_reduce(elems, (acc, e) -> {{
           'a': e.a + greatest(acc.a + ({_HMM_T['aa']}),
                               acc.i + ({_HMM_T['ia']})),
           'i': e.i + greatest(acc.a + ({_HMM_T['ai']}),
                               acc.i + ({_HMM_T['ii']}))
         }}) AS v
  FROM em
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(v.a AS BIGINT) AS score_active,
       CAST(v.i AS BIGINT) AS score_idle,
       CAST(greatest(v.a, v.i) AS BIGINT) AS viterbi_score,
       CASE WHEN v.a >= v.i THEN 'active' ELSE 'idle' END AS best_state
FROM vit
ORDER BY user_id
"""


@register(
    "sequence_hmm_viterbi",
    oracle=HMM_VITERBI_ORACLE,
    tags=("sequence", "hmm", "ml"),
)
def sequence_hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi scoring of a 2-state HMM (Active/Idle) over each user's
    event sequence: the max-sum DP v_s(t) = em_s(x_t) + max_r(v_r(t−1)
    + trans_{r→s}) folds left over the time-ordered sequence, in PURE
    INTEGER micro-nat log-probs (driver-quantized parameters; max-plus
    never needs logsumexp, so Viterbi — unlike the forward algorithm —
    is exactly portable). Emits both terminal state scores, the
    Viterbi path score, and the decoded final state — the
    sequence-labeling primitive behind engagement-state segmentation,
    session intent tagging, and anomalous-trajectory screens. Uniform
    initial distribution drops out as a constant shift. Sequences are
    total-ordered by (ts, event_id), so the fold is deterministic
    under timestamp ties.

    Scale shape: ONE user-keyed shuffle (the sort-within-group
    collect); the DP itself is a per-row HOF fold in whole-stage
    codegen — zero further shuffles, state size O(states) per row.
    Per-user sequence length bounds memory exactly like the other
    collect_list sequence ops (document-bounded, not table-bounded).
    """
    from data_lake_with_spark_spark.functions.time import epoch_ms

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        epoch_ms("ts").alias("tms"),
        "event_id",
        F.expr(_HMM_CODE_SQL).alias("code"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(tms, event_id, code))),"
            " x -> x.code)"
        ).alias("codes")
    )
    ema = "array(" + ", ".join(f"{v}L" for v in _HMM_EM_A) + ")"
    emi = "array(" + ", ".join(f"{v}L" for v in _HMM_EM_I) + ")"
    elems = (
        f"transform(codes, c -> named_struct("
        f"'a', element_at({ema}, c), 'i', element_at({emi}, c)))"
    )
    vit = (
        f"aggregate(slice({elems}, 2, size(codes) - 1), "
        f"named_struct('a', element_at({elems}, 1).a, "
        f"'i', element_at({elems}, 1).i), "
        f"(acc, e) -> named_struct("
        f"'a', e.a + greatest(acc.a + ({_HMM_T['aa']}L), "
        f"acc.i + ({_HMM_T['ia']}L)), "
        f"'i', e.i + greatest(acc.a + ({_HMM_T['ai']}L), "
        f"acc.i + ({_HMM_T['ii']}L))))"
    )
    scored = seqs.select(
        "user_id",
        F.size("codes").cast("bigint").alias("n_events"),
        F.expr(vit).alias("v"),
    )
    return scored.select(
        "user_id", "n_events",
        F.col("v.a").cast("bigint").alias("score_active"),
        F.col("v.i").cast("bigint").alias("score_idle"),
        F.greatest("v.a", "v.i").cast("bigint").alias("viterbi_score"),
        F.when(F.col("v.a") >= F.col("v.i"), F.lit("active"))
        .otherwise(F.lit("idle")).alias("best_state"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Split-conformal prediction intervals (exact order-statistic quantile)
# ---------------------------------------------------------------------------

CONFORMAL_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(((o_orderkey * 2654435761) % 4294967296) % 5 AS BIGINT) AS fold
  FROM orders
), pred AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred_cents
  FROM base WHERE fold <= 2 GROUP BY o_orderpriority
), cal AS (
  SELECT b.o_orderpriority, ABS(b.cents - p.pred_cents) AS resid, b.o_orderkey
  FROM base b JOIN pred p ON b.o_orderpriority = p.o_orderpriority
  WHERE b.fold = 3
), calr AS (
  SELECT o_orderpriority, resid,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY resid, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_cal
  FROM cal
), q AS (
  SELECT o_orderpriority, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
         CAST(MAX(CASE WHEN rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)
                       THEN resid END) AS BIGINT) AS q_cents
  FROM calr GROUP BY o_orderpriority
), test AS (
  SELECT b.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN ABS(b.cents - p.pred_cents) <= q.q_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM base b
  JOIN pred p ON b.o_orderpriority = p.o_orderpriority
  JOIN q ON b.o_orderpriority = q.o_orderpriority
  WHERE b.fold = 4
  GROUP BY b.o_orderpriority
)
SELECT p.o_orderpriority, p.n_train, p.pred_cents,
       q.n_cal, q.q_cents, t.n_test,
       CAST(t.covered * 1000000 // t.n_test AS BIGINT) AS coverage_ppm
FROM pred p
JOIN q ON p.o_orderpriority = q.o_orderpriority
JOIN test t ON p.o_orderpriority = t.o_orderpriority
ORDER BY p.o_orderpriority
"""


@register(
    "ml_conformal_interval",
    oracle=CONFORMAL_ORACLE,
    tags=("ml", "conformal", "uncertainty"),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; the
    distribution-free uncertainty wrapper production ML now ships):
    folds 0-2 fit the point model (per-priority mean price, exact
    integer cents), fold 3 is the calibration set whose absolute
    residuals yield the conformal radius q = the ⌈0.9·(n+1)⌉-th
    smallest residual (EXACT order statistic via ranked window —
    ceil in integer arithmetic, capped at n_cal), and fold 4 measures
    empirical coverage of pred ± q, which conformal theory guarantees
    ≥ 90% in expectation. Folds are the content-addressed hash split
    (training_cv_folds), so train/cal/test are disjoint and
    reproducible. Integer end-to-end: cents, ranks, and coverage ppm.

    Scale shape: one scan feeds three fold-filtered branches; the
    model and radius collapse to ≤|priorities| rows broadcast back;
    the only data-sized shuffles are the per-priority hash-aggs and
    ONE ranked window over the calibration fold (1/5 of the data),
    partitioned on the group key.
    """
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("cents"),
        F.expr("((o_orderkey * 2654435761) % 4294967296) % 5")
        .cast("bigint").alias("fold"),
    )
    # shared(): pred is a ≤|priorities|-row model broadcast into BOTH
    # the calibration and test branches — uncached, its train-fold
    # subtree re-derived per reference (7 effective scans, round-10
    # audit). The three remaining fold-filtered scans of base are
    # semantically one data pass (disjoint 60/20/20% folds), so base
    # itself stays uncached — scan-audit waiver.
    pred = shared(
        base.where(F.col("fold") <= 2)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.expr("SUM(cents) div COUNT(*)").cast("bigint").alias("pred_cents"),
        )
    )
    cal = (
        base.where(F.col("fold") == 3)
        .join(F.broadcast(pred), "o_orderpriority")
        .select(
            "o_orderpriority", "o_orderkey",
            F.abs(F.col("cents") - F.col("pred_cents")).alias("resid"),
        )
    )
    wp = W.partitionBy("o_orderpriority")
    calr = cal.select(
        "o_orderpriority", "resid",
        F.row_number().over(wp.orderBy("resid", "o_orderkey")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_cal"),
    )
    q = calr.groupBy("o_orderpriority").agg(
        F.max("n_cal").cast("bigint").alias("n_cal"),
        F.max(
            F.when(
                F.col("rn")
                == F.least(
                    (9 * (F.col("n_cal") + 1) + 9) / F.lit(10),
                    F.col("n_cal").cast("double"),
                ).cast("bigint"),
                F.col("resid"),
            )
        ).cast("bigint").alias("q_cents"),
    )
    test = (
        base.where(F.col("fold") == 4)
        .join(F.broadcast(pred), "o_orderpriority")
        .join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (F.abs(F.col("cents") - F.col("pred_cents")) <= F.col("q_cents"))
                .cast("int")
            ).cast("bigint").alias("covered"),
        )
    )
    return (
        pred.join(q, "o_orderpriority")
        .join(test, "o_orderpriority")
        .select(
            "o_orderpriority", "n_train", "pred_cents", "n_cal", "q_cents",
            "n_test",
            F.expr("covered * 1000000 div n_test")
            .cast("bigint").alias("coverage_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# k-anonymity risk audit (privacy profiling of quasi-identifiers)
# ---------------------------------------------------------------------------

KANONYMITY_ORACLE = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS gsize
  FROM customer
  GROUP BY 1, 2, 3
), bucketed AS (
  SELECT CASE WHEN gsize = 1 THEN '1'
              WHEN gsize = 2 THEN '2'
              WHEN gsize <= 4 THEN '3-4'
              WHEN gsize <= 9 THEN '5-9'
              ELSE '10+' END AS k_bucket,
         CASE WHEN gsize = 1 THEN 1 WHEN gsize = 2 THEN 2
              WHEN gsize <= 4 THEN 3 WHEN gsize <= 9 THEN 4
              ELSE 5 END AS ord,
         gsize
  FROM qi
), tot AS (
  SELECT SUM(gsize) AS n_rows_all FROM qi
)
SELECT b.k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(b.gsize) AS BIGINT) AS n_rows,
       CAST(SUM(b.gsize) * 1000000 // t.n_rows_all AS BIGINT) AS rows_share_ppm,
       b.k_bucket IN ('1', '2', '3-4') AS at_risk_k5
FROM bucketed b CROSS JOIN tot t
GROUP BY b.k_bucket, b.ord, t.n_rows_all
ORDER BY b.ord
"""


@register(
    "pii_risk_kanonymity",
    oracle=KANONYMITY_ORACLE,
    tags=("dq", "privacy", "pii"),
)
def pii_risk_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk audit (Sweeney): group rows by the
    quasi-identifier tuple (nation, segment, $1000 balance band) and
    histogram the equivalence-class sizes — classes smaller than k = 5
    re-identify their members against any external dataset sharing the
    QIs, so the audit reports group counts, row counts, and the exact
    ppm share of rows at risk per size bucket. The release gate a
    training-data pipeline runs before shipping user-derived tables;
    complements pii_redact (which scrubs direct identifiers — this
    measures the INDIRECT ones).

    Scale shape: one QI-keyed hash-agg with map-side combine, then a
    five-bucket rollup of the group-size frame and a 1-row total
    broadcast — O(distinct QI tuples) state, one data-sized scan.
    """
    cust = _t(spark, sf_dir, "customer")
    qi = cust.groupBy(
        "c_nationkey", "c_mktsegment",
        F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) div 100000")
        .alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("gsize"))
    bucketed = qi.select(
        "gsize",
        F.when(F.col("gsize") == 1, "1")
        .when(F.col("gsize") == 2, "2")
        .when(F.col("gsize") <= 4, "3-4")
        .when(F.col("gsize") <= 9, "5-9")
        .otherwise("10+").alias("k_bucket"),
        F.when(F.col("gsize") == 1, 1)
        .when(F.col("gsize") == 2, 2)
        .when(F.col("gsize") <= 4, 3)
        .when(F.col("gsize") <= 9, 4)
        .otherwise(5).alias("ord"),
    )
    tot = qi.agg(F.sum("gsize").alias("n_rows_all"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("k_bucket", "ord", "n_rows_all")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("gsize").cast("bigint").alias("n_rows"),
        )
        .select(
            "k_bucket", "n_groups", "n_rows",
            F.expr("n_rows * 1000000 div n_rows_all")
            .cast("bigint").alias("rows_share_ppm"),
            F.col("k_bucket").isin("1", "2", "3-4").alias("at_risk_k5"),
        )
        .orderBy("ord")
    )


# ---------------------------------------------------------------------------
# Sequential probability ratio test (SPRT) A/B monitor
# ---------------------------------------------------------------------------

# Wald SPRT for Bernoulli conversion, H0: p = 0.30 vs H1: p = 0.35,
# α = β = 0.05. Per-observation LLR increments and the decision
# boundaries ±ln(19), all driver-quantized integer micro-nats.
_SPRT_LLR_SUCCESS = _lp(0.35) - _lp(0.30)
_SPRT_LLR_FAILURE = _lp(0.65) - _lp(0.70)
_SPRT_BOUND = round(_math.log(19.0) * 1e6)

AB_SPRT_ORACLE = f"""
WITH obs AS (
  SELECT user_id % 2 AS arm, epoch_ms(ts) AS tms, event_id,
         CASE WHEN event_type = 'purchase'
              THEN {_SPRT_LLR_SUCCESS} ELSE {_SPRT_LLR_FAILURE} END AS llr_inc
  FROM events
), cum AS (
  SELECT arm, tms, event_id, llr_inc,
         SUM(llr_inc) OVER (PARTITION BY arm ORDER BY tms, event_id
                            ROWS UNBOUNDED PRECEDING) AS llr,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY tms, event_id) AS n
  FROM obs
), crossings AS (
  SELECT arm, MIN(CASE WHEN llr >= {_SPRT_BOUND} THEN n END) AS first_h1,
         MIN(CASE WHEN llr <= -{_SPRT_BOUND} THEN n END) AS first_h0,
         MAX(n) AS n_obs
  FROM cum GROUP BY arm
), final AS (
  SELECT c.arm, c.llr AS final_llr
  FROM cum c JOIN crossings x ON c.arm = x.arm AND c.n = x.n_obs
)
SELECT x.arm, CAST(x.n_obs AS BIGINT) AS n_obs,
       CAST(f.final_llr AS BIGINT) AS final_llr,
       CASE WHEN COALESCE(x.first_h1, x.n_obs + 1)
                 < COALESCE(x.first_h0, x.n_obs + 1) THEN 'h1'
            WHEN COALESCE(x.first_h0, x.n_obs + 1)
                 < COALESCE(x.first_h1, x.n_obs + 1) THEN 'h0'
            ELSE 'continue' END AS decision,
       CAST(LEAST(COALESCE(x.first_h1, x.n_obs + 1),
                  COALESCE(x.first_h0, x.n_obs + 1)) AS BIGINT) AS decision_at
FROM crossings x JOIN final f ON x.arm = f.arm
ORDER BY x.arm
"""


@register(
    "ab_sprt_monitor",
    oracle=AB_SPRT_ORACLE,
    tags=("stats", "ab-test", "sequential"),
)
def ab_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test over each experiment
    arm's event stream (H0: conversion = 0.30 vs H1: 0.35, α = β =
    0.05): per-observation log-likelihood increments accumulate in
    order, and the arm decides at the FIRST crossing of ±ln 19 —
    Wald's guarantee is that this stops ~half as early as the
    fixed-horizon test (ab_test_conversion) at the same error rates,
    which is why experimentation platforms monitor sequentially.
    Increments and boundaries are driver-quantized integer micro-nats;
    the cumulative sum, crossing search, and decision are exact
    integer window/agg arithmetic over the (ts, event_id) total order.
    decision_at is n_obs+1 when no boundary was hit ('continue').

    Scale shape: ONE arm-keyed window shuffle for the ordered cumsum
    (running-total frame, no re-sort for the rank — same window), one
    arm agg for the crossing minima, and a 2-row self-join for the
    final LLR. Arms partition the stream, so the monitor scales with
    per-arm traffic exactly like window_running_total.
    """
    from data_lake_with_spark_spark.functions.time import epoch_ms

    obs = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"),
        epoch_ms("ts").alias("tms"),
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(_SPRT_LLR_SUCCESS))
        .otherwise(F.lit(_SPRT_LLR_FAILURE)).alias("llr_inc"),
    )
    wo = W.partitionBy("arm").orderBy("tms", "event_id")
    cum = obs.select(
        "arm",
        F.sum("llr_inc").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("llr"),
        F.row_number().over(wo).alias("n"),
    )
    crossings = cum.groupBy("arm").agg(
        F.min(F.when(F.col("llr") >= _SPRT_BOUND, F.col("n"))).alias("first_h1"),
        F.min(F.when(F.col("llr") <= -_SPRT_BOUND, F.col("n"))).alias("first_h0"),
        F.max("n").alias("n_obs"),
    )
    final = cum.join(
        crossings.select("arm", F.col("n_obs").alias("n")), ["arm", "n"]
    ).select("arm", F.col("llr").alias("final_llr"))
    h1 = F.coalesce("first_h1", F.col("n_obs") + 1)
    h0 = F.coalesce("first_h0", F.col("n_obs") + 1)
    return (
        crossings.join(final, "arm")
        .select(
            "arm",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.col("final_llr").cast("bigint").alias("final_llr"),
            F.when(h1 < h0, "h1").when(h0 < h1, "h0")
            .otherwise("continue").alias("decision"),
            F.least(h1, h0).cast("bigint").alias("decision_at"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Feature-hashing (hashing-trick) collision audit
# ---------------------------------------------------------------------------

FEATURE_HASHING_ORACLE = """
WITH feats AS (
  SELECT 'brand=' || p_brand AS feat FROM part
  UNION ALL SELECT 'type=' || p_type FROM part
  UNION ALL SELECT 'size=' || CAST(p_size AS VARCHAR) FROM part
), fc AS (
  SELECT feat, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST('0x' || substring(md5(feat), 1, 8) AS BIGINT) % 256 AS bucket
  FROM feats GROUP BY feat
), per_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(n_rows) AS BIGINT) AS n_rows
  FROM fc GROUP BY bucket
), tot AS (
  SELECT SUM(n_feats) AS f_all, SUM(n_rows) AS r_all FROM per_bucket
)
SELECT CAST(b.n_feats AS BIGINT) AS collision_degree,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(b.n_feats) AS BIGINT) AS n_features,
       CAST(SUM(b.n_rows) AS BIGINT) AS n_rows,
       CAST(SUM(b.n_rows) * 1000000 // t.r_all AS BIGINT) AS rows_share_ppm
FROM per_bucket b CROSS JOIN tot t
GROUP BY b.n_feats, t.r_all
ORDER BY collision_degree
"""


@register(
    "feature_hashing_audit",
    oracle=FEATURE_HASHING_ORACLE,
    tags=("ml", "feature", "hashing"),
)
def feature_hashing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit: the part table's categorical
    features (brand, type, size — ~225 distinct feature strings) map
    through a 256-bucket portable hash (md5-32bit mod 256, the
    Weinberger et al. feature-hashing layer), and the audit histograms
    buckets by collision degree — how many distinct features share
    each bucket and what ppm of training rows ride on collided
    buckets. The dimensionality-vs-collision tradeoff check run before
    fixing a hashed feature space's width.

    Scale shape: per-feature row counts are hash-aggs with map-side
    combine (feature cardinality state, not row count); bucket
    assignment is map-side arithmetic on the ≤|features| frame;
    everything after runs on ≤256 rows. The audit never shuffles the
    fact table — at 100 TB the only data-sized stage is ONE 3-column
    scan whose rows explode map-side into the three feature strings
    (round 10: was a 3-way unionAll = 3 scans of the same table,
    doubled again by the bucket frame's two consumers — 6 effective
    scans); the ≤256-row bucket histogram is a tracked shared() cache.
    """
    from data_lake_with_spark_spark.operators.plan_cache import shared

    part = _t(spark, sf_dir, "part")
    feats = part.select(
        F.explode(
            F.array(
                F.concat(F.lit("brand="), "p_brand"),
                F.concat(F.lit("type="), "p_type"),
                F.concat(F.lit("size="), F.col("p_size").cast("string")),
            )
        ).alias("feat")
    )
    fc = feats.groupBy("feat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(
        "feat", "n_rows",
        (
            F.expr("CAST(conv(substring(md5(feat), 1, 8), 16, 10) AS BIGINT)") % 256
        ).alias("bucket"),
    )
    per_bucket = shared(
        fc.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )
    tot = per_bucket.agg(F.sum("n_rows").alias("r_all"))
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .groupBy(F.col("n_feats").alias("collision_degree"), "r_all")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("n_feats").cast("bigint").alias("n_features"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("collision_degree").cast("bigint").alias("collision_degree"),
            "n_buckets", "n_features", "n_rows",
            F.expr("n_rows * 1000000 div r_all")
            .cast("bigint").alias("rows_share_ppm"),
        )
        .orderBy("collision_degree")
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout (exact integer moments)
# ---------------------------------------------------------------------------

AB_CUPED_ORACLE = """
WITH bounds AS (
  SELECT (MIN(epoch_ms(ts)) + MAX(epoch_ms(ts))) // 2 AS mid FROM events
), per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN epoch_ms(ts) < b.mid THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN epoch_ms(ts) >= b.mid
                        AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events CROSS JOIN bounds b
  GROUP BY user_id
), pooled AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM per_user
), arms AS (
  SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n_a,
         CAST(SUM(x) AS HUGEINT) AS sx_a, CAST(SUM(y) AS HUGEINT) AS sy_a
  FROM per_user GROUP BY arm
)
SELECT a.arm,
       CAST(a.n_a AS BIGINT) AS n_users,
       CAST(a.sy_a * 1000000 // a.n_a AS BIGINT) AS raw_mean_ppm,
       CAST((a.sy_a * (p.n * p.sxx - p.sx * p.sx) * p.n
             - (p.n * p.sxy - p.sx * p.sy) * (a.sx_a * p.n - p.sx * a.n_a))
            * 1000000
            // (a.n_a * (p.n * p.sxx - p.sx * p.sx) * p.n)
            AS BIGINT) AS cuped_mean_ppm,
       CAST((p.n * p.sxy - p.sx * p.sy) * (p.n * p.sxy - p.sx * p.sy)
            * 1000000
            // ((p.n * p.sxx - p.sx * p.sx) * (p.n * p.syy - p.sy * p.sy))
            AS BIGINT) AS var_reduction_ppm
FROM arms a CROSS JOIN pooled p
ORDER BY a.arm
"""


@register(
    "ab_cuped_adjustment",
    oracle=AB_CUPED_ORACLE,
    tags=("stats", "ab-test", "cuped"),
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the standard
    experimentation-platform trick): each user's pre-period activity X
    (events before the timeline midpoint) adjusts their post-period
    conversion count Y via θ = cov(X,Y)/var(X), cutting metric
    variance by ρ² without biasing the treatment contrast. Everything
    is EXACT: the moments are integer sums, θ never materializes as a
    float — the adjusted mean is the single cross-multiplied rational
    [Sy_a·varX·n − cov·(Sx_a·n − Sx·n_a)] / (n_a·varX·n) evaluated in
    DECIMAL(38,0)/HUGEINT (int64 would overflow at driver scale — the
    widen-before-multiply rule), truncated once to ppm. Reports per
    arm: raw mean, CUPED-adjusted mean, and the achieved ρ² variance
    reduction.

    Scale shape: one user-keyed hash-agg with map-side combine (the
    only data-sized shuffle), a 1-row pooled-moment agg and a 2-row
    arm agg broadcast together; the adjustment itself is scalar
    arithmetic. The timeline midpoint is a 1-row bounds agg broadcast
    into the scan.
    """
    from data_lake_with_spark_spark.functions.time import epoch_ms

    ev = _t(spark, sf_dir, "events").select(
        "user_id", epoch_ms("ts").alias("tms"), "event_type"
    )
    bounds = ev.agg(
        F.expr("(MIN(tms) + MAX(tms)) div 2").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("tms") < F.col("mid")).cast("int"))
            .cast("bigint").alias("x"),
            F.sum(
                ((F.col("tms") >= F.col("mid"))
                 & (F.col("event_type") == "purchase")).cast("int")
            ).cast("bigint").alias("y"),
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    d = "decimal(38,0)"
    pooled = per_user.agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum("x").cast(d).alias("sx"),
        F.sum("y").cast(d).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(d).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast(d).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast(d).alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast(d).alias("n_a"),
        F.sum("x").cast(d).alias("sx_a"),
        F.sum("y").cast(d).alias("sy_a"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "arm",
            F.col("n_a").cast("bigint").alias("n_users"),
            F.expr("sy_a * 1000000 div n_a").cast("bigint").alias("raw_mean_ppm"),
            F.expr(
                "(sy_a * (n * sxx - sx * sx) * n"
                " - (n * sxy - sx * sy) * (sx_a * n - sx * n_a)) * 1000000"
                " div (n_a * (n * sxx - sx * sx) * n)"
            ).cast("bigint").alias("cuped_mean_ppm"),
            F.expr(
                "(n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000"
                " div ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            ).cast("bigint").alias("var_reduction_ppm"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# Sessionization timeout sensitivity (multi-config, one scan)
# ---------------------------------------------------------------------------

_SESSION_TIMEOUTS_S = [300, 900, 1800, 3600]

SESSION_SENSITIVITY_ORACLE = f"""
WITH g AS (
  SELECT user_id,
         epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
         ) AS gap_ms
  FROM events
), agg AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {", ".join(
             f"CAST(SUM(CASE WHEN gap_ms > {t * 1000} THEN 1 ELSE 0 END)"
             f" AS BIGINT) AS brk_{t}" for t in _SESSION_TIMEOUTS_S)}
  FROM g
)
{" UNION ALL ".join(
    f"SELECT CAST({t} AS BIGINT) AS timeout_sec,"
    f" CAST(n_users + brk_{t} AS BIGINT) AS n_sessions,"
    f" CAST(n_events * 1000000 // (n_users + brk_{t}) AS BIGINT)"
    f" AS events_per_session_ppm FROM agg" for t in _SESSION_TIMEOUTS_S)}
ORDER BY timeout_sec
"""


@register(
    "sessionize_timeout_sensitivity",
    oracle=SESSION_SENSITIVITY_ORACLE,
    tags=("analytics", "session", "config-sweep"),
)
def sessionize_timeout_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-timeout sensitivity sweep: the session count at idle
    timeouts 5/15/30/60 min, all from ONE scan — per user, sessions(T)
    = 1 + #(gaps > T), so the whole curve is four conditional counts
    over the same lag-gap frame (no re-sessionization per config).
    The calibration readout that picks a sessionization timeout by
    showing where the session count stabilizes; pairs with
    window_session_5min, which materializes the chosen config.

    Scale shape: ONE user-keyed window shuffle for the ordered lag,
    one global agg with map-side combine carrying all four counters at
    once; the per-config fan-out is a 4-row literal unpivot of the
    1-row aggregate. Sweeping k configs costs k counters, not k scans.
    """
    from data_lake_with_spark_spark.functions.time import epoch_ms

    ev = _t(spark, sf_dir, "events").select(
        "user_id", epoch_ms("ts").alias("tms"), "event_id"
    )
    g = ev.select(
        "user_id",
        (
            F.col("tms")
            - F.lag("tms").over(W.partitionBy("user_id").orderBy("tms", "event_id"))
        ).alias("gap_ms"),
    )
    agg = g.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        *[
            F.sum((F.col("gap_ms") > t * 1000).cast("int"))
            .cast("bigint").alias(f"brk_{t}")
            for t in _SESSION_TIMEOUTS_S
        ],
    )
    stack = ", ".join(
        f"{t}L, n_users + brk_{t}" for t in _SESSION_TIMEOUTS_S
    )
    return (
        agg.select(
            "n_events",
            F.expr(
                f"stack({len(_SESSION_TIMEOUTS_S)}, {stack})"
                " AS (timeout_sec, n_sessions)"
            ),
        )
        .select(
            F.col("timeout_sec").cast("bigint").alias("timeout_sec"),
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.expr("n_events * 1000000 div n_sessions")
            .cast("bigint").alias("events_per_session_ppm"),
        )
        .orderBy("timeout_sec")
    )


# ---------------------------------------------------------------------------
# Revenue concentration curve (Lorenz deciles)
# ---------------------------------------------------------------------------

LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM rev
), per AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM ranked GROUP BY decile
), tot AS (
  SELECT SUM(revenue_cents) AS all_cents FROM per
)
SELECT p.decile, p.n_customers, p.revenue_cents,
       CAST(SUM(p.revenue_cents) OVER (ORDER BY p.decile) * 1000000
            // t.all_cents AS BIGINT) AS cum_share_ppm
FROM per p CROSS JOIN tot t
ORDER BY p.decile
"""


@register(
    "finance_lorenz_revenue",
    oracle=LORENZ_ORACLE,
    tags=("finance", "analytics", "concentration"),
)
def finance_lorenz_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Lorenz) curve: customers ranked by
    lifetime revenue (exact integer cents), cut into equal-count
    deciles (total order: revenue desc, key), each decile's revenue
    and the cumulative top-k% share in exact ppm — the "top 10% of
    customers drive X% of revenue" readout; the curve whose area
    complement is the Gini that score_user_gini_diversity computes on
    a different domain. Integer end-to-end.

    Scale shape: one customer-keyed hash-agg with map-side combine,
    ONE global NTILE window (range-partitioned sort over the customer
    aggregate — |customers| rows, not |orders|), then windows over
    the 10-row decile frame with a broadcast total.
    """
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint").alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.ntile(10).over(W.orderBy(F.desc("cents"), F.asc("o_custkey")))
        .alias("decile"),
    )
    per = ranked.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    tot = per.agg(F.sum("revenue_cents").alias("all_cents"))
    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_customers", "revenue_cents",
            F.expr(
                "SUM(revenue_cents) OVER (ORDER BY decile"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " * 1000000 div all_cents"
            ).cast("bigint").alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Graph: k-truss edges (triangle-support peeling) — round 8
# ---------------------------------------------------------------------------


def _ktruss_oracle(k: int = 3, n_iter: int = 2) -> str:
    """Unrolled SQL twin of ``operators/graph.py:ktruss`` pinned to
    ``n_iter`` peel rounds over the deterministic vec_id<400 near-dup
    graph: per round, per-edge triangle support = common neighbors of
    the endpoints WITHIN the surviving edge set, drop edges below
    k−2; final support recomputed on the last edge set (left join,
    COALESCE 0 — identical to the operator's pinned-mode output)."""
    min_sup = int(k) - 2
    head = """WITH e AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id < 400
), p AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND FLOOR((list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 1e6 + 0.5) / 1e6 >= 0.35
), e0 AS MATERIALIZED (SELECT DISTINCT a_id, b_id FROM p)"""
    ctes = [head]
    for i in range(1, n_iter + 1):
        ctes.append(
            f""", u{i - 1} AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM e{i - 1}
  UNION ALL SELECT b_id, a_id FROM e{i - 1}
), s{i} AS MATERIALIZED (
  SELECT g.a_id, g.b_id, CAST(COUNT(*) AS BIGINT) AS support
  FROM e{i - 1} g
  JOIN u{i - 1} x ON x.src = g.a_id
  JOIN u{i - 1} y ON y.src = g.b_id AND y.dst = x.dst
  GROUP BY g.a_id, g.b_id
), e{i} AS MATERIALIZED (
  SELECT a_id, b_id FROM s{i} WHERE support >= {min_sup}
)"""
        )
    return "".join(ctes) + (
        f""", uf AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM e{n_iter}
  UNION ALL SELECT b_id, a_id FROM e{n_iter}
), sf AS MATERIALIZED (
  SELECT g.a_id, g.b_id, CAST(COUNT(*) AS BIGINT) AS support
  FROM e{n_iter} g
  JOIN uf x ON x.src = g.a_id
  JOIN uf y ON y.src = g.b_id AND y.dst = x.dst
  GROUP BY g.a_id, g.b_id
)
SELECT g.a_id, g.b_id, CAST(COALESCE(s.support, 0) AS BIGINT) AS support
FROM e{n_iter} g LEFT JOIN sf s USING (a_id, b_id)
ORDER BY a_id, b_id"""
    )


@register(
    "graph_ktruss_edges",
    oracle=_ktruss_oracle(3, 2),
    tags=("graph", "dedup", "llm", "iterative"),
)
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the near-dup graph by triangle-support peeling
    (2 unrolled rounds): edges that close at least one triangle in the
    surviving subgraph — the cohesion filter strictly stronger than
    k-core (Cohen 2008) that drops incidental pairwise matches while
    keeping socially-reinforced duplicate clusters intact, the
    standard cleanup before community extraction on noisy similarity
    graphs. ``operators/graph.py:ktruss`` pinned to n_iter=2 (the
    unrolled-oracle twin mode; the converging default is pytest-pinned
    in tests/test_graph_fixpoint.py). Pinned mode builds its plan
    lazily — no checkpoint jobs, so this query stays out of
    EAGER_QUERIES. Per round: one adjacency double join + one
    hash-agg, Σ_edge min-degree triangle work — the distributed-truss
    cost, bucketed-join shaped at 100 TB."""
    from data_lake_with_spark_spark.operators import similarity as SIM
    from data_lake_with_spark_spark.operators.graph import ktruss

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = SIM.lsh_near_pairs(emb, threshold=0.35)
    return (
        ktruss(pairs, k=3, n_iter=2)
        .select("a_id", "b_id", F.col("support").cast("bigint").alias("support"))
        .orderBy("a_id", "b_id")
    )
