"""Relational layer, batch 2: as-of/range joins, exact percentiles,
unpivot, date arithmetic, regexp extraction, ordered string
aggregation, conditional aggregation, keep-latest dedup, quartile
windows, correlated-aggregate filters, histograms, sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.time import epoch_ms

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.operators.joins import asof_join, range_join_bucketed
from data_lake_with_spark_spark.plans.parity import davg, davg_sql, dsum, dsum_sql
from data_lake_with_spark_spark.plans.registry import register



# Covis-join build-side broadcast gate (round-15 ADVICE fix): the
# (win, user_id) distinct frame broadcasts while the EVENTS scan it
# derives from is estimated under this bound (the distinct output is
# strictly smaller than the scan; 48 MB of scan keeps the built hash
# relation comfortably under the session's 64 MB auto threshold with
# row-overhead headroom). Above it, the co-visitation join shuffles
# both sides on ``win`` — the 100 TB path.
COVIS_BROADCAST_MAX_INPUT_BYTES = 48 << 20


def _plan_size_bytes(df):
    """Catalyst's estimated output size of the plan (file-size derived
    for parquet scans) — lazy, no job at construction."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))  # noqa: SLF001


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


STRAT_SAMPLE_ORACLE = """
WITH ranked AS (
  SELECT event_id, event_type, user_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
)
SELECT event_id, event_type, user_id FROM ranked
WHERE rn <= 20
ORDER BY event_type, event_id
"""


@register("sample_stratified_topk", oracle=STRAT_SAMPLE_ORACLE, tags=("sample", "window"))
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly 20 events per type,
    chosen by content hash (md5 of the id) — reproducible across
    engines, runs, and partition layouts, unlike seeded TABLESAMPLE
    (which is layout-dependent; see scan_tablesample, rows-only for
    that reason). One window shuffle on the stratum column."""
    from data_lake_with_spark_spark.operators.sampling import stratified_topk

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    return stratified_topk(ev, ["event_type"], 20, "event_id").orderBy(
        "event_type", "event_id"
    )


WEIGHTED_SAMPLE_ORACLE = """
WITH pr AS (
  SELECT doc_id, source, n_chars,
         (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'ws1'), 1, 8)
               AS BIGINT) + 1)
           / (CAST(n_chars AS DOUBLE) * 4294967296.0) AS prio
  FROM documents WHERE n_chars > 0
), top AS (
  SELECT doc_id, source, n_chars,
         CAST(FLOOR(prio * 1e12) AS BIGINT) AS priority_e12
  FROM pr ORDER BY prio ASC, doc_id ASC LIMIT 50
)
SELECT * FROM top ORDER BY doc_id
"""


@register(
    "sample_weighted_priority",
    oracle=WEIGHTED_SAMPLE_ORACLE,
    tags=("sample", "llm"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sampling without replacement via priority
    (sequential Poisson) sampling: md5-derived uniform / weight, keep
    the 50 smallest priorities — inclusion odds ≈ proportional to
    n_chars, selection bit-reproducible on any engine (one exact
    integer division, no libm pow), independent of partitioning. The
    top-n plans as TakeOrderedAndProject, never a global sort. See
    operators/sampling.py:weighted_priority_sample."""
    from data_lake_with_spark_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_priority_sample(docs, 50, "n_chars").orderBy("doc_id")


SALTED_ORACLE = """
SELECT o.o_orderpriority,
       {rev} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""".format(rev=dsum_sql("l_extendedprice * (1 - l_discount)", 2))


@register("join_salted_skew", oracle=SALTED_ORACLE, tags=("join", "skew"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join skew mitigation (operators/skew.py) on the
    lineitem→orders fact join: probe rows carry a deterministic row
    hash salt, the build side is replicated salt×, and the join key
    becomes (orderkey, salt) — a hot orderkey spreads over 8 reducers.
    Result is exactly the plain join (the oracle IS the plain SQL
    join); use when the build side sits in the broadcast-threshold
    failure zone and AQE can't re-split (co-grouping, streaming)."""
    from data_lake_with_spark_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, ["l_orderkey"], salt=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


ASOF_ORACLE = """
SELECT c.event_id, c.user_id, CAST(epoch_ms(c.ts) AS BIGINT) AS ts_ms,
       CAST(epoch_ms(p.ts) AS BIGINT) AS purchase_ts_ms, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
"""


@register("join_asof_last_purchase", oracle=ASOF_ORACLE, tags=("join", "asof"))
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's most recent
    purchase at-or-before it (union + last-ignorenulls window — no
    native Spark as-of join exists). Timestamps are emitted as epoch
    millis (exact integers): a struct-extracted timestamp column was
    observed to occasionally collect with a shifted representation in
    long shared sessions, and integer epochs are engine- and
    representation-proof (same hardening as the nanos-as-long
    ingestion path)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_p",
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_ms("ts").alias("ts_ms"),
        epoch_ms("ts_p").alias("purchase_ts_ms"),
        F.col("value_p").alias("purchase_value"),
    ).orderBy("event_id")


RANGE_ORACLE = """
SELECT e1.event_id AS a_id, e2.event_id AS b_id
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL '5 minutes'
ORDER BY a_id, b_id
"""


@register("join_range_within_5min", oracle=RANGE_ORACLE, tags=("join", "range"))
def join_range_within_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range join: per user, pairs of events ≤ 5 minutes apart —
    bucketized equi-join (2 probes) instead of an O(n²) theta join."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    left = ev.select(F.col("event_id").alias("a_id"), "user_id", "ts")
    right = ev.select(F.col("event_id").alias("b_id"), "user_id", F.col("ts").alias("ts2"))
    out = range_join_bucketed(
        left, right, by="user_id", left_ts="ts", right_ts="ts2", max_gap_seconds=300
    )
    return out.select("a_id", "b_id").orderBy("a_id", "b_id")


PERCENTILE_ORACLE = """
SELECT l_returnflag,
       FLOOR((quantile_cont(l_quantity, 0.25)) * 1e4 + 0.5) / 1e4 AS q25,
       FLOOR((quantile_cont(l_quantity, 0.50)) * 1e4 + 0.5) / 1e4 AS q50,
       FLOOR((quantile_cont(l_quantity, 0.75)) * 1e4 + 0.5) / 1e4 AS q75,
       FLOOR((quantile_cont(l_extendedprice, 0.90)) * 1e4 + 0.5) / 1e4 AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_percentiles_exact", oracle=PERCENTILE_ORACLE, tags=("agg", "percentile"))
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The approximate scale path is
    ``approx_percentile`` (t-digest) — different sketch, rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.floor(F.percentile("l_quantity", F.lit(0.25)) * 1e4 + 0.5) / 1e4).alias("q25"),
            (F.floor(F.percentile("l_quantity", F.lit(0.50)) * 1e4 + 0.5) / 1e4).alias("q50"),
            (F.floor(F.percentile("l_quantity", F.lit(0.75)) * 1e4 + 0.5) / 1e4).alias("q75"),
            (F.floor(F.percentile("l_extendedprice", F.lit(0.90)) * 1e4 + 0.5) / 1e4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register("agg_approx_percentile", oracle=None, tags=("agg", "percentile", "approx"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based scale path (rows-only)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("median_est"))
        .orderBy("l_returnflag")
    )


UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
ORDER BY p_partkey, metric
"""


@register("unpivot_part_metrics", oracle=UNPIVOT_ORACLE, tags=("reshape",))
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide columns to (key, metric, value) rows."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)      AS due_date,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)    AS month_start,
       CAST(quarter(o_orderdate) AS INTEGER)                  AS qtr,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(dayofyear(o_orderdate) AS INTEGER)                AS doy,
       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH           AS plus_3m,
       strftime(o_orderdate, '%Y-%m')                         AS ym
FROM orders
ORDER BY o_orderkey
"""


@register("scalar_date_arithmetic", oracle=DATE_ARITH_ORACLE, tags=("scalar", "time"))
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: offsets, truncation, quarter, last_day,
    day-of-year, add_months."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # all date-typed outputs are cast back to TIMESTAMP: date-vs-
    # timestamp representations hash differently across engines
    return (
        orders.select(
            "o_orderkey",
            F.date_add(d, 30).cast("timestamp").alias("due_date"),
            F.trunc(d, "month").cast("timestamp").alias("month_start"),
            F.quarter(d).alias("qtr"),
            F.last_day(d).cast("timestamp").alias("month_end"),
            F.dayofyear(d).alias("doy"),
            F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


REGEXP_ORACLE = r"""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_no,
       regexp_extract(p_name, '^(\w+)', 1)                        AS first_word,
       CAST(len(string_split(p_name, ' ')) AS INTEGER)            AS name_words
FROM part
ORDER BY p_partkey
"""


@register("scalar_regexp_extract", oracle=REGEXP_ORACLE, tags=("scalar", "text"))
def scalar_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extraction and splitting."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_no"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.size(F.split("p_name", " ")).alias("name_words"),
        )
        .orderBy("p_partkey")
    )


STRING_AGG_ORACLE = """
SELECT r.r_name,
       string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS nations,
       COUNT(DISTINCT n.n_nationkey) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("agg_ordered_string", oracle=STRING_AGG_ORACLE, tags=("agg",))
def agg_ordered_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_set → sort_array →
    array_join: deterministic regardless of partitioning)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.countDistinct("n_nationkey").alias("n_nations"),
        )
        .orderBy("r_name")
    )


COND_AGG_ORACLE = f"""
SELECT
  {dsum_sql('l_extendedprice * l_discount')}                    AS promo_revenue,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
  {davg_sql('CASE WHEN l_quantity > 25 THEN l_extendedprice END')}   AS avg_price_bulk
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@register("agg_conditional", oracle=COND_AGG_ORACLE, tags=("agg",))
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style filtered/conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("promo_revenue"),
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        davg(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))).alias("avg_price_bulk"),
    )


KEEP_LATEST_ORACLE = """
SELECT user_id, event_id, ts
FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@register("dedup_keep_latest", oracle=KEEP_LATEST_ORACLE, tags=("dedup", "window"))
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup (CDC compaction shape): newest row per key via
    row_number — the deterministic alternative to dropDuplicates."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


NTILE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(NTILE(4) OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INTEGER) AS price_quartile,
       ROUND(FIRST_VALUE(l_extendedprice) OVER w, 2) AS cheapest,
       ROUND(LAST_VALUE(l_extendedprice) OVER
             (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS priciest
FROM lineitem
WHERE l_orderkey < 300
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
ORDER BY l_orderkey, l_linenumber
"""


@register("window_ntile_first_last", oracle=NTILE_ORACLE, tags=("window",))
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / first_value / last_value with explicit frames."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 300)
    order = [F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = W.partitionBy("l_returnflag").orderBy(*order)
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.ntile(4).over(w).alias("price_quartile"),
            F.round(F.first("l_extendedprice").over(w), 2).alias("cheapest"),
            F.round(F.last("l_extendedprice").over(w_full), 2).alias("priciest"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
  FROM lineitem GROUP BY l_partkey
)
SELECT FLOOR((CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0) * 1e2 + 0.5) / 1e2 AS avg_yearly
FROM lineitem l
JOIN part_avg pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.qty_cut
"""


@register("subquery_correlated_avg", oracle=Q17_ORACLE, tags=("subquery", "agg", "tpch"))
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average as a filter —
    decorrelated into an aggregate + self-join (what Catalyst does to
    the subquery form anyway, written explicitly)."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg((F.floor(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0 * 1e2 + 0.5) / 1e2).alias("avg_yearly"))
    )


HISTOGRAM_ORACLE = f"""
SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bucket,
       COUNT(*) AS n,
       {davg_sql('l_extendedprice')} AS avg_price
FROM lineitem
GROUP BY 1
ORDER BY qty_bucket
"""


@register("agg_histogram_buckets", oracle=HISTOGRAM_ORACLE, tags=("agg",))
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width bucket histogram."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_quantity") / 10).alias("qty_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
        )
        .orderBy("qty_bucket")
    )


@register("scan_tablesample", oracle=None, tags=("scan", "sampling"))
def scan_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling (the reference's hardcoded 210-file
    cap, SURVEY §2.9 B5, done right: config-driven, engine-level).
    Sample membership is engine-specific → rows-only check; the
    value-verified form of the same operator is
    ``scan_sample_fraction`` (content-addressed, engine-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


SAMPLE_FRACTION_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), 1, 2) < '1a'
ORDER BY l_orderkey, l_linenumber
"""


@register("scan_sample_fraction", oracle=SAMPLE_FRACTION_ORACLE, tags=("scan", "sampling"))
def scan_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source truncation done right at scale (SURVEY §2.9 B5 / S8):
    ~10% Bernoulli-style sample whose membership is CONTENT-ADDRESSED
    (md5 bucket of the row's own key, operators/sampling.py), not
    RNG-seeded — so the sample is a pure function of the data,
    identical across engines, runs, partition layouts, and cluster
    sizes, and existing rows never enter/leave as the table grows.
    Map-only (a filter — no shuffle, scan-speed at 100 TB), unlike
    seeded TABLESAMPLE whose membership is layout-dependent (see
    scan_tablesample, rows-only for that reason)."""
    from data_lake_with_spark_spark.operators.sampling import stratified_fraction

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_rid", F.col("l_orderkey") * 8 + F.col("l_linenumber")
    )
    return (
        stratified_fraction(li, 0.1, "_rid")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register("vector_topk_ivf", oracle=None, tags=("vector", "llm", "approx", "topk"))
def vector_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (E3 scale path #2): KMeans coarse
    quantizer → inverted lists → n_probe nearest lists scanned per
    query. The list id is the partition key of the physical layout at
    scale. Approximate → rows-only; pytest tracks recall."""
    from data_lake_with_spark_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = kmeans_centroids(emb, k=16)
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, centroids, k=5, n_probe=4).orderBy("query_id", "rank")

ROLLING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS spend_30d
FROM orders
WHERE o_custkey <= 20
ORDER BY o_custkey, o_orderkey
"""


@register("window_rolling_30day", oracle=ROLLING_ORACLE, tags=("window", "time"))
def window_rolling_30day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling frame: 30-day trailing spend per customer via
    RANGE BETWEEN over epoch seconds (value-range, not row-count,
    frames)."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w), 2)
            .cast("double")
            .alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


CORR_ORACLE = """
SELECT l_returnflag,
       FLOOR((
         (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE))
         / SQRT(
             (COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
              - POW(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2))
             * (COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                - POW(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2))
           ) * 1e6 + 0.5)) / 1e6 AS qty_price_corr,
       FLOOR((quantile_cont(l_quantity, 0.5)) * 1e4 + 0.5) / 1e4 AS median_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_corr_median", oracle=CORR_ORACLE, tags=("agg", "stats"))
def agg_corr_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from decimal-exact moment sums (the builtin
    corr() is order-dependent in its last ulps → built from the
    5-moment formula so both engines compute identical doubles) +
    exact median."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agged = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(q * p)).cast("double").alias("sxy"),
        F.sum(dec(q)).cast("double").alias("sx"),
        F.sum(dec(p)).cast("double").alias("sy"),
        F.sum(dec(q * q)).cast("double").alias("sxx"),
        F.sum(dec(p * p)).cast("double").alias("syy"),
        F.percentile("l_quantity", F.lit(0.5)).alias("med"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") ** 2)
        * (F.col("n") * F.col("syy") - F.col("sy") ** 2)
    )
    return (
        agged.select(
            "l_returnflag",
            (F.floor(corr * 1e6 + 0.5) / 1e6).alias("qty_price_corr"),
            (F.floor(F.col("med") * 1e4 + 0.5) / 1e4).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


SUBQ_IN_ORACLE = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_nationkey IN (SELECT s_nationkey FROM supplier)
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("subquery_in_nations", oracle=SUBQ_IN_ORACLE, tags=("subquery", "join"))
def subquery_in_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) shape: customers whose nation hosts at least one
    supplier — planned as a left-semi join on the subquery keys (the
    set-membership join, no row duplication however many suppliers a
    nation has)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("c_nationkey")
    )
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(supp, "c_nationkey", "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


SUBQ_NOT_IN_ORACLE = """
SELECT n.n_name
FROM nation n
WHERE n.n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900)
ORDER BY n.n_name
"""


@register("subquery_not_in_nations", oracle=SUBQ_NOT_IN_ORACLE, tags=("subquery", "join"))
def subquery_not_in_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) shape: nations with no high-balance customer
    — a left-anti join on the subquery keys. Valid AS an anti join
    because the subquery column is a non-null key (SQL NOT IN returns
    empty the moment the subquery yields a NULL; on nullable columns
    the anti-join rewrite needs the extra IS NOT NULL guard both
    engines would push)."""
    nation = _t(spark, sf_dir, "nation")
    rich_nations = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("n_nationkey"))
    )
    return (
        nation.join(rich_nations, "n_nationkey", "left_anti")
        .select("n_name")
        .orderBy("n_name")
    )


CUME_NTH_ORACLE = """
SELECT c_custkey,
       n.n_name,
       FLOOR(CUME_DIST() OVER w * 1e6 + 0.5) / 1e6 AS bal_cume,
       NTH_VALUE(c_custkey, 2) OVER (PARTITION BY n.n_name
                                     ORDER BY c.c_acctbal DESC, c.c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_richest
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey <= 500
WINDOW w AS (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey)
ORDER BY n_name, bal_cume, c_custkey
"""


@register("window_cume_nth", oracle=CUME_NTH_ORACLE, tags=("window",))
def window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value in one windowed pass — the two rank-family
    members the rank/dense/percent query doesn't exercise. nth_value
    needs the full-partition frame (default frame stops at CURRENT
    ROW, which would leave the first row's nth NULL)."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    nation = _t(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        joined.select(
            "c_custkey",
            "n_name",
            (F.floor(F.cume_dist().over(w) * 1e6 + 0.5) / 1e6).alias("bal_cume"),
            F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
        )
        .orderBy("n_name", "bal_cume", "c_custkey")
    )


BUCKETED_COLOCATED_ORACLE = f"""
SELECT
  o.o_orderkey,
  CAST(o.o_totalprice AS DOUBLE)        AS o_totalprice,
  COUNT(*)                              AS n_lines,
  {dsum_sql('l.l_quantity')}            AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey <= 20000
GROUP BY o.o_orderkey, o.o_totalprice
"""


@register(
    "join_bucketed_colocated",
    oracle=BUCKETED_COLOCATED_ORACLE,
    tags=("join", "layout", "bucketed"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join + per-key aggregate over BUCKETED layouts with
    zero exchanges end-to-end (plan-asserted in tests/test_bucketed.py):
    both sides are written ``bucketBy(8, o_orderkey)`` + sorted, so the
    SortMergeJoin reads co-located pre-sorted buckets and the
    follow-on groupBy on the same key rides the same layout. This is
    the write-once/join-forever contract that turns the nightly 100 TB
    fact join from the dominant shuffle into a local merge — the
    layout the reference's full-rewrite loads (etl.py:120-128) would
    need at scale. Results are pinned to the plain shuffled join via
    the oracle."""
    from data_lake_with_spark_spark.sources.bucketed import bucketed_join, write_bucketed

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 20000)
        .select("o_orderkey", "o_totalprice")
    )
    lineitem = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 20000)
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    write_bucketed(orders, "dlws_bjoin_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "dlws_bjoin_lineitem", ["o_orderkey"], 8, ["o_orderkey"])
    joined = bucketed_join(
        spark, "dlws_bjoin_orders", "dlws_bjoin_lineitem", ["o_orderkey"]
    )
    return joined.groupBy("o_orderkey", "o_totalprice").agg(
        F.count("*").alias("n_lines"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


RANGE_OUTER_ORACLE = """
SELECT e1.event_id AS a_id, e2.event_id AS b_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') e1
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL '5 minutes'
ORDER BY a_id, b_id
"""


@register("join_range_outer_5min", oracle=RANGE_OUTER_ORACLE, tags=("join", "range"))
def join_range_outer_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER band join (the batch twin of the streaming outer
    interval join): every signup emits — purchases by the same user
    within 5 minutes when they exist, one null row when none do.
    Bucketized: inner pairs via the 2-probe equi-join ∪ anti-joined
    unmatched signups (operators/joins.py:range_join_bucketed_outer);
    never a theta join."""
    from data_lake_with_spark_spark.operators.joins import range_join_bucketed_outer

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    left = (
        ev.where(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("a_id"), "user_id", "ts")
    )
    right = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("b_id"), "user_id", F.col("ts").alias("ts2"))
    )
    out = range_join_bucketed_outer(
        left, right, by="user_id", left_ts="ts", right_ts="ts2", max_gap_seconds=300
    )
    return out.select("a_id", "b_id").orderBy("a_id", "b_id")


SCD2_ORACLE = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       o_orderpriority AS priority,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL
         AS is_current
FROM orders
ORDER BY custkey, valid_from, orderkey
"""


@register(
    "scd2_priority_intervals",
    oracle=SCD2_ORACLE,
    tags=("cdc", "window"),
)
def scd2_priority_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension derivation from history: each customer's order
    stream becomes validity intervals [valid_from, valid_to) with the
    open current row flagged — the slowly-changing-dimension build
    every warehouse does before point-in-time joins (operators/cdc.py
    holds the incremental apply; this is the from-scratch backfill).
    One window shuffle keyed on the dimension key."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("custkey", "valid_from", "orderkey")


COVISIT_ORACLE = """
WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
)
SELECT a.user_id AS u1, b.user_id AS u2,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY u1, u2
"""


@register(
    "graph_covisitation_pairs",
    oracle=COVISIT_ORACLE,
    tags=("graph", "events", "join"),
)
def graph_covisitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-visitation graph: user pairs active in the same 5-minute
    window at least 3 times — the session-affinity edge list behind
    co-occurrence recommenders and bot-ring detection. The (window,
    user) distinct collapses raw events first; the self-join is keyed
    on the window id, so pair work is Σ users_per_window², bounded by
    window occupancy, never corpus-quadratic."""
    ev = _t(spark, sf_dir, "events")
    w = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
            "user_id",
        )
        .distinct()
    )
    a = w.select("win", F.col("user_id").alias("u1"))
    b = w.select("win", F.col("user_id").alias("u2"))
    return (
        a.join(b, "win")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_windows"))
        .where(F.col("n_windows") >= 3)
        .orderBy("u1", "u2")
    )


RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey AS custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT custkey, last_order, frequency, monetary,
         NTILE(5) OVER (ORDER BY last_order DESC, custkey) AS r,
         NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS f,
         NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS m
  FROM base
)
SELECT CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
       CAST(m AS INTEGER) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(custkey) AS BIGINT) AS example_custkey
FROM scored GROUP BY r, f, m
ORDER BY r, f, m
"""


@register("segment_rfm_customers", oracle=RFM_ORACLE, tags=("analytics", "window", "agg"))
def segment_rfm_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency/frequency/monetary from
    the orders history, each scored into quintiles (ntile, customer-id
    tie-break for a total order), rolled up to segment cells — the
    classic CRM cube. The ntile windows run over the per-customer
    AGGREGATE (|customers| rows, not |orders|); at larger scale swap
    ntile's single-ordering for percent_rank bucketing over a
    range-partitioned sort. Decimal-exact monetary sums."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("o_totalprice")).alias("monetary"),
    )
    scored = (
        base.withColumn(
            "r",
            F.ntile(5).over(
                W.orderBy(F.desc("last_order"), F.asc("custkey"))
            ),
        )
        .withColumn(
            "f",
            F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("custkey"))),
        )
        .withColumn(
            "m",
            F.ntile(5).over(W.orderBy(F.desc("monetary"), F.asc("custkey"))),
        )
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("custkey").cast("bigint").alias("example_custkey"),
        )
        .orderBy("r", "f", "m")
    )


ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS partkey,
         CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS total FROM rev
), run AS (
  SELECT partkey, revenue,
         CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER (
           ORDER BY revenue DESC, partkey) AS DOUBLE) AS cum
  FROM rev
)
SELECT CASE WHEN cum / t.total <= 0.8 THEN 'A'
            WHEN cum / t.total <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS class_revenue
FROM run CROSS JOIN tot t
GROUP BY 1 ORDER BY abc_class
"""


@register("segment_abc_pareto", oracle=ABC_ORACLE, tags=("analytics", "window", "agg"))
def segment_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification: parts ranked by revenue, classified
    A/B/C at 80%/95% of cumulative share — the inventory-analysis
    staple. Exactness discipline: per-part revenue is decimal-rounded
    FIRST, the running total is a decimal-exact window over those
    rounded values (ties broken by partkey), and only the final share
    comparison touches doubles — identical classification on any
    engine. Windows run over the per-part aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    tot = rev.agg(
        F.sum(F.col("revenue").cast("decimal(18,6)"))
        .cast("double")
        .alias("total")
    )
    w = W.orderBy(F.desc("revenue"), F.asc("partkey"))
    run = rev.withColumn(
        "cum",
        F.sum(F.col("revenue").cast("decimal(18,6)")).over(w).cast("double"),
    )
    cls = (
        F.when(F.col("cum") / F.col("total") <= 0.8, "A")
        .when(F.col("cum") / F.col("total") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "revenue")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum(F.col("revenue").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register("join_asof_cogroup", oracle=ASOF_ORACLE, tags=("join", "asof", "arrow"))
def join_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as join_asof_last_purchase, computed
    through the two-sided Arrow seam instead: groupBy().cogroup().
    applyInPandas with pd.merge_asof per user — the escape hatch for
    per-key logic window tricks can't express, here pinned to the
    identical oracle as the JVM form so the seam itself is
    value-verified. operators/grouped.py:cogroup_asof."""
    from data_lake_with_spark_spark.operators.grouped import cogroup_asof

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = cogroup_asof(
        clicks,
        purchases,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        suffix="_p",
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_ms("ts").alias("ts_ms"),
        epoch_ms("ts_p").alias("purchase_ts_ms"),
        F.col("value_p").alias("purchase_value"),
    ).orderBy("event_id")


TRIANGLES_ORACLE = """
WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
), edges AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
), oriented AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
), tri AS (
  SELECT COUNT(*) AS n_tri FROM (
    SELECT e1.s AS a, e1.t AS b, e2.t AS c
    FROM oriented e1 JOIN oriented e2 ON e1.t = e2.s
  ) wedge
  JOIN oriented e3 ON wedge.a = e3.s AND wedge.c = e3.t
), stats AS (
  SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
         (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
         (SELECT n_tri FROM tri) AS n_triangles
)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       FLOOR(3.0 * n_triangles / n_wedges * 1e6 + 0.5) / 1e6
         AS clustering_coeff
FROM stats
"""


@register(
    "graph_triangle_count",
    oracle=TRIANGLES_ORACLE,
    tags=("graph", "events", "join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-visitation graph with DEGREE-ORDERED
    edge orientation (Schank–Wagner): every edge points from its
    lower-(degree, id) endpoint, wedges join oriented edges on the
    middle node, and the closing edge is verified with one more
    equi-join — each triangle counted exactly once, and the wedge
    join's fan-out is bounded by out-degrees that the orientation
    caps at O(√m), not by raw hub degrees. Global clustering
    coefficient = 3·triangles / Σ C(deg,2), integer inputs, one
    rounded division.

    Eager-evaluation note: the census runs three bounded driver
    actions (two counts + one 1-row wedge sum) at CONSTRUCTION time —
    building this plan executes the full census and the returned
    DataFrame is a 1-row literal. This is a deliberate deviation from
    the registry's lazy norm: the three scalars feed each other and a
    literal result frame, the same shape as the k-means/PQ driver-side
    codebook collections. An empty edge set yields 0/0/0 with a null
    clustering coefficient."""
    ev = _t(spark, sf_dir, "events")
    win = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
            "user_id",
        )
        .distinct()
    )
    a = win.select("win", F.col("user_id").alias("u"))
    b = win.select("win", F.col("user_id").alias("v"))
    edges = (
        a.join(b, "win")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") >= 3)
        .select("u", "v")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    # the covisitation self-join feeds three actions — materialize it
    # once (measured 4.7s → ~2s at sf0.1 without the cache)
    oriented = oriented.persist()
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    wedge = e1.join(e2, "b").select("a", "c")
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    n_tri = wedge.join(closing, ["a", "c"], "inner").count()
    n_edges = oriented.count()
    n_wedges = oriented.select(F.col("s").alias("node")).unionAll(
        oriented.select(F.col("t").alias("node"))
    ).groupBy("node").agg(F.count(F.lit(1)).alias("d")).agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")).alias("w")
    ).first()["w"]
    oriented.unpersist()
    spark2 = ev.sparkSession
    # empty edge set: the wedge sum aggregates zero rows → null
    row = [(int(n_edges), int(n_wedges or 0), int(n_tri))]
    out = spark2.createDataFrame(
        row, "n_edges bigint, n_wedges bigint, n_triangles bigint"
    )
    return out.select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.floor(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges") * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        ).alias("clustering_coeff"),
    )


LINKPRED_ORACLE = """
WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
), edges AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), sym AS (
  SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges
), deg AS (
  SELECT a AS node, COUNT(*) AS d FROM sym GROUP BY a
), common AS (
  SELECT e1.a AS a, e2.b AS c, COUNT(*) AS n_common
  FROM sym e1 JOIN sym e2 ON e1.b = e2.a
  WHERE e1.a < e2.b
  GROUP BY 1, 2
), cand AS (
  SELECT cm.a, cm.c, cm.n_common
  FROM common cm LEFT JOIN edges e ON cm.a = e.u AND cm.c = e.v
  WHERE e.u IS NULL
)
SELECT a, c, CAST(n_common AS BIGINT) AS n_common,
       FLOOR(n_common * 1.0 / (da.d + dc.d - n_common) * 1e6 + 0.5) / 1e6
         AS jaccard
FROM cand JOIN deg da ON a = da.node JOIN deg dc ON c = dc.node
ORDER BY jaccard DESC, n_common DESC, a ASC, c ASC
LIMIT 20
"""


@register(
    "graph_link_prediction",
    oracle=LINKPRED_ORACLE,
    tags=("graph", "events", "join", "topk"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-visitation graph: the
    top 20 NON-edges ranked by neighborhood Jaccard — the
    collaborative-filtering / friend-suggestion primitive. Candidate
    pairs come from the wedge join (Σdeg² work, same discipline as the
    triangle census — never all-pairs), existing edges drop out with a
    left-anti join, and the score is one exact-integer ratio rounded
    once. Distributed top-k via TakeOrdered.

    The edge list and its symmetrized form feed five join branches;
    lazy ``shared`` caches keep the co-visitation generator from
    re-running per branch (was 18 effective FileScans — round-8 scan
    audit)."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    ev = _t(spark, sf_dir, "events")
    win = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
            "user_id",
        )
        .distinct()
    )
    # Probe side widened, build side broadcast-PINNED (round-14
    # widening + round-15 ADVICE fix): the distinct output is under
    # AQE's coalesce floor, so the co-visitation self-join — whose
    # output is ~50x its input — otherwise explodes its pairs in one
    # task (the lsh_near_pairs pattern; measured 1.34s -> 1.01s at
    # sf0.1, identical edges). The key-less round-robin widening only
    # pays when the other side BROADCASTS — against a shuffle join on
    # ``win`` it would be a wasted extra exchange — so the broadcast is
    # hinted explicitly (no longer estimate-dependent), gated on the
    # events scan estimate: past the bound both sides shuffle on win
    # and the widening repartition is dropped — the 100 TB path.
    aa = win.select("win", F.col("user_id").alias("u"))
    bb = win.select("win", F.col("user_id").alias("v"))
    if _plan_size_bytes(ev) <= COVIS_BROADCAST_MAX_INPUT_BYTES:
        aa = aa.repartition(spark.sparkContext.defaultParallelism)
        bb = F.broadcast(bb)
    edges = (
        aa.join(bb, "win")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") >= 3)
        .select("u", "v")
    )
    edges = shared(edges)
    sym = shared(
        edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
            edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
    )
    deg = shared(
        sym.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = sym
    e2 = sym.select(F.col("a").alias("b"), F.col("b").alias("c"))
    common = (
        e1.join(e2, "b")
        .where(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = common.join(
        edges.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("c"), F.col("d").alias("dc")), "c")
        .select(
            "a",
            "c",
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.floor(
                    F.col("n_common")
                    * F.lit(1.0)
                    / (F.col("da") + F.col("dc") - F.col("n_common"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard"), F.desc("n_common"), F.asc("a"), F.asc("c")
    ).limit(20)


LOCAL_CLUSTERING_ORACLE = """
WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
), edges AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
), oriented AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
), tris AS (
  SELECT wedge.a, wedge.b, wedge.c
  FROM (
    SELECT e1.s AS a, e1.t AS b, e2.t AS c
    FROM oriented e1 JOIN oriented e2 ON e1.t = e2.s
  ) wedge
  JOIN oriented e3 ON wedge.a = e3.s AND wedge.c = e3.t
), per_node AS (
  SELECT node, COUNT(*) AS n_tri FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
  ) GROUP BY node
)
SELECT d.node AS user_id,
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.d >= 2
            THEN FLOOR(COALESCE(p.n_tri, 0) * 2.0 / (d.d * (d.d - 1))
                       * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS local_coeff
FROM deg d LEFT JOIN per_node p ON d.node = p.node
ORDER BY user_id
"""


@register(
    "graph_local_clustering",
    oracle=LOCAL_CLUSTERING_ORACLE,
    tags=("graph", "events", "join"),
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient: each degree-ordered
    triangle credits its three corners, coefficient = 2·tri/(d·(d−1))
    — the per-user cohesion feature behind bot-ring and community
    scoring. Same Schank–Wagner wedge discipline as the global census
    (graph_triangle_count); the per-node rollup is one explode of the
    triangle corner triples + a hash agg.

    The co-visitation edge list, its degree table, and the oriented
    edges are each referenced from several join branches; without a
    lazy ``shared`` cache the plan re-derives the generator per
    reference (measured: 94 effective FileScans — the round-8 scan
    audit's worst row). Cached, scans collapse to table arity."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    ev = _t(spark, sf_dir, "events")
    win = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
            "user_id",
        )
        .distinct()
    )
    # Probe side widened, build side broadcast-PINNED (round-14
    # widening + round-15 ADVICE fix): the distinct output is under
    # AQE's coalesce floor, so the co-visitation self-join — whose
    # output is ~50x its input — otherwise explodes its pairs in one
    # task (the lsh_near_pairs pattern; measured 1.34s -> 1.01s at
    # sf0.1, identical edges). The key-less round-robin widening only
    # pays when the other side BROADCASTS — against a shuffle join on
    # ``win`` it would be a wasted extra exchange — so the broadcast is
    # hinted explicitly (no longer estimate-dependent), gated on the
    # events scan estimate: past the bound both sides shuffle on win
    # and the widening repartition is dropped — the 100 TB path.
    aa = win.select("win", F.col("user_id").alias("u"))
    bb = win.select("win", F.col("user_id").alias("v"))
    if _plan_size_bytes(ev) <= COVIS_BROADCAST_MAX_INPUT_BYTES:
        aa = aa.repartition(spark.sparkContext.defaultParallelism)
        bb = F.broadcast(bb)
    edges = (
        aa.join(bb, "win")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") >= 3)
        .select("u", "v")
    )
    edges = shared(edges)
    deg = shared(
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = shared(
        e.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    wedge = e1.join(e2, "b").select("a", "b", "c")
    closing = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tris = wedge.join(closing, ["a", "c"], "inner")
    # ONE evaluation of the triangle join via explode, NOT a 3-way
    # union of corner projections (round-15 optimization, guide
    # §2.4/§7.2 — the undirected_edges lesson): the three union
    # branches are distinct canonical plans, so the wedge⋈closing
    # join re-ran per corner (phase-measured +1.3s of the query's
    # 3.5s at sf0.1). Explode emits the same corner multiset in one
    # pass; the consumer aggregates, so row order is immaterial.
    per_node = (
        tris.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    coeff = F.when(
        F.col("d") >= 2,
        F.floor(
            F.coalesce(F.col("n_tri"), F.lit(0))
            * F.lit(2.0)
            / (F.col("d") * (F.col("d") - 1))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6,
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("n_triangles"),
            coeff.alias("local_coeff"),
        )
        .orderBy("user_id")
    )


BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT okey) AS n_orders FROM items
), freq AS (
  SELECT part, COUNT(*) AS n FROM items GROUP BY part
), pairs AS (
  SELECT a.part AS p1, b.part AS p2, COUNT(*) AS n_both
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2
)
SELECT p1, p2, CAST(n_both AS BIGINT) AS n_both,
       FLOOR(n_both * n.n_orders * 1.0 / (f1.n * f2.n) * 1e6 + 0.5) / 1e6
         AS lift
FROM pairs JOIN freq f1 ON p1 = f1.part JOIN freq f2 ON p2 = f2.part
CROSS JOIN n
WHERE n_both >= 2
ORDER BY lift DESC, n_both DESC, p1 ASC, p2 ASC
LIMIT 25
"""


@register(
    "basket_part_affinity",
    oracle=BASKET_ORACLE,
    tags=("analytics", "join", "topk"),
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top co-purchased part pairs by lift
    (support_both·N / support₁·support₂ — association-rule mining's
    rational core, log-free like text_cooccurrence_lift). The pair
    join is keyed on the ORDER key, so pair work is Σ basket_size² —
    bounded by basket width (≤7 lineitems), never catalog-quadratic;
    marginals broadcast; distributed top-k."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n = items.agg(F.countDistinct("okey").alias("n_orders"))
    freq = items.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
    a = items.select("okey", F.col("part").alias("p1"))
    b = items.select("okey", F.col("part").alias("p2"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 2)
    )
    lift = (
        F.col("n_both") * F.col("n_orders") * F.lit(1.0)
        / (F.col("f1n") * F.col("f2n"))
    )
    return (
        pairs.join(
            F.broadcast(freq.select(F.col("part").alias("p1"), F.col("n").alias("f1n"))),
            "p1",
        )
        .join(
            F.broadcast(freq.select(F.col("part").alias("p2"), F.col("n").alias("f2n"))),
            "p2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            F.col("n_both").cast("bigint").alias("n_both"),
            (F.floor(lift * 1e6 + F.lit(0.5)) / 1e6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.desc("n_both"), F.asc("p1"), F.asc("p2"))
        .limit(25)
    )


@register("segment_abc_distributed", oracle=ABC_ORACLE, tags=("analytics", "window", "agg"))
def segment_abc_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """segment_abc_pareto's SCALE twin, pinned to the IDENTICAL
    oracle: the global revenue-ordered running total is computed as a
    two-level prefix sum — per-part rows partition into revenue BANDS
    (floor(revenue/100), descending), each band cumsums in parallel
    ordered by (revenue desc, partkey), and the tiny band-total frame
    (one row per band) supplies the broadcast carry-in. Decimal sums
    are associative, so the reassembled cum equals the single-window
    form bit-for-bit; the only single-partition work is the band-count
    frame. The interval-sweep carry trick applied to ranking."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    ).withColumn("band", F.floor(F.col("revenue") / 100.0).cast("bigint"))
    tot = rev.agg(
        F.sum(F.col("revenue").cast("decimal(18,6)")).cast("double").alias("total")
    )
    band_tot = rev.groupBy("band").agg(
        F.sum(F.col("revenue").cast("decimal(18,6)")).alias("band_sum")
    )
    w_bands = (
        W.orderBy(F.desc("band")).rowsBetween(W.unboundedPreceding, -1)
    )
    carry = band_tot.withColumn(
        "carry_in",
        F.coalesce(
            F.sum("band_sum").over(w_bands), F.lit(0).cast("decimal(18,6)")
        ),
    ).select("band", "carry_in")
    w_in = W.partitionBy("band").orderBy(F.desc("revenue"), F.asc("partkey"))
    run = (
        rev.join(F.broadcast(carry), "band")
        .withColumn(
            "cum",
            (
                F.col("carry_in")
                + F.sum(F.col("revenue").cast("decimal(18,6)")).over(w_in)
            ).cast("double"),
        )
    )
    cls = (
        F.when(F.col("cum") / F.col("total") <= 0.8, "A")
        .when(F.col("cum") / F.col("total") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .select(cls.alias("abc_class"), "revenue")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum(F.col("revenue").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


def _two_level_ntile(base, metric, band_expr, n_col, out, n_tiles=5):
    """Global NTILE without a global sort: rank = (carry count of rows
    in strictly-earlier bands, cumulated over the tiny band frame) +
    within-band row_number, then the exact NTILE bucket reconstructed
    from (rank, N) — first N%n buckets take ceil(N/n) rows. Ordering
    is (metric DESC, custkey ASC) throughout, matching NTILE's window.
    Requires N ≥ n_tiles (size_small ≥ 1)."""
    b = base.withColumn("_band", band_expr)
    band_cnt = b.groupBy("_band").agg(F.count(F.lit(1)).alias("_bn"))
    w_bands = W.orderBy(F.desc("_band")).rowsBetween(W.unboundedPreceding, -1)
    carry = band_cnt.withColumn(
        "_carry", F.coalesce(F.sum("_bn").over(w_bands), F.lit(0))
    ).select("_band", "_carry")
    w_in = W.partitionBy("_band").orderBy(F.desc(metric), F.asc("custkey"))
    ranked = (
        b.join(F.broadcast(carry), "_band")
        .withColumn("_rank", F.col("_carry") + F.row_number().over(w_in))
    )
    n = F.col(n_col)
    size_small = F.expr(f"{n_col} div {n_tiles}")
    n_big = n % n_tiles
    size_big = size_small + 1
    cutoff = n_big * size_big
    bucket = F.when(
        F.col("_rank") <= cutoff,
        ((F.col("_rank") - 1) / size_big).cast("int") + 1,
    ).otherwise(
        (n_big + (F.col("_rank") - cutoff - 1) / size_small).cast("int") + 1
    )
    return ranked.withColumn(out, bucket).drop("_band", "_carry", "_rank")


@register("segment_rfm_distributed", oracle=RFM_ORACLE, tags=("analytics", "window", "agg"))
def segment_rfm_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """segment_rfm_customers' SCALE twin, pinned to the IDENTICAL
    oracle: each quintile is a two-level rank — per-metric value bands
    cumsum their COUNTS over a tiny band frame (broadcast carry),
    within-band row_numbers run hash-partitioned, and the exact NTILE
    bucket is reconstructed arithmetically from (global rank, N). No
    metric ever sorts in a single task; the per-customer aggregate
    shuffles three times (once per metric band key).

    The per-customer aggregate is a tracked shared() cache: each
    two-level ntile references it twice (band counts + ranked join)
    and three ntiles chain, so the uncached plan re-derived the
    orders scan 8× (round-10 scan audit); the n_total count below
    doubles as the cache materialization."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    o = _t(spark, sf_dir, "orders")
    base = shared(
        o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice")).alias("monetary"),
        )
    )
    n_total = base.count()
    base = base.withColumn("_n", F.lit(int(n_total)))
    base = _two_level_ntile(
        base, "last_order",
        F.datediff(F.col("last_order"), F.lit("1970-01-01").cast("date")),
        "_n", "r",
    )
    base = _two_level_ntile(base, "frequency", F.col("frequency"), "_n", "f")
    base = _two_level_ntile(
        base, "monetary", F.floor(F.col("monetary") / 100.0).cast("bigint"),
        "_n", "m",
    )
    return (
        base.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("custkey").cast("bigint").alias("example_custkey"),
        )
        .orderBy("r", "f", "m")
    )


HINT_ORACLE = """
SELECT o.o_orderstatus,
       {rev} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""".format(rev=dsum_sql("l_extendedprice * (1 - l_discount)", 2))


@register("join_hint_shuffle_hash", oracle=HINT_ORACLE, tags=("join", "hint"))
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control: the fact join forced to a
    SHUFFLED HASH join via hint("shuffle_hash") — the strategy to pick
    over sort-merge when the build side fits a task's memory but is
    past the broadcast threshold (skips both sort passes). Results are
    strategy-invariant (the oracle is the plain join); the plan assert
    in test_plan_quality pins that the hint actually took effect —
    hints are requests, and a silently ignored one is a perf bug."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = li.join(orders.hint("shuffle_hash"), "l_orderkey")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderstatus")
    )


TRY_FUNCS_ORACLE = """
SELECT event_id,
       TRY_CAST(props AS BIGINT) AS props_as_int,
       CASE WHEN CAST(value AS INTEGER) - CAST(value AS INTEGER) = 0
            THEN NULL
            ELSE value / (CAST(value AS INTEGER) - CAST(value AS INTEGER))
       END AS div_by_zero,
       TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_value
FROM events
WHERE event_id < 200
ORDER BY event_id
"""


@register(
    "scalar_try_functions",
    oracle=TRY_FUNCS_ORACLE,
    tags=("scalar", "ansi"),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-handling surface: Spark 4 runs ANSI by default,
    so invalid casts and zero divisions THROW unless routed through
    try_cast / try_divide — the functions a pipeline must use for
    dirty-data tolerance (malformed JSON-ish strings, zero
    denominators) without disabling ANSI globally. try_cast on the
    raw props JSON yields null (not an exception), try_divide by an
    engineered zero yields null, and the digit-extracted k parses.
    Map-only."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    zero = F.col("value").cast("int") - F.col("value").cast("int")
    return ev.select(
        "event_id",
        F.expr("try_cast(props AS BIGINT)").alias("props_as_int"),
        F.try_divide(F.col("value"), zero).alias("div_by_zero"),
        F.expr(
            "try_cast(regexp_extract(props, '[0-9]+', 0) AS BIGINT)"
        ).alias("k_value"),
    ).orderBy("event_id")


LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey AS custkey, MIN(year(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
), rev AS (
  SELECT o.o_custkey AS custkey, year(o.o_orderdate) AS yr,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS r
  FROM orders o GROUP BY 1, 2
), cell AS (
  SELECT f.cohort, r.yr - f.cohort AS offset_yr,
         COUNT(DISTINCT r.custkey) AS n_active,
         SUM(r.r) AS rev
  FROM rev r JOIN firsts f ON r.custkey = f.custkey
  GROUP BY 1, 2
)
SELECT CAST(cohort AS INTEGER) AS cohort,
       CAST(offset_yr AS INTEGER) AS offset_yr,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(ROUND(SUM(rev) OVER (PARTITION BY cohort ORDER BY offset_yr), 2)
            AS DOUBLE) AS cum_revenue
FROM cell
ORDER BY cohort, offset_yr
"""


@register(
    "cohort_ltv_yearly",
    oracle=LTV_ORACLE,
    tags=("analytics", "window", "agg"),
)
def cohort_ltv_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value triangle: customers cohorted by first-order
    year, cumulative revenue by year offset — the LTV curve every
    subscription/commerce warehouse maintains (the relational sibling
    of the events-based weekly retention cohort). Decimal-exact
    revenue, cumulated per cohort over the tiny (cohort × offset)
    cell table."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.year("o_orderdate")).alias("cohort")
    )
    rev = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("r"))
    cell = (
        rev.join(firsts, "custkey")
        .groupBy(
            "cohort", (F.col("yr") - F.col("cohort")).alias("offset_yr")
        )
        .agg(
            F.countDistinct("custkey").alias("n_active"),
            F.sum("r").alias("rev"),
        )
    )
    w = W.partitionBy("cohort").orderBy("offset_yr")
    return (
        cell.select(
            F.col("cohort").cast("int").alias("cohort"),
            F.col("offset_yr").cast("int").alias("offset_yr"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.round(F.sum("rev").over(w), 2).cast("double").alias("cum_revenue"),
        )
        .orderBy("cohort", "offset_yr")
    )


GROWTH_ORACLE = """
WITH yearly AS (
  SELECT l_partkey AS partkey, year(l_shipdate) AS yr,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
  FROM lineitem GROUP BY 1, 2
), paired AS (
  SELECT a.partkey,
         CAST(a.yr AS INTEGER) AS yr,
         CAST(ROUND(a.r, 2) AS DOUBLE) AS revenue,
         CAST(ROUND(b.r, 2) AS DOUBLE) AS prev_revenue
  FROM yearly a JOIN yearly b
    ON a.partkey = b.partkey AND a.yr = b.yr + 1
)
SELECT partkey, yr, revenue, prev_revenue,
       FLOOR(revenue / prev_revenue * 1e6 + 0.5) / 1e6 AS growth
FROM paired
ORDER BY growth DESC, partkey ASC, yr ASC
LIMIT 25
"""


@register(
    "growth_top_parts_yoy",
    oracle=GROWTH_ORACLE,
    tags=("analytics", "join", "topk"),
)
def growth_top_parts_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth leaders: parts ranked by revenue ratio vs
    the prior year (self-join of the yearly aggregate on yr = yr+1 —
    the aggregate, never the fact, pairs with itself). Decimal-rounded
    revenues before the one ratio division; distributed top-k."""
    li = _t(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.year("l_shipdate").alias("yr"),
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("r")
    )
    a = yearly.select(
        "partkey",
        F.col("yr").cast("int").alias("yr"),
        F.round("r", 2).cast("double").alias("revenue"),
    )
    b = yearly.select(
        "partkey",
        (F.col("yr") + 1).cast("int").alias("yr"),
        F.round("r", 2).cast("double").alias("prev_revenue"),
    )
    return (
        a.join(b, ["partkey", "yr"])
        .select(
            "partkey",
            "yr",
            "revenue",
            "prev_revenue",
            (
                F.floor(
                    F.col("revenue") / F.col("prev_revenue") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("growth"),
        )
        .orderBy(F.desc("growth"), F.asc("partkey"), F.asc("yr"))
        .limit(25)
    )


MERGE_HINT_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("join_hint_merge", oracle=MERGE_HINT_ORACLE, tags=("join", "hint"))
def join_hint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control, sort-merge flavor: the fact
    join forced to SORT-MERGE via hint("merge") — the strategy for
    two LARGE sides where neither hash table fits task memory (both
    sides sort-spill gracefully; with bucketed+sorted layouts the
    sorts disappear entirely, see join_bucketed_colocated). Completes
    the strategy-hint matrix next to hint("shuffle_hash") and the
    broadcast() calls everywhere else; results are strategy-invariant
    (plain-join oracle) and the plan assert pins that the hint took
    effect."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = li.join(orders.hint("merge"), "l_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


def _bfs_oracle(n_hops: int = 3) -> str:
    """Unrolled bounded-BFS twin: n_hops Bellman-Ford relaxations over
    the covisitation graph from its smallest node id — the third
    unrolled-iterative oracle family (PageRank, LPA, now BFS)."""
    head = """WITH w AS (
  SELECT DISTINCT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS win, user_id
  FROM events
), pairs AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
), ed AS (
  SELECT u AS src, v AS dst FROM pairs UNION ALL SELECT v, u FROM pairs
), d0 AS (
  SELECT MIN(src) AS id, 0 AS hops FROM ed
)"""
    ctes = [head]
    for k in range(1, n_hops + 1):
        ctes.append(
            f""", d{k} AS (
  SELECT id, MIN(hops) AS hops FROM (
    SELECT id, hops FROM d{k - 1}
    UNION ALL
    SELECT ed.dst AS id, d{k - 1}.hops + 1 AS hops
    FROM ed JOIN d{k - 1} ON ed.src = d{k - 1}.id
  ) GROUP BY id
)"""
        )
    return "".join(ctes) + (
        f"\nSELECT id AS user_id, CAST(hops AS INTEGER) AS hops FROM d{n_hops}"
        "\nORDER BY hops, user_id"
    )


@register(
    "graph_bfs_reachability",
    oracle=_bfs_oracle(3),
    tags=("graph", "events", "iterative"),
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first reachability (the recursive-CTE shape
    Spark lacks, e.g. org charts / BOM explosions / influence
    neighborhoods): minimum hop counts within 3 hops of the
    covisitation graph's smallest node id. The driver loop over
    checkpoint-truncated lazy plans IS the recursion — one edge join +
    one min-agg per hop (operators/graph.py:bfs_hops) — and the fixed
    bound is what lets the oracle unroll it (the PageRank/LPA/k-means
    precedent, now covering traversal). Source selection (min node) is
    a bounded driver action; eager like the census."""
    from data_lake_with_spark_spark.operators.graph import bfs_hops

    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("win"),
        "user_id",
    ).distinct()
    a = w.select("win", F.col("user_id").alias("a_id"))
    b = w.select("win", F.col("user_id").alias("b_id"))
    pairs = (
        a.join(b, "win")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("nw"))
        .where(F.col("nw") >= 3)
        .select("a_id", "b_id")
    )
    pairs = pairs.localCheckpoint(eager=True)
    source = pairs.agg(F.min("a_id")).first()[0]
    dist = bfs_hops(pairs, int(source), n_hops=3, id_col="user_id")
    return dist.select("user_id", "hops").orderBy("hops", "user_id")
