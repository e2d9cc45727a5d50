"""Product/event analytics + catalog maintenance queries.

Shapes a lakehouse query layer is expected to answer over the
stream-shaped ``events`` table (reference analog: the songplays fact,
/root/reference/etl.py:239-294) plus ANALYZE-style table profiling and
corpus-level TF-IDF over ``documents``:

- ordered / gap-constrained / predicate / unordered conversion funnels,
- weekly cohort retention and conversion-latency percentiles,
- gap-based sessionization with ordered event paths,
- single-pass column statistics profile (ANALYZE TABLE analog),
- corpus TF-IDF term ranking,
- anomaly detection (rolling z-score, median/MAD, CUSUM change-point),
- gaps-and-islands streaks, interval-sweep concurrency,
- chi-square independence cells, mergeable-histogram quantiles,
- recency-decay activity scoring.

All fully oracled. Scale notes per query docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions.time import epoch_ms

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import dsum, dsum_sql, pround, pround_sql
from data_lake_with_spark_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t0
  WHERE e.event_type = 'view' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM v) AS n_view_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
"""


@register("funnel_signup_view_purchase", oracle=FUNNEL_ORACLE, tags=("analytics", "events"))
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who signed up, then viewed at or
    after their first signup, then purchased at or after that first
    qualifying view. Each stage is a groupBy-min plus an equi-join on
    user_id — the stage outputs are per-user (small relative to the
    event log), so at scale the joins broadcast and the only full-fact
    scans are the three type-filtered passes (one shuffle each on
    user_id, pruned to two columns)."""
    from data_lake_with_spark_spark.operators.funnel import funnel_stage_users

    ev = _t(spark, sf_dir, "events")
    s, v, p = funnel_stage_users(ev, ["signup", "view", "purchase"])
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


FUNNEL_7D_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t
   AND epoch_ms(e.ts) - epoch_ms(s.t) <= 604800000
  WHERE e.event_type = 'view' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t
   AND epoch_ms(e.ts) - epoch_ms(v.t) <= 604800000
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 0 AS stage_idx, 'signup' AS stage, (SELECT COUNT(*) FROM s) AS n_users
UNION ALL
SELECT 1, 'view', (SELECT COUNT(*) FROM v)
UNION ALL
SELECT 2, 'purchase', (SELECT COUNT(*) FROM p)
ORDER BY stage_idx
"""


@register("funnel_within_7d", oracle=FUNNEL_7D_ORACLE, tags=("analytics", "events"))
def funnel_within_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parameterized N-stage funnel operator
    (``operators/funnel.py``) in long form, with a 7-day max gap
    between consecutive stages — each stage must happen within a week
    of the previous one's first qualifying event."""
    from data_lake_with_spark_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(
        ev, ["signup", "view", "purchase"], max_gap_seconds=7 * 86400
    )


RESAMPLE_ORACLE = """
WITH hourly AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         MAX(value) AS v
  FROM events WHERE user_id < 20
  GROUP BY 1, 2
), bounds AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY user_id
), spine AS (
  SELECT b.user_id, UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds b
)
SELECT s.user_id, s.hour,
       CAST(h.v IS NOT NULL AS BOOLEAN) AS observed,
       LAST_VALUE(h.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
ORDER BY s.user_id, s.hour
"""


@register(
    "timeseries_resample_locf", oracle=RESAMPLE_ORACLE, tags=("timeseries", "events")
)
def timeseries_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill: each user's event
    values become a dense hourly series from their first to last
    active hour (per-user time spine via sequence+explode — generated
    distributed, sized by each user's own range, never a global
    calendar cross join), gaps carry the last observation forward
    (last-ignorenulls window). The hypertable-rollup complement: that
    query compresses time, this one densifies it for models that need
    an evenly spaced signal."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.max("value").alias("v"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.col("v").isNotNull().alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        )
        .orderBy("user_id", "hour")
    )


FUNNEL_PRED_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.t
  WHERE e.event_type = 'view' AND e.value >= 100.0 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t
  WHERE e.event_type IN ('purchase', 'click') AND e.value >= 10.0
  GROUP BY e.user_id
)
SELECT 0 AS stage_idx, 'signup' AS stage, (SELECT COUNT(*) FROM s) AS n_users
UNION ALL
SELECT 1, 'big_view', (SELECT COUNT(*) FROM v)
UNION ALL
SELECT 2, 'monetized', (SELECT COUNT(*) FROM p)
ORDER BY stage_idx
"""


@register("funnel_predicate_stages", oracle=FUNNEL_PRED_ORACLE, tags=("analytics", "events"))
def funnel_predicate_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stages as ARBITRARY boolean predicates, not just event
    types: signup → a view worth ≥ 100 → any monetized interaction
    (purchase or click) worth ≥ 10. Same per-stage shape as the type
    funnel — a predicate-filtered two-column pass over the log (the
    value/type predicates push to the parquet scan), one groupBy-min
    per stage, user-cardinality equi-joins between stages."""
    from data_lake_with_spark_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    stages = [
        "signup",
        ("big_view", (F.col("event_type") == "view") & (F.col("value") >= 100.0)),
        (
            "monetized",
            F.col("event_type").isin("purchase", "click") & (F.col("value") >= 10.0),
        ),
    ]
    return funnel_counts(ev, stages)


COHORT_ORACLE = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
  FROM events
)
SELECT f.cohort_week,
       CAST(FLOOR(date_diff('day', CAST(f.cohort_week AS DATE),
                            CAST(a.act_week AS DATE)) / 7) AS INTEGER) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("cohort_weekly_retention", oracle=COHORT_ORACLE, tags=("analytics", "events"))
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by the ISO week
    of their first event; n_users active per (cohort_week, week_offset).
    Both inputs reduce to one row per user(/week) before the join, so
    the join sides are user-cardinality — at 100 TB the event scans
    dominate and the distinct/min aggregations are map-side partial."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week").cast("date"), F.col("cohort_week").cast("date")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


SESSION_PATH_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM sess
GROUP BY user_id, sess_id
ORDER BY user_id, sess_id
"""


@register("sessionize_event_paths", oracle=SESSION_PATH_ORACLE, tags=("analytics", "events", "window"))
def sessionize_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) with the ordered
    event-type path per session — the batch twin of
    ``F.session_window`` that additionally keeps sequence order
    ('view>click>purchase'). One shuffle on user_id serves both the
    lag/cumulative-sum window and the final groupBy (same partition
    key, Catalyst reuses the Exchange). Gap test compares integer
    epoch-millis (exact on both engines; double epoch seconds would
    drift on sub-second timestamps)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (ms - epoch_ms(F.lag("ts").over(w)) > 1_800_000),
        1,
    ).otherwise(0)
    sessioned = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    from data_lake_with_spark_spark.operators.plan_cache import shared

    # shared() before the presentation sort (round-14 optimization):
    # the groupBy reuses the window's user_id partitioning, so the
    # range exchange's SAMPLING pass re-executed the whole two-window +
    # collect_list aggregation stage (no shuffle in between to read
    # back). The lazy cache makes sampling and the write pass read the
    # 9.5k aggregated rows instead. Measured 1.22s → 0.68s at sf0.1.
    agg = shared(
        sessioned.groupBy("user_id", "sess_id").agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(ordered, lambda x: x["event_type"]), ">"
            ).alias("path"),
        )
    )
    return agg.orderBy("user_id", "sess_id")


PROFILE_ORACLE = """
WITH a AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(o_orderkey)    AS c1, COUNT(DISTINCT o_orderkey)    AS d1,
         CAST(MIN(o_orderkey) AS DOUBLE) AS mn1, CAST(MAX(o_orderkey) AS DOUBLE) AS mx1,
         COUNT(o_custkey)     AS c2, COUNT(DISTINCT o_custkey)     AS d2,
         CAST(MIN(o_custkey) AS DOUBLE) AS mn2, CAST(MAX(o_custkey) AS DOUBLE) AS mx2,
         COUNT(o_totalprice)  AS c3, COUNT(DISTINCT o_totalprice)  AS d3,
         MIN(o_totalprice) AS mn3, MAX(o_totalprice) AS mx3,
         COUNT(o_orderstatus) AS c4, COUNT(DISTINCT o_orderstatus) AS d4
  FROM orders
)
SELECT 'o_custkey' AS col_name, n_rows, c2 AS n_nonnull, d2 AS ndv, mn2 AS min_val, mx2 AS max_val FROM a
UNION ALL
SELECT 'o_orderkey', n_rows, c1, d1, mn1, mx1 FROM a
UNION ALL
SELECT 'o_orderstatus', n_rows, c4, d4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
UNION ALL
SELECT 'o_totalprice', n_rows, c3, d3, mn3, mx3 FROM a
ORDER BY col_name
"""


@register("stats_table_profile", oracle=PROFILE_ORACLE, tags=("stats", "catalog"))
def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE analog: per-column row/non-null/NDV/min/max profile
    of ``orders``, computed in ONE scan (a single wide aggregate row,
    exploded into per-column rows) — the stats a cost-based optimizer
    or a data-quality monitor ingests. At scale swap the exact
    COUNT(DISTINCT) for approx_count_distinct; the exact form is used
    here because the oracle checks values."""
    orders = _t(spark, sf_dir, "orders")
    agged = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("c1"),
        F.countDistinct("o_orderkey").alias("d1"),
        F.min("o_orderkey").cast("double").alias("mn1"),
        F.max("o_orderkey").cast("double").alias("mx1"),
        F.count("o_custkey").alias("c2"),
        F.countDistinct("o_custkey").alias("d2"),
        F.min("o_custkey").cast("double").alias("mn2"),
        F.max("o_custkey").cast("double").alias("mx2"),
        F.count("o_totalprice").alias("c3"),
        F.countDistinct("o_totalprice").alias("d3"),
        F.min("o_totalprice").alias("mn3"),
        F.max("o_totalprice").alias("mx3"),
        F.count("o_orderstatus").alias("c4"),
        F.countDistinct("o_orderstatus").alias("d4"),
    )
    null_d = F.lit(None).cast("double")

    def row(name: str, c: str, d: str, mn, mx) -> F.Column:
        return F.struct(
            F.lit(name).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(c).alias("n_nonnull"),
            F.col(d).alias("ndv"),
            mn.alias("min_val"),
            mx.alias("max_val"),
        )

    return (
        agged.select(
            F.explode(
                F.array(
                    row("o_orderkey", "c1", "d1", F.col("mn1"), F.col("mx1")),
                    row("o_custkey", "c2", "d2", F.col("mn2"), F.col("mx2")),
                    row("o_totalprice", "c3", "d3", F.col("mn3"), F.col("mx3")),
                    row("o_orderstatus", "c4", "d4", null_d, null_d),
                )
            ).alias("p")
        )
        .select("p.*")
        .orderBy("col_name")
    )


TRANSITION_ORACLE = f"""
WITH nxt AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), pairs AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM nxt WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       {pround_sql(
           'CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)',
           6,
       )} AS p
FROM pairs
ORDER BY event_type, next_type
"""


@register("events_transition_matrix", oracle=TRANSITION_ORACLE, tags=("analytics", "events", "window"))
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | event_type) with observed counts. One
    shuffle on user_id for the lead window, then a tiny
    (|types|²-row) aggregate; the normalizing row-sum is a second
    window over that tiny frame, not over raw events. At 100 TB the
    user_id shuffle is the only data-sized exchange and it
    partitions evenly (per-user sequences are short)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_total = F.sum("n").over(W.partitionBy("event_type"))
    return (
        pairs.select(
            "event_type",
            "next_type",
            "n",
            pround(F.col("n").cast("double") / row_total.cast("double"), 6).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


ZSCORE_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {dsum_sql('value', 2)} AS revenue
  FROM events
  GROUP BY 1
), roll AS (
  SELECT day, revenue,
         CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(revenue * revenue AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxx,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n_win
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, revenue,
       {pround_sql(
           '(revenue - sx / n_win) / sqrt((sxx - sx * sx / n_win) / (n_win - 1))',
           4,
       )} AS z,
       (n_win >= 7 AND
        abs((revenue - sx / n_win)
            / sqrt((sxx - sx * sx / n_win) / (n_win - 1))) > 2.0) AS is_anomaly
FROM roll
WHERE n_win >= 2 AND (sxx - sx * sx / n_win) / (n_win - 1) > 1e-12
ORDER BY day
"""


@register("anomaly_rolling_zscore", oracle=ZSCORE_ORACLE, tags=("analytics", "events", "window", "stats"))
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day z-score anomaly flag over daily event revenue.

    Cross-engine portability: windowed STDDEV_SAMP uses different
    incremental algorithms in Spark vs DuckDB (last-ulp drift), so the
    variance is computed from EXACT decimal window sums of x and x²
    (both bit-identical per row across engines) and only then combined
    in deterministic double arithmetic — z is bit-identical on both
    engines before rounding, so the |z|>2 flag cannot straddle the
    boundary. The daily pre-aggregate shrinks the window input to
    one row per day; the unpartitioned ORDER BY day window is over
    that tiny frame, not raw events (at 100 TB the per-day rollup is
    the only data-sized shuffle; a production variant would window
    within a dimension key and stay partitioned)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum(F.col("value"), 2).alias("revenue"))
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    dec = "decimal(18,6)"
    roll = daily.select(
        "day",
        "revenue",
        F.sum(F.col("revenue").cast(dec)).over(w).cast("double").alias("sx"),
        F.sum((F.col("revenue") * F.col("revenue")).cast(dec)).over(w).cast("double").alias("sxx"),
        F.count(F.lit(1)).over(w).cast("double").alias("n_win"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_win")) / (
        F.col("n_win") - 1
    )
    z = (F.col("revenue") - F.col("sx") / F.col("n_win")) / F.sqrt(var)
    return (
        roll.where((F.col("n_win") >= 2) & (var > 1e-12))
        .select(
            "day",
            "revenue",
            pround(z, 4).alias("z"),
            ((F.col("n_win") >= 7) & (F.abs(z) > 2.0)).alias("is_anomaly"),
        )
        .orderBy("day")
    )


TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
), stats AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS total_tf, COUNT(*) AS df
  FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term, total_tf, df,
       {pround_sql('CAST(total_tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df)', 4)} AS tfidf
FROM stats, n
ORDER BY tfidf DESC, term
LIMIT 20
"""


@register("text_tfidf_top_terms", oracle=TFIDF_ORACLE, tags=("text", "llm"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: top-20 terms by summed tf·idf (idf = ln(N/df)).
    Because idf is constant per term, the per-doc score sum collapses
    to total_tf·ln(N/df) — one tokenize pass, two partial-aggregated
    groupBys, and a broadcast of the single-row corpus count. Rounded
    via the portable-rounding form; ties at the cut rank break on term
    so the top-20 set is deterministic on both engines."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.sum("tf").alias("total_tf"), F.count(F.lit(1)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(n))
        .select(
            "term",
            "total_tf",
            "df",
            pround(
                F.col("total_tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "term")
        .limit(20)
    )


REGR_ORACLE = """
WITH pts AS (
  SELECT event_type,
         (epoch_ms(ts) - 1704067200000) // 60000      AS xm,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT)     AS yi
  FROM events
), m AS (
  SELECT event_type,
         COUNT(*)        AS n,
         SUM(xm)         AS sx,
         SUM(yi)         AS sy,
         SUM(xm * yi)    AS sxy,
         SUM(xm * xm)    AS sxx,
         SUM(yi * yi)    AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type,
       FLOOR(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * 0.6) * 1e6 + 0.5) / 1e6                            AS slope,
       FLOOR(((CAST(sy AS DOUBLE)
               - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * CAST(sx AS DOUBLE))
              / CAST(n AS DOUBLE) / 100.0) * 1e4 + 0.5) / 1e4      AS intercept,
       FLOOR((POW(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
              / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))
             * 1e6 + 0.5) / 1e6                                    AS r2,
       CAST(n AS BIGINT)                                           AS n_pts
FROM m
ORDER BY event_type
"""


@register("agg_regression_trend", oracle=REGR_ORACLE, tags=("agg", "stats"))
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: does each event type's
    value drift over the month? The builtin regr_slope/intercept/r2
    aggregates compute exactly this but their double moment sums are
    summation-order-dependent — and even DECIMAL-cast moments of
    COMPUTED doubles (hours = ms/3.6e6) round differently across
    engines at 1e-6 near-ties. So the moments are pure INTEGER sums:
    x quantized to minutes since 2024-01-01, y to cents (floor(v·100
    + .5) — exact identical integers on any IEEE engine), all six
    sums bigint-safe and order-independent; the OLS formulas assemble
    from them in doubles and the slope rescales to value-units/hour
    (×0.6 = 60 min/h ÷ 100 cents). One hash-agg pass, map-side
    partials, bit-identical everywhere — agg_corr_median's recipe
    pushed one step further for hostile value distributions."""
    ev = _t(spark, sf_dir, "events")
    base = F.lit(1704067200000).cast("long")  # 2024-01-01 epoch ms
    xm = F.floor((epoch_ms("ts") - base) / F.lit(60000)).cast("long")
    yi = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    pts = ev.select("event_type", xm.alias("xm"), yi.alias("yi"))
    m = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(F.col("xm") * F.col("yi")).alias("sxy"),
        F.sum(F.col("xm") * F.col("xm")).alias("sxx"),
        F.sum(F.col("yi") * F.col("yi")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    slope_cpm = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    slope = slope_cpm * F.lit(0.6)  # cents/min → units/hour
    intercept = (sy - slope_cpm * sx) / n / F.lit(100.0)
    r2 = F.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        m.select(
            "event_type",
            (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("slope"),
            (F.floor(intercept * 1e4 + F.lit(0.5)) / 1e4).alias("intercept"),
            (F.floor(r2 * 1e6 + F.lit(0.5)) / 1e6).alias("r2"),
            F.col("n").cast("bigint").alias("n_pts"),
        )
        .orderBy("event_type")
    )


MAD_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {dsum_sql('value', 2)} AS revenue
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, median(revenue) AS med FROM daily GROUP BY event_type
), dev AS (
  SELECT d.event_type, d.day, d.revenue, m.med,
         ABS(d.revenue - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, d.day, d.revenue,
       {pround_sql('(d.revenue - d.med)', 2)} AS deviation,
       d.adev > 3.0 * m.mad AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
ORDER BY d.event_type, d.day
"""


@register(
    "anomaly_mad_daily",
    oracle=MAD_ORACLE,
    tags=("analytics", "events", "stats"),
)
def anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flag per event type: a day is anomalous when its
    revenue deviates from the group MEDIAN by more than 3× the median
    absolute deviation — the outlier-resistant complement of the
    rolling z-score (one extreme day shifts a mean/stddev but not a
    median/MAD). Order statistics are engine-exact (no float
    summation at all: daily revenues are decimal-exact, medians
    interpolate two exact values identically on any IEEE engine), so
    the whole flag column hash-matches. Plan: two tiny per-group
    medians broadcast back over the daily aggregate — the daily
    hash-agg is the only data-sized shuffle."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dsum(F.col("value"), 2).alias("revenue"))
    med = daily.groupBy("event_type").agg(F.median("revenue").alias("med"))
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("revenue") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "revenue",
            pround(F.col("revenue") - F.col("med"), 2).alias("deviation"),
            (F.col("adev") > F.lit(3.0) * F.col("mad")).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


FUNNEL_LATENCY_ORACLE = """
WITH signups AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id,
         MIN(epoch_ms(p.ts) - epoch_ms(s.s_ts)) // 60000 AS latency_min
  FROM signups s JOIN events p
    ON p.user_id = s.user_id
   AND p.event_type = 'purchase'
   AND p.ts > s.s_ts
   AND p.ts <= s.s_ts + INTERVAL '7 days'
  GROUP BY s.user_id
)
SELECT COUNT(*)                                              AS n_converted,
       FLOOR(quantile_cont(latency_min, 0.50) * 1e4 + 0.5) / 1e4 AS p50_min,
       FLOOR(quantile_cont(latency_min, 0.90) * 1e4 + 0.5) / 1e4 AS p90_min,
       CAST(MAX(latency_min) AS BIGINT)                      AS max_min
FROM conv
"""


@register(
    "funnel_conversion_latency",
    oracle=FUNNEL_LATENCY_ORACLE,
    tags=("analytics", "events", "funnel", "stats"),
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: minutes from each user's FIRST
    signup to their FIRST subsequent purchase within 7 days, summarized
    as exact p50/p90/max. Latencies quantize to integer minutes
    (integer epoch-ms division — identical on both engines) and
    percentiles interpolate two exact integers, so the whole summary
    hash-matches. Plan: per-user min-signup hash-agg, one range-bounded
    join, per-user min, one global agg — no window over the full event
    stream."""
    ev = _t(spark, sf_dir, "events")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        signups.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 days")),
        )
        .groupBy("user_id")
        .agg(
            F.floor(
                F.min(epoch_ms("p_ts") - epoch_ms("s_ts")) / F.lit(60000)
            ).alias("latency_min")
        )
    )
    pct = F.percentile("latency_min", F.array(F.lit(0.5), F.lit(0.9)))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.floor(pct[0] * 1e4 + F.lit(0.5)) / 1e4).alias("p50_min"),
        (F.floor(pct[1] * 1e4 + F.lit(0.5)) / 1e4).alias("p90_min"),
        F.max("latency_min").cast("bigint").alias("max_min"),
    )


STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM days
), s AS (
  SELECT user_id, day - CAST(rn AS INTEGER) AS grp, COUNT(*) AS len
  FROM r GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM s GROUP BY user_id ORDER BY user_id
"""


@register(
    "streaks_active_days",
    oracle=STREAKS_ORACLE,
    tags=("analytics", "events", "window"),
)
def streaks_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via
    the day−row_number grouping trick — the canonical engagement-streak
    query every event warehouse answers. Shuffle budget: one distinct
    on (user, day) (collapses the raw event volume first), one
    per-user window over *active days only* (≤ a few thousand rows per
    user however many raw events they have — the distinct is the
    scale guard), then hash aggs that reuse the user partitioning."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp", F.expr("date_sub(day, rn)")
    )
    streaks = grp.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


CONCURRENCY_ORACLE = """
WITH iv AS (
  SELECT event_type, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events
), pts AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
), per_t AS (
  SELECT event_type, t, SUM(d) AS net FROM pts GROUP BY 1, 2
), act AS (
  SELECT event_type, t,
         SUM(net) OVER (PARTITION BY event_type ORDER BY t) AS active
  FROM per_t
), mx AS (
  SELECT event_type, MAX(active) AS m FROM act GROUP BY event_type
)
SELECT a.event_type,
       CAST(x.m AS BIGINT) AS max_concurrent,
       MIN(a.t) AS peak_at
FROM act a JOIN mx x ON a.event_type = x.event_type AND a.active = x.m
GROUP BY a.event_type, x.m
ORDER BY a.event_type
"""


@register(
    "interval_max_concurrency",
    oracle=CONCURRENCY_ORACLE,
    tags=("analytics", "events", "window"),
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval sweep: treating each event as a 5-minute activity
    interval [ts, ts+5min), the peak number of concurrently-active
    intervals per event type and the earliest instant it is reached.
    Classic +1/−1 boundary sweep, made distributed: boundaries are
    first collapsed to one net delta per distinct timestamp (hash
    agg), THEN prefix-summed — a two-level sum (per-day partials
    cumulated across days per group, within-day cumsum running in
    parallel across (type, day) partitions plus the broadcast
    carry-in), so no single task ever sorts a whole event type: the
    per-partition work is one day of one type regardless of corpus
    size. Half-open semantics: an interval ending at t is inactive at
    t (the −1 lands at t and sorts into the same running total)."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d")))
    per_t = pts.groupBy("event_type", "t").agg(F.sum("d").alias("net"))
    # two-level prefix sum: day partials (tiny, one row per (type, day))
    # carry into within-day cumsums that parallelize across days.
    # per_t and act are tracked shared() caches: per_t feeds the day
    # carry AND the within-day cumsum, act feeds the max probe AND the
    # argmax join — uncached, the events scan re-derived 8× (round-10
    # scan audit).
    from data_lake_with_spark_spark.operators.plan_cache import shared

    per_t = shared(per_t.withColumn("day", F.date_trunc("day", "t")))
    day_tot = per_t.groupBy("event_type", "day").agg(F.sum("net").alias("day_net"))
    w_days = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = day_tot.withColumn(
        "carry_in", F.coalesce(F.sum("day_net").over(w_days), F.lit(0))
    ).select("event_type", "day", "carry_in")
    w_in_day = W.partitionBy("event_type", "day").orderBy("t")
    act = shared(
        per_t.join(F.broadcast(carry), ["event_type", "day"])
        .withColumn("active", F.col("carry_in") + F.sum("net").over(w_in_day))
        .select("event_type", "t", "active")
    )
    mx = act.groupBy("event_type").agg(F.max("active").alias("m"))
    return (
        act.join(F.broadcast(mx), "event_type")
        .where(F.col("active") == F.col("m"))
        .groupBy("event_type", "m")
        .agg(F.min("t").alias("peak_at"))
        .select(
            "event_type",
            F.col("m").cast("bigint").alias("max_concurrent"),
            "peak_at",
        )
        .orderBy("event_type")
    )


CHI2_ORACLE = f"""
WITH o AS (
  SELECT lang, source, COUNT(*) AS obs FROM documents GROUP BY 1, 2
), rt AS (SELECT lang, SUM(obs) AS r FROM o GROUP BY lang),
ct AS (SELECT source, SUM(obs) AS c FROM o GROUP BY source),
n AS (SELECT SUM(obs) AS n FROM o)
SELECT o.lang, o.source,
       CAST(o.obs AS BIGINT) AS observed,
       {pround_sql('(rt.r * ct.c * 1.0 / n.n)', 4)} AS expected,
       {pround_sql('((o.obs - rt.r * ct.c * 1.0 / n.n) * (o.obs - rt.r * ct.c * 1.0 / n.n)) / (rt.r * ct.c * 1.0 / n.n)', 6)} AS contrib
FROM o JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
ORDER BY o.lang, o.source
"""


@register(
    "stats_chi_square_cells",
    oracle=CHI2_ORACLE,
    tags=("stats", "agg"),
)
def stats_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for lang × source: observed vs
    expected count and the per-cell χ² contribution. All inputs are
    exact integers (one contingency hash-agg; marginals are tiny
    broadcast re-aggregations of the cell table, not rescans), so each
    cell's double math is deterministic; contributions are emitted
    per-cell rather than pre-summed so the output is order-independent
    — the χ² total is one exact decimal sum away."""
    docs = _t(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    rt = o.groupBy("lang").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    e = F.col("r") * F.col("c") * F.lit(1.0) / F.col("n")
    return (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            F.col("obs").cast("bigint").alias("observed"),
            pround(e, 4).alias("expected"),
            pround(((F.col("obs") - e) * (F.col("obs") - e)) / e, 6).alias(
                "contrib"
            ),
        )
        .orderBy("lang", "source")
    )


HIST_QUANTILE_ORACLE = """
WITH hist AS (
  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
), qs AS (
  SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q
), hit AS (
  SELECT c.event_type, q.q, c.bucket, c.cnt, c.cum - c.cnt AS cum_before,
         CAST(CEIL(q.q * c.n) AS BIGINT) AS needed,
         ROW_NUMBER() OVER (PARTITION BY c.event_type, q.q
                            ORDER BY c.bucket ASC) AS rn
  FROM cum c CROSS JOIN qs q
  WHERE c.cum >= CAST(CEIL(q.q * c.n) AS BIGINT)
)
SELECT event_type, q,
       FLOOR((bucket + (needed - cum_before) * 1.0 / cnt) * 1e6 + 0.5) / 1e6
         AS est
FROM hit WHERE rn = 1
ORDER BY event_type, q
"""


@register(
    "quantile_fixed_histogram",
    oracle=HIST_QUANTILE_ORACLE,
    tags=("stats", "agg", "approx"),
)
def quantile_fixed_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile estimation — the shape that scales
    where exact percentiles don't: per-type unit-width bucket counts
    (map-side combinable, bounded state), cumulative counts, then
    linear interpolation inside the bucket holding ceil(q·N). Every
    input to the interpolation is an exact integer, so the estimate is
    deterministic and fully oracled — unlike sampled
    approx_percentile, which stays rows-only. Histograms from
    different partitions/days merge by bucket-wise addition, giving
    streaming/incremental quantiles for free (the micro-batch fold is
    tested in test_streaming_materialized.py against this exact
    query)."""
    from data_lake_with_spark_spark.operators.histogram import (
        histogram_quantiles,
        unit_histogram,
    )

    ev = _t(spark, sf_dir, "events")
    hist = unit_histogram(ev, "event_type", "value")
    return histogram_quantiles(hist, "event_type").orderBy("event_type", "q")


CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
  FROM events GROUP BY 1, 2
), run AS (
  SELECT event_type, day, rev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         SUM(rev) OVER (PARTITION BY event_type ORDER BY day) AS s_t,
         SUM(rev) OVER (PARTITION BY event_type) AS s_n,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), drift AS (
  SELECT event_type, day, s_t * n - t * s_n AS d, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(s_t * n - t * s_n) DESC, day ASC) AS rn
  FROM run
)
SELECT event_type, day AS change_day,
       FLOOR((d * 1.0 / (n * 100.0)) * 1e4 + 0.5) / 1e4 AS cusum
FROM drift WHERE rn = 1
ORDER BY event_type
"""


@register(
    "anomaly_cusum_changepoint",
    oracle=CUSUM_ORACLE,
    tags=("analytics", "events", "stats", "window"),
)
def anomaly_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue per event type:
    the day where the cumulative deviation from the series mean peaks
    — where the level shift happened. Everything is EXACT integer
    math until the last division: revenues become cents, and the
    deviation S_t·N − t·S_N clears the mean's fraction by
    cross-multiplying, so the argmax (tie → earliest day) is
    bit-deterministic on any engine. One daily hash-agg plus per-type
    windows over ~30 day-rows — the window input is the aggregate, not
    the events."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(cents).alias("rev"))
    w_ord = W.partitionBy("event_type").orderBy("day")
    w_all = W.partitionBy("event_type")
    run = (
        daily.withColumn("t", F.row_number().over(w_ord))
        .withColumn("s_t", F.sum("rev").over(w_ord))
        .withColumn("s_n", F.sum("rev").over(w_all))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    drift = run.withColumn(
        "d", F.col("s_t") * F.col("n") - F.col("t") * F.col("s_n")
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.abs(F.col("s_t") * F.col("n") - F.col("t") * F.col("s_n")).desc(),
                F.asc("day"),
            )
        ),
    )
    cusum = F.col("d") * F.lit(1.0) / (F.col("n") * F.lit(100.0))
    return (
        drift.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            (F.floor(cusum * 1e4 + F.lit(0.5)) / 1e4).alias("cusum"),
        )
        .orderBy("event_type")
    )


UNORDERED_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id, event_type, MIN(ts) AS t0
  FROM events
  WHERE event_type IN ('signup', 'view', 'purchase')
  GROUP BY 1, 2
), per_user AS (
  SELECT user_id, COUNT(*) AS n_types,
         MAX(t0) - MIN(t0) AS span
  FROM firsts GROUP BY user_id
), all3 AS (
  SELECT user_id,
         CAST(FLOOR(epoch_ms(span) / 60000) AS BIGINT) AS span_min
  FROM per_user WHERE n_types = 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users_all3,
       CAST(SUM(CASE WHEN span_min <= 7 * 24 * 60 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_7d,
       CAST(MAX(span_min) AS BIGINT) AS max_span_min
FROM all3
"""


@register(
    "funnel_unordered_set",
    oracle=UNORDERED_FUNNEL_ORACLE,
    tags=("analytics", "events"),
)
def funnel_unordered_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered funnel: users who performed ALL of signup/view/
    purchase in ANY order, and how many closed the set within 7 days
    of their first of the three — the set-completion complement of the
    ordered funnels (which require the canonical sequence). One hash
    agg to first-occurrences (3 rows max per user), one per-user
    rollup, then a scalar summary; integer minute spans keep it
    engine-exact."""
    ev = _t(spark, sf_dir, "events")
    firsts = (
        ev.where(F.col("event_type").isin("signup", "view", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("t0"))
    )
    per_user = firsts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.floor(
            (epoch_ms(F.max("t0")) - epoch_ms(F.min("t0"))) / F.lit(60000)
        ).alias("span_min"),
    )
    all3 = per_user.where(F.col("n_types") == 3)
    return all3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users_all3"),
        F.sum(
            F.when(F.col("span_min") <= 7 * 24 * 60, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_within_7d"),
        F.max("span_min").cast("bigint").alias("max_span_min"),
    )


DECAY_ORACLE = """
WITH anchor AS (
  SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS a FROM events
), ev AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
), wts AS (
  SELECT user_id,
         CASE WHEN CAST((anchor.a - d) AS INTEGER) // 7 <= 8
              THEN CAST(1 AS BIGINT)
                   << CAST(8 - CAST((anchor.a - d) AS INTEGER) // 7 AS INTEGER)
              ELSE CAST(0 AS BIGINT) END AS w
  FROM ev CROSS JOIN anchor
)
SELECT user_id,
       CAST(SUM(w) AS BIGINT) AS score_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w) AS DOUBLE) / 256.0 AS score
FROM wts GROUP BY user_id ORDER BY user_id
"""


@register(
    "score_activity_decay",
    oracle=DECAY_ORACLE,
    tags=("analytics", "events", "agg"),
)
def score_activity_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted activity score with EXACT exponential decay:
    half-life = one week, weight = 2^(8 − age_weeks) for events up to
    8 weeks old and 0 beyond — powers of two, so the weighted sum is
    pure BIGINT addition and even the final /256 double is exact (no
    libm exp/pow anywhere, the priority-sampling discipline applied to
    feature engineering). Events older than 8 weeks contribute weight
    0, completing the decay to zero (round-5 VERDICT item 6: the old
    greatest(8−aw, 0) exponent left them at weight 1 forever);
    n_events still counts them. The anchor is the corpus max day
    (deterministic, re-run-stable). One hash agg; the anchor is a
    broadcast scalar."""
    ev = _t(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("a"))
    wts = ev.select("user_id", F.to_date("ts").alias("d")).crossJoin(
        F.broadcast(anchor)
    ).select(
        "user_id",
        F.expr(
            "CASE WHEN CAST(datediff(a, d) AS INT) div 7 <= 8"
            " THEN shiftleft(CAST(1 AS BIGINT),"
            " 8 - CAST(datediff(a, d) AS INT) div 7)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("w"),
    )
    scaled = F.sum("w")
    return (
        wts.groupBy("user_id")
        .agg(
            scaled.cast("bigint").alias("score_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (scaled.cast("double") / F.lit(256.0)).alias("score"),
        )
        .orderBy("user_id")
    )


THEIL_SEN_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         {dsum_sql('value', 2)} AS rev
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, rev,
         CAST((day - DATE '1970-01-01') AS INTEGER) AS x
  FROM daily
), slopes AS (
  SELECT a.event_type,
         (b.rev - a.rev) / (b.x - a.x) AS slope
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.x < b.x
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       FLOOR(median(slope) * 1e6 + 0.5) / 1e6 AS ts_slope
FROM slopes GROUP BY event_type ORDER BY event_type
"""


@register(
    "regression_theil_sen",
    oracle=THEIL_SEN_ORACLE,
    tags=("analytics", "events", "stats"),
)
def regression_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise daily-revenue
    slopes per event type — outlier-resistant where OLS
    (agg_regression_trend) is not. The pair join runs on the DAILY
    AGGREGATE keyed by group (≤ days² bounded pairs per type, the
    bounded-pairs discipline — never raw events²); slopes are
    identical doubles on any engine (decimal-exact revenues, integer
    day gaps, one division) so the exact median order statistic
    hash-matches."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(dsum(F.col("value"), 2).alias("rev"))
    idx = daily.select(
        "event_type",
        "rev",
        F.datediff("day", F.lit("1970-01-01").cast("date")).alias("x"),
    )
    a = idx.select("event_type", F.col("rev").alias("ra"), F.col("x").alias("xa"))
    b = idx.select("event_type", F.col("rev").alias("rb"), F.col("x").alias("xb"))
    slopes = (
        a.join(b, "event_type")
        .where(F.col("xa") < F.col("xb"))
        .select(
            "event_type",
            ((F.col("rb") - F.col("ra")) / (F.col("xb") - F.col("xa"))).alias(
                "slope"
            ),
        )
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.floor(F.median("slope") * 1e6 + F.lit(0.5)) / 1e6).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


LAG_FEATURES_ORACLE = """
WITH purch AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value,
       lag(value, 1) OVER w AS prev_1,
       lag(value, 2) OVER w AS prev_2,
       lag(value, 3) OVER w AS prev_3
FROM purch
WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
ORDER BY user_id, ts_ms, value
"""


@register(
    "features_lag_purchases",
    oracle=LAG_FEATURES_ORACLE,
    tags=("analytics", "events", "window", "training"),
)
def features_lag_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoregressive feature assembly: each purchase with its user's
    previous three purchase values — the lag-feature block every
    tabular-ML training pipeline emits. One per-user window; ties on
    ts broken by value so the frame is a total order (feature
    determinism is a training-reproducibility requirement, not a
    nicety)."""
    ev = _t(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "value")
    return (
        purch.select(
            "user_id",
            epoch_ms("ts").alias("ts_ms"),
            "value",
            F.lag("value", 1).over(w).alias("prev_1"),
            F.lag("value", 2).over(w).alias("prev_2"),
            F.lag("value", 3).over(w).alias("prev_3"),
        )
        .orderBy("user_id", "ts_ms", "value")
    )


DOW_HOUR_ORACLE = """
SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hr,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY dow, hr
"""


@register(
    "activity_dow_hour_matrix",
    oracle=DOW_HOUR_ORACLE,
    tags=("analytics", "events", "agg"),
)
def activity_dow_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity matrix (the traffic heatmap).
    DuckDB dayofweek is 0=Sunday while Spark's is 1=Sunday — the
    engine subtracts 1 to the oracle's convention (the documented
    cross-engine drift, ARCHITECTURE 'Expression-engine lessons').
    One hash agg; distinct via Spark's two-phase expansion."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("dow", "hr")
    )


GINI_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n_t FROM events GROUP BY 1, 2
), u AS (
  SELECT user_id, SUM(n_t) AS n, SUM(n_t * n_t) AS sq,
         COUNT(*) AS n_types
  FROM c GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       FLOOR(sq * 1.0 / (n * n) * 1e6 + 0.5) / 1e6 AS hhi,
       FLOOR((1.0 - sq * 1.0 / (n * n)) * 1e6 + 0.5) / 1e6 AS gini_diversity
FROM u ORDER BY user_id
"""


@register(
    "score_user_gini_diversity",
    oracle=GINI_ORACLE,
    tags=("analytics", "events", "stats"),
)
def score_user_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral concentration per user: Herfindahl index Σp² and its
    Gini-impurity complement 1−Σp² over the event-type mix — the
    log-free diversity metrics (entropy's libm cost avoided, the
    co-occurrence-lift discipline). Σp² = Σn_t²/n² is pure integer
    arithmetic until one rounded division; two stacked hash aggs, the
    second keyed on a prefix of the first's key so it reuses the
    partitioning."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n_t"))
    u = c.groupBy("user_id").agg(
        F.sum("n_t").alias("n"),
        F.sum(F.col("n_t") * F.col("n_t")).alias("sq"),
        F.count(F.lit(1)).alias("n_types"),
    )
    hhi = F.col("sq") * F.lit(1.0) / (F.col("n") * F.col("n"))
    return u.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_types").cast("bigint").alias("n_types"),
        (F.floor(hhi * 1e6 + F.lit(0.5)) / 1e6).alias("hhi"),
        (F.floor((F.lit(1.0) - hhi) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "gini_diversity"
        ),
    ).orderBy("user_id")


DRAWDOWN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS rev
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, day,
         SUM(rev) OVER (PARTITION BY event_type ORDER BY day) AS c
  FROM daily
), dd AS (
  SELECT event_type, day, c,
         MAX(c) OVER (PARTITION BY event_type ORDER BY day) AS peak
  FROM cum
)
SELECT event_type,
       FLOOR(MAX(peak - c) / 100.0 * 1e4 + 0.5) / 1e4 AS max_drawdown,
       CAST(MIN(CASE WHEN peak - c = mdd THEN day END) AS TIMESTAMP)
         AS trough_day
FROM (SELECT *, MAX(peak - c) OVER (PARTITION BY event_type) AS mdd FROM dd)
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "finance_max_drawdown",
    oracle=DRAWDOWN_ORACLE,
    tags=("analytics", "events", "window", "stats"),
)
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue per event type:
    largest peak-to-trough decline (running max minus running value),
    with the earliest trough day. All integer cents until one final
    /100 conversion (the CUSUM discipline); windows run over the
    ~30-row daily aggregate per group, never raw events."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(cents).alias("rev"))
    w_ord = W.partitionBy("event_type").orderBy("day")
    dd = (
        daily.withColumn("c", F.sum("rev").over(w_ord))
        .withColumn("peak", F.max(F.col("c")).over(w_ord))
        .withColumn("dd", F.col("peak") - F.col("c"))
        .withColumn("mdd", F.max("dd").over(W.partitionBy("event_type")))
    )
    return (
        dd.groupBy("event_type")
        .agg(
            (
                F.floor(F.max("dd") / F.lit(100.0) * 1e4 + F.lit(0.5)) / 1e4
            ).alias("max_drawdown"),
            F.min(
                F.when(F.col("dd") == F.col("mdd"), F.col("day"))
            ).alias("trough_day"),
        )
        .orderBy("event_type")
    )


BURSTS_ORACLE = """
WITH minutely AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), trail AS (
  SELECT event_type, hr, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_sum,
         COUNT(n) OVER (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_n
  FROM minutely
)
SELECT event_type, hr, CAST(n AS BIGINT) AS n_events,
       CAST(prev_sum AS BIGINT) AS trailing_sum,
       CAST(prev_n AS BIGINT) AS trailing_hours
FROM trail
WHERE prev_n >= 12 AND n * prev_n > 3 * prev_sum
ORDER BY event_type, hr
"""


@register(
    "anomaly_rate_bursts",
    oracle=BURSTS_ORACLE,
    tags=("analytics", "events", "window"),
)
def anomaly_rate_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hours whose event count exceeds 3× the
    trailing-24h hourly average (with ≥12 hours of history) — the
    rate-spike alarm. The threshold comparison is cross-multiplied
    (n·prev_n > 3·prev_sum) so it stays pure integer arithmetic —
    no float rate ever computed. Windows run over the hourly
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    trail = hourly.withColumn("prev_sum", F.sum("n").over(w)).withColumn(
        "prev_n", F.count("n").over(w)
    )
    return (
        trail.where(
            (F.col("prev_n") >= 12)
            & (F.col("n") * F.col("prev_n") > 3 * F.col("prev_sum"))
        )
        .select(
            "event_type",
            "hr",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("prev_sum").cast("bigint").alias("trailing_sum"),
            F.col("prev_n").cast("bigint").alias("trailing_hours"),
        )
        .orderBy("event_type", "hr")
    )


INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT o_custkey AS custkey,
         date_diff('day',
           lag(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
)
SELECT custkey,
       CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_days) AS BIGINT) AS min_gap,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap,
       CAST(median(gap_days) AS DOUBLE) AS median_gap
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY custkey ORDER BY custkey
"""


@register(
    "orders_interarrival_gaps",
    oracle=INTERARRIVAL_ORACLE,
    tags=("analytics", "window", "stats"),
)
def orders_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order inter-arrival statistics: day gaps between
    consecutive orders (lag over the SCD2 ordering), min/max/exact
    median — the purchase-cadence feature behind churn models. Gaps
    are exact integer day differences; the median interpolates two
    exact ints identically on any engine. One window shuffle on the
    customer key, aggregation reuses it."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("custkey")
        .agg(
            F.count("gap_days").cast("bigint").alias("n_gaps"),
            F.min("gap_days").cast("bigint").alias("min_gap"),
            F.max("gap_days").cast("bigint").alias("max_gap"),
            F.median("gap_days").cast("double").alias("median_gap"),
        )
        .orderBy("custkey")
    )


SEQ_SUPPORT_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_type, event_id,
         SUM(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS sess_idx
  FROM ordered
), bigrams AS (
  SELECT user_id, sess_idx, event_type AS a,
         lead(event_type) OVER (PARTITION BY user_id, sess_idx
                                ORDER BY ts, event_id) AS b
  FROM sess
)
SELECT a, b,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT (user_id, sess_idx)) AS BIGINT) AS n_sessions
FROM bigrams WHERE b IS NOT NULL
GROUP BY a, b
ORDER BY n_sessions DESC, n_occurrences DESC, a ASC, b ASC
LIMIT 15
"""


@register(
    "sequence_bigram_support",
    oracle=SEQ_SUPPORT_ORACLE,
    tags=("analytics", "events", "window"),
)
def sequence_bigram_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support: consecutive event-type bigrams
    counted by the number of 30-min-gap SESSIONS containing them (the
    support metric of sequence mining) alongside raw occurrences —
    unlike the global transition matrix, support de-duplicates
    repeats within a session. Session ids via the gap-flag cumulative
    sum; per-user windows only; distinct-session counting is one
    two-phase distinct."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = epoch_ms(F.col("ts")) - epoch_ms(F.lag("ts").over(w))
    ordered = ev.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.when(
            gap_ms > 1800000, F.lit(1)
        ).when(F.lag("ts").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "new_sess"
        ),
    )
    sess = ordered.withColumn("sess_idx", F.sum("new_sess").over(w))
    w_s = W.partitionBy("user_id", "sess_idx").orderBy("ts", "event_id")
    bigrams = sess.select(
        "user_id",
        "sess_idx",
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w_s).alias("b"),
    ).where(F.col("b").isNotNull())
    return (
        bigrams.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id", "sess_idx")
            .cast("bigint")
            .alias("n_sessions"),
        )
        .orderBy(
            F.desc("n_sessions"), F.desc("n_occurrences"), F.asc("a"), F.asc("b")
        )
        .limit(15)
    )


# Benford expectations precomputed ONCE driver-side (the quantized-
# constants pattern): no log10 ever runs inside either engine.
import math as _math

_BENFORD = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_VALUES = ", ".join(f"({d}, {p!r})" for d, p in _BENFORD.items())

BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1
), n AS (SELECT COUNT(*) AS n FROM digits),
obs AS (
  SELECT digit, COUNT(*) AS observed FROM digits GROUP BY digit
)
SELECT b.digit,
       CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed,
       FLOOR(b.p * n.n * 1e4 + 0.5) / 1e4 AS expected,
       FLOOR(((COALESCE(o.observed, 0) - b.p * n.n)
              * (COALESCE(o.observed, 0) - b.p * n.n))
             / (b.p * n.n) * 1e6 + 0.5) / 1e6 AS contrib
FROM (SELECT digit, CAST(p AS DOUBLE) AS p
      FROM (VALUES {_BENFORD_VALUES}) t(digit, p)) b
LEFT JOIN obs o ON b.digit = o.digit
CROSS JOIN n
ORDER BY b.digit
"""


@register(
    "stats_benford_digits",
    oracle=BENFORD_ORACLE,
    tags=("stats", "agg"),
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic screen on order totals: observed
    leading-digit counts vs the log-distribution expectation, with
    per-digit χ² contributions. The log10 expectations are computed
    ONCE on the driver and embedded as identical literals in the plan
    AND the generated oracle SQL (the DFT-coefficient pattern), so no
    transcendental runs in either engine. One hash agg over the
    scan."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    n = digits.agg(F.count(F.lit(1)).alias("n"))
    bdf = o.sparkSession.createDataFrame(
        sorted(_BENFORD.items()), "digit int, p double"
    )
    e = F.col("p") * F.col("n")
    return (
        bdf.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("observed", F.lit(0)).cast("bigint").alias("observed"),
            (F.floor(e * 1e4 + F.lit(0.5)) / 1e4).alias("expected"),
            (
                F.floor(
                    (
                        (F.coalesce("observed", F.lit(0)) - e)
                        * (F.coalesce("observed", F.lit(0)) - e)
                    )
                    / e
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("contrib"),
        )
        .orderBy("digit")
    )


SUPPLIER_SHARE_ORACLE = """
WITH srev AS (
  SELECT s.s_nationkey AS nationkey, s.s_suppkey AS suppkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,6))) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), tot AS (
  SELECT nationkey, SUM(r) AS nr FROM srev GROUP BY nationkey
)
SELECT n.n_name AS nation, srev.suppkey,
       CAST(ROUND(srev.r, 2) AS DOUBLE) AS revenue,
       FLOOR(CAST(srev.r AS DOUBLE) / CAST(tot.nr AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS nation_share
FROM srev JOIN tot USING (nationkey)
JOIN nation n ON srev.nationkey = n.n_nationkey
WHERE FLOOR(CAST(srev.r AS DOUBLE) / CAST(tot.nr AS DOUBLE) * 1e6 + 0.5)
        / 1e6 >= 0.2
ORDER BY nation, suppkey
"""


@register(
    "supplier_nation_share",
    oracle=SUPPLIER_SHARE_ORACLE,
    tags=("analytics", "join", "agg"),
)
def supplier_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent: suppliers holding ≥20% of their nation's
    lineitem revenue — the concentration-risk screen. Decimal-exact
    revenues; the nation totals re-aggregate the supplier frame (not
    the fact table) and broadcast back; the share is one rounded
    division."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("r")
        )
    )
    tot = srev.groupBy("nationkey").agg(F.sum("r").alias("nr"))
    share = F.floor(
        F.col("r").cast("double") / F.col("nr").cast("double") * 1e6 + F.lit(0.5)
    ) / 1e6
    return (
        srev.join(F.broadcast(tot), "nationkey")
        .join(
            F.broadcast(nat),
            F.col("nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "suppkey",
            F.round("r", 2).cast("double").alias("revenue"),
            share.alias("nation_share"),
        )
        .where(F.col("nation_share") >= 0.2)
        .orderBy("nation", "suppkey")
    )


EXACT_PCT_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c FROM lineitem
), n AS (
  SELECT COUNT(*) AS n FROM v
), o AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v
), p AS (
  SELECT * FROM (VALUES (50), (90), (99)) AS t(pct)
)
SELECT p.pct,
       CAST((p.pct * n.n + 99) // 100 AS BIGINT) AS rank,
       o.c AS value_cents,
       o.c / 100.0 AS value
FROM p CROSS JOIN n
JOIN o ON o.rn = CAST((p.pct * n.n + 99) // 100 AS BIGINT)
ORDER BY p.pct
"""


@register(
    "stats_exact_percentiles",
    oracle=EXACT_PCT_ORACLE,
    tags=("analytics", "stats", "lineitem"),
)
def stats_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of lineitem extended price WITHOUT a global
    sort — the two-phase count-offset selection a 100 TB column
    needs (a total sort of 100 TB is the single worst operation you
    can schedule; the naive ROW_NUMBER-over-everything form survives
    only as the DuckDB oracle):

    phase 1 — one map-side-combinable hash-agg builds a $100-wide
    bucket histogram of the cents values (~1k buckets regardless of
    row count; collected driver-side like the k-means codebook — the
    bounded artifact is the histogram, never the data), and the
    driver walks the cumulative counts to locate, for each requested
    rank ceil(p·n/100), its bucket and within-bucket residual rank;

    phase 2 — ONE re-scan filtered to the ≤3 hit buckets (predicate
    pushed to the parquet scan) ranks each bucket's values with a
    window partitioned by pct and keeps the residual-rank row.

    Shuffle: bucket histogram + a window over ~0.3% of the data.
    Rank semantics = smallest value with ≥ ceil(p·n/100) values ≤ it
    (percentile_disc), integer arithmetic end to end. Eager phase-1
    actions at construction (count + histogram collect) — the
    triangle-census deviation, documented."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
        ).alias("c")
    )
    hist = (
        li.groupBy(F.expr("c div 10000").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
        .collect()
    )
    n = sum(r["cnt"] for r in hist)
    targets = []
    for pct in (50, 90, 99):
        rank = (pct * n + 99) // 100
        cum = 0
        for r in hist:
            if cum + r["cnt"] >= rank:
                targets.append((pct, rank, int(r["bucket"]), rank - cum))
                break
            cum += r["cnt"]
    tdf = spark.createDataFrame(
        targets, "pct int, rank bigint, bucket bigint, resid bigint"
    )
    w = W.partitionBy("pct").orderBy("c")
    return (
        li.withColumn("bucket", F.expr("c div 10000"))
        .join(F.broadcast(tdf), "bucket")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("resid"))
        .select(
            "pct",
            "rank",
            F.col("c").alias("value_cents"),
            (F.col("c") / F.lit(100.0)).alias("value"),
        )
        .orderBy("pct")
    )


ATTRIBUTION_ORACLE = """
WITH t AS (
  SELECT user_id, ts, MAX(event_type) AS channel FROM events
  WHERE event_type IN ('view', 'click') GROUP BY user_id, ts
), p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), a AS (
  SELECT p.user_id, p.ts, t.channel, t.ts AS touch_ts
  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts
)
SELECT CASE WHEN touch_ts IS NOT NULL AND touch_ts >= ts - INTERVAL 1 DAY
            THEN channel ELSE 'unattributed' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM a GROUP BY 1 ORDER BY channel
"""


@register(
    "attribution_last_touch",
    oracle=ATTRIBUTION_ORACLE,
    tags=("analytics", "events", "asof", "join"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent view/click at-or-before it, but only within a
    1-day lookback — outside it the purchase counts as unattributed.
    The core is the as-of join (union + last-ignorenulls window — one
    shuffle keyed on user, no range explosion; operators/joins.py:
    asof_join), the shape that at 100 TB replaces the quadratic
    events×events range join. Touches are pre-deduped to one per
    (user, ts) with a deterministic channel pick (lexicographic max)
    so as-of tie semantics can never diverge between engines."""
    from data_lake_with_spark_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("channel"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    j = asof_join(
        purch,
        touches,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "channel"],
        suffix="_t",
    )
    attributed = F.when(
        F.col("ts_t").isNotNull()
        & (F.col("ts_t") >= F.col("ts") - F.expr("INTERVAL 1 DAY")),
        F.col("channel_t"),
    ).otherwise(F.lit("unattributed"))
    return (
        j.select(attributed.alias("channel"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
        .orderBy("channel")
    )


WEIGHTED_MEDIAN_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), agg AS (
  SELECT returnflag, c, SUM(w) AS w FROM v GROUP BY returnflag, c
), tot AS (
  SELECT returnflag, SUM(w) AS tw FROM agg GROUP BY returnflag
), ranked AS (
  SELECT returnflag, c,
         SUM(w) OVER (PARTITION BY returnflag ORDER BY c
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM agg
)
SELECT r.returnflag,
       CAST(MIN(r.c) AS BIGINT) AS wmedian_cents,
       CAST(t.tw AS BIGINT) AS total_weight
FROM ranked r JOIN tot t USING (returnflag)
WHERE 2 * r.cum >= t.tw
GROUP BY r.returnflag, t.tw
ORDER BY r.returnflag
"""


@register(
    "stats_weighted_median",
    oracle=WEIGHTED_MEDIAN_ORACLE,
    tags=("analytics", "stats", "lineitem"),
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median price per return flag — the robust
    central-tendency statistic builtins don't cover (F.median is
    unweighted): smallest price whose cumulative quantity reaches
    half the group total, integer cross-multiplication (2·cum ≥ tot)
    so there is no division anywhere. The values are pre-aggregated
    per (group, price) BEFORE the window — the cumulative sum runs
    over distinct prices per group, not raw rows, and stays
    hash-partitioned on the group (no global sort; the two-level
    band-carry form drops in if one group's distinct prices ever
    outgrow a partition)."""
    v = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("returnflag"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    agg = v.groupBy("returnflag", "c").agg(F.sum("w").alias("w"))
    tot = agg.groupBy("returnflag").agg(F.sum("w").alias("tw"))
    w = W.partitionBy("returnflag").orderBy("c").rowsBetween(
        W.unboundedPreceding, 0
    )
    ranked = agg.select("returnflag", "c", F.sum("w").over(w).alias("cum"))
    return (
        ranked.join(F.broadcast(tot), "returnflag")
        .where(2 * F.col("cum") >= F.col("tw"))
        .groupBy("returnflag", "tw")
        .agg(F.min("c").cast("bigint").alias("wmedian_cents"))
        .select(
            "returnflag",
            "wmedian_cents",
            F.col("tw").cast("bigint").alias("total_weight"),
        )
        .orderBy("returnflag")
    )


SKEW_PROFILE_ORACLE = """
WITH k AS (
  SELECT o_custkey AS key, COUNT(*) AS c FROM orders GROUP BY o_custkey
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_rows,
         CAST(median(c) AS DOUBLE) AS median_rows,
         CAST(SUM(c) AS BIGINT) AS total_rows
  FROM k
), t AS (
  SELECT key, c, ROW_NUMBER() OVER (ORDER BY c DESC, key ASC) AS r FROM k
)
SELECT s.n_keys, s.max_rows, s.median_rows, s.total_rows,
       FLOOR(s.max_rows / s.median_rows * 1e4 + 0.5) / 1e4 AS skew_ratio,
       CAST(t.key AS BIGINT) AS heaviest_key
FROM s JOIN t ON t.r = 1
"""


@register(
    "dq_join_skew_profile",
    oracle=SKEW_PROFILE_ORACLE,
    tags=("dq", "orders", "skew", "stats"),
)
def dq_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey — the diagnostic
    you run BEFORE a 100 TB shuffle join: per-key row counts (one
    map-side-combinable hash-agg), then max/median/ratio and the
    heaviest key in a second agg over the KEY table (cardinality =
    distinct keys, not rows). A skew_ratio in the tens says salt the
    key or lean on AQE skew-join (operators/skew.py:join_salted_skew
    is the remediation this query justifies); the heaviest key is the
    one to inspect for NULL-surrogate or bot traffic."""
    k = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.median("c").alias("median_rows"),
        F.sum("c").cast("bigint").alias("total_rows"),
    )
    heaviest = (
        k.orderBy(F.desc("c"), "key")
        .limit(1)
        .select(F.col("key").cast("bigint").alias("heaviest_key"))
    )
    return s.crossJoin(F.broadcast(heaviest)).select(
        "n_keys",
        "max_rows",
        "median_rows",
        "total_rows",
        pround(F.col("max_rows") / F.col("median_rows"), 4).alias("skew_ratio"),
        "heaviest_key",
    )


WINSORIZED_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS mu
  FROM events
), n AS (
  SELECT event_type, COUNT(*) AS n FROM v GROUP BY event_type
), o AS (
  SELECT event_type, mu,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY mu) AS rn
  FROM v
), lims AS (
  SELECT o.event_type,
         MIN(CASE WHEN o.rn = (n.n * 5 + 99) // 100 THEN o.mu END) AS lo,
         MIN(CASE WHEN o.rn = (n.n * 95 + 99) // 100 THEN o.mu END) AS hi
  FROM o JOIN n USING (event_type) GROUP BY o.event_type
), w AS (
  SELECT v.event_type,
         LEAST(GREATEST(v.mu, l.lo), l.hi) AS wmu
  FROM v JOIN lims l USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       FLOOR(SUM(wmu) / COUNT(*) / 1e6 * 1e6 + 0.5) / 1e6 AS winsorized_mean
FROM w GROUP BY event_type ORDER BY event_type
"""


@register(
    "stats_winsorized_mean",
    oracle=WINSORIZED_ORACLE,
    tags=("analytics", "stats", "events"),
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95-winsorized mean of event value per type — the robust mean
    that clamps outliers to the exact p5/p95 order statistics instead
    of dropping them. Values are scaled to exact micro-units so the
    clamp bounds are integer order statistics (rank = ceil(p·n/100),
    percentile_disc semantics via an integer cross-multiplied rank)
    and the clamped sum is pure BIGINT; one division at the end,
    floor-rounded. The rank window is per-group (hash-partitioned);
    at data scale the two-phase bucket selection of
    stats_exact_percentiles replaces the within-group ROW_NUMBER
    unchanged."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("mu"),
    )
    n = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("mu")
    o = v.withColumn("rn", F.row_number().over(w))
    lims = (
        o.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.expr("(n * 5 + 99) div 100"), F.col("mu")
                )
            ).alias("lo"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("mu")
                )
            ).alias("hi"),
        )
    )
    return (
        v.join(F.broadcast(lims), "event_type")
        .select(
            "event_type",
            F.least(F.greatest(F.col("mu"), F.col("lo")), F.col("hi")).alias(
                "wmu"
            ),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            pround(
                F.sum("wmu") / F.count(F.lit(1)) / F.lit(1e6), 6
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


SEASONALITY_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         {dsum_sql('value', 2)} AS rev
  FROM events GROUP BY 1
), dw AS (
  SELECT ((dayofweek(day) + 6) % 7) AS dow, rev FROM daily
), per AS (
  SELECT dow, COUNT(*) AS n_days,
         CAST(ROUND(SUM(CAST(rev AS DECIMAL(18,2))), 2) AS DOUBLE) AS tot
  FROM dw GROUP BY dow
), overall AS (
  SELECT CAST(ROUND(SUM(CAST(tot AS DECIMAL(18,2))), 2) AS DOUBLE) AS g_tot,
         SUM(n_days) AS g_days
  FROM per
)
SELECT CAST(dow AS INTEGER) AS dow,
       CAST(n_days AS BIGINT) AS n_days,
       tot AS dow_revenue,
       FLOOR((tot / n_days) / (g_tot / g_days) * 1e6 + 0.5) / 1e6
         AS seasonality_index
FROM per CROSS JOIN overall
ORDER BY dow
"""


@register(
    "timeseries_seasonality_dow",
    oracle=SEASONALITY_ORACLE,
    tags=("analytics", "timeseries", "events"),
)
def timeseries_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality indices (ratio-to-overall-average, the
    first step of classical seasonal decomposition): avg daily revenue
    per weekday ÷ global avg daily revenue. Monday=0 via the
    (dayofweek+6)%7 normalization that absorbs the Spark-Sunday=1 /
    DuckDB-Sunday=0 drift (the F8 lesson). Daily revenue is
    decimal-exact; the two division operands are identical doubles on
    both engines, one floor-round at 1e-6. Two tiny aggs after the
    daily rollup — the 7-row index table broadcasts into any
    downstream normalization."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum(F.col("value"), 2).alias("rev"))
    )
    per = (
        daily.select(
            ((F.dayofweek("day") + 5) % 7).alias("dow"), "rev"
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            # rev values are exact 2-dec doubles; decimal re-accumulation
            # keeps the second-level sum order-independent too
            F.round(F.sum(F.col("rev").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("tot"),
        )
    )
    overall = per.agg(
        F.round(F.sum(F.col("tot").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("g_tot"),
        F.sum("n_days").alias("g_days"),
    )
    return per.crossJoin(F.broadcast(overall)).select(
        F.col("dow").cast("int").alias("dow"),
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("tot").alias("dow_revenue"),
        pround(
            (F.col("tot") / F.col("n_days"))
            / (F.col("g_tot") / F.col("g_days")),
            6,
        ).alias("seasonality_index"),
    ).orderBy("dow")


MODE_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
), r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS rn
  FROM c
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1 ORDER BY user_id
"""


@register(
    "agg_mode_deterministic",
    oracle=MODE_ORACLE,
    tags=("agg", "events", "stats"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a DETERMINISTIC tie-break
    (count desc, then lexicographic) — the grouped exact mode that
    Spark's builtin ``F.mode`` cannot oracle (its tie winner is
    arbitrary). One hash-agg over (user, type) — map-side combinable,
    cardinality |users|·|types| — then a per-user window over at most
    |types| rows; the same count-then-rank shape as one label-
    propagation step."""
    c = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


SPATIAL_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS id,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8)
              AS BIGINT) % 180000000 AS x,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8)
              AS BIGINT) % 360000000 AS y
  FROM customer WHERE c_custkey < 1500
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= 4000000000000
ORDER BY a_id, b_id
"""


@register(
    "spatial_grid_near_pairs",
    oracle=SPATIAL_ORACLE,
    tags=("spatial", "join", "customer"),
)
def spatial_grid_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial near-pair join via GRID-CELL BLOCKING — the geo analog
    of the LSH candidate stage (and the shape S2/H3 cell joins take in
    production): points land in radius-sized cells, one side expands
    to its 3×3 neighborhood, candidates come from a plain hash join on
    the cell key — O(n·9·density), never the n² theta join the DuckDB
    oracle runs — and the verify is exact integer squared distance.
    Coordinates are synthetic micro-degree BIGINTs derived from the
    customer key via the portable md5 family, so both engines compute
    identical points. Every true pair surfaces exactly once
    (expanded-side < home-side id filter)."""
    from data_lake_with_spark_spark.operators.spatial import grid_near_pairs

    def coord(salt: str, mod: int):
        return F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(c_custkey AS STRING),"
            f" '{salt}')), 1, 8), 16, 10) AS BIGINT), {mod})"
        )

    pts = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 1500)
        .select(
            F.col("c_custkey").alias("id"),
            coord("lat", 180000000).alias("x"),
            coord("lon", 360000000).alias("y"),
        )
    )
    return grid_near_pairs(pts, radius=2000000).orderBy("a_id", "b_id")


AB_TEST_ORACLE = """
WITH arms AS (
  SELECT DISTINCT user_id,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'ab1'), 1, 8)
              AS BIGINT) % 2 AS arm
  FROM events
), conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST((SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS conversion_ppm
FROM arms a LEFT JOIN conv c USING (user_id)
GROUP BY arm ORDER BY arm
"""


@register(
    "ab_test_conversion",
    oracle=AB_TEST_ORACLE,
    tags=("analytics", "events", "experiment"),
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CONTENT-ADDRESSED arm assignment:
    users hash into arms via the portable md5 family (stable across
    runs, engines, partitionings — the property an experiment
    assignment must have, and the same discipline as the training
    split), then per-arm distinct users and purchase conversion in
    integer ppm. Pair with stats_chi_square_cells for significance.
    Two distincts + one broadcast-ready left join on user — the
    readout cost is independent of event volume after the distincts."""
    ev = _t(spark, sf_dir, "events")
    arms = ev.select(
        "user_id",
        F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(user_id AS STRING),"
            " 'ab1')), 1, 8), 16, 10) AS BIGINT), 2)"
        ).alias("arm"),
    ).distinct()
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        arms.join(conv, "user_id", "left")
        .groupBy(F.col("arm").cast("bigint").alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0)))
            .cast("bigint")
            .alias("n_converted"),
        )
        .select(
            "arm",
            "n_users",
            "n_converted",
            F.expr("(n_converted * 1000000) div n_users")
            .cast("bigint")
            .alias("conversion_ppm"),
        )
        .orderBy("arm")
    )


PYRAMID_ORACLE = """
WITH pts AS (
  SELECT CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8)
              AS BIGINT) % 180000000 AS x,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8)
              AS BIGINT) % 360000000 AS y
  FROM customer WHERE c_custkey < 1500
)
SELECT * FROM (
  SELECT 0 AS level, x // 10000000 AS cx, y // 10000000 AS cy,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM pts GROUP BY 2, 3
  UNION ALL
  SELECT 1, x // 20000000, y // 20000000, CAST(COUNT(*) AS BIGINT)
  FROM pts GROUP BY 2, 3
  UNION ALL
  SELECT 2, x // 40000000, y // 40000000, CAST(COUNT(*) AS BIGINT)
  FROM pts GROUP BY 2, 3
)
ORDER BY level, cx, cy
"""


@register(
    "spatial_pyramid_rollup",
    oracle=PYRAMID_ORACLE,
    tags=("spatial", "rollup", "customer"),
)
def spatial_pyramid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution spatial tile pyramid (the map-tile / H3
    zoom-level rollup): per-cell point counts at 10°, 20°, and 40°
    resolutions, where ONLY the finest level scans the points — every
    coarser level reaggregates the next-finer CELL table (counts of
    counts; cells nest exactly because resolutions double and the
    nonnegative grid shares an origin). The oracle computes each
    level directly from the points, so parity proves the pyramid is
    losslessly reaggregable — the hypertable-rollup property in two
    dimensions: a 100 TB deployment persists the finest tiles (~10⁶×
    smaller than points) and serves every zoom level from them."""

    def coord(salt: str, mod: int):
        return F.expr(
            "pmod(CAST(conv(substring(md5(concat(CAST(c_custkey AS STRING),"
            f" '{salt}')), 1, 8), 16, 10) AS BIGINT), {mod})"
        )

    pts = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 1500)
        .select(
            coord("lat", 180000000).alias("x"),
            coord("lon", 360000000).alias("y"),
        )
    )
    l0 = pts.groupBy(
        F.expr("x div 10000000").alias("cx"),
        F.expr("y div 10000000").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    l1 = l0.groupBy(
        F.expr("cx div 2").alias("cx"), F.expr("cy div 2").alias("cy")
    ).agg(F.sum("n_points").cast("bigint").alias("n_points"))
    l2 = l1.groupBy(
        F.expr("cx div 2").alias("cx"), F.expr("cy div 2").alias("cy")
    ).agg(F.sum("n_points").cast("bigint").alias("n_points"))
    out = (
        l0.select(F.lit(0).alias("level"), "cx", "cy", "n_points")
        .unionByName(l1.select(F.lit(1).alias("level"), "cx", "cy", "n_points"))
        .unionByName(l2.select(F.lit(2).alias("level"), "cx", "cy", "n_points"))
    )
    return out.orderBy("level", "cx", "cy")


CAPPED_FOLD_ORACLE = """
WITH v AS (
  SELECT user_id,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS mu,
         ts, event_id
  FROM events
), folded AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT), list(mu ORDER BY ts, event_id)),
           (acc, x) -> LEAST(GREATEST(acc + x, 0), 50000000000)
         ) AS final_balance
  FROM v GROUP BY user_id
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(final_balance AS BIGINT) AS final_balance
FROM folded ORDER BY user_id
"""


@register(
    "inventory_capped_balance",
    oracle=CAPPED_FOLD_ORACLE,
    tags=("analytics", "events", "arrow", "stateful"),
)
def inventory_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance per user (inventory / credit-limit /
    battery recurrence): balance ← min(max(balance + value, 0), cap)
    in strict (ts, event_id) order — the nonlinear sequential fold no
    window function decomposes, run through the grouped-map Arrow
    seam (operators/grouped.py:capped_running_fold) with integer
    micro-units so the per-group loop is bit-exact against DuckDB's
    list_reduce. The shuffle is one hash partition on the user; each
    group folds locally. cap = 50 000 in value units."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("mu"),
        "ts",
        "event_id",
    )
    from data_lake_with_spark_spark.operators.grouped import capped_running_fold

    return capped_running_fold(
        ev, "user_id", "mu", ["ts", "event_id"], cap=50_000_000_000
    ).orderBy("user_id")


OHLC_ORACLE = """
WITH v AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) AS bar,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS mu,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                            time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar,
       CAST(MAX(CASE WHEN rn_a = 1 THEN mu END) AS BIGINT) AS open_mu,
       CAST(MAX(mu) AS BIGINT) AS high_mu,
       CAST(MIN(mu) AS BIGINT) AS low_mu,
       CAST(MAX(CASE WHEN rn_d = 1 THEN mu END) AS BIGINT) AS close_mu,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM v GROUP BY event_type, bar
ORDER BY event_type, bar
"""


@register(
    "finance_ohlc_hourly",
    oracle=OHLC_ORACLE,
    tags=("analytics", "finance", "events", "window"),
)
def finance_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick bars per event type — open/close are
    argmin/argmax over the UNIQUE (ts, event_id) tuple (min_by/max_by
    with a struct ordinal: the tie-break that makes first/last
    deterministic where a bare min_by(value, ts) is not), high/low
    plain min/max, all in integer micro-units. ONE hash-agg over
    (type, hour) with every accumulator map-side combinable — the
    time-bar shape that at 100 TB replaces a per-bar window sort."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("mu"),
        F.struct("ts", "event_id").alias("ord"),
    )
    return (
        v.groupBy("event_type", "bar")
        .agg(
            F.expr("min_by(mu, ord)").cast("bigint").alias("open_mu"),
            F.max("mu").cast("bigint").alias("high_mu"),
            F.min("mu").cast("bigint").alias("low_mu"),
            F.expr("max_by(mu, ord)").cast("bigint").alias("close_mu"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
        )
        .orderBy("event_type", "bar")
    )


TWAP_ORACLE = """
WITH v AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS mu,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
         ts, event_id
  FROM events
), spans AS (
  SELECT event_type, day, mu,
         COALESCE(
           LEAD(sec) OVER (PARTITION BY event_type, day
                           ORDER BY ts, event_id),
           CAST(FLOOR(epoch(CAST(day AS TIMESTAMP) + INTERVAL 1 DAY)) AS BIGINT)
         ) - sec AS w
  FROM v
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(w) AS BIGINT) AS covered_sec,
       CAST(SUM(mu * w) // SUM(w) AS BIGINT) AS twap_mu
FROM spans GROUP BY event_type, day
HAVING SUM(w) > 0
ORDER BY event_type, day
"""


@register(
    "timeseries_twap_daily",
    oracle=TWAP_ORACLE,
    tags=("analytics", "finance", "timeseries", "events"),
)
def timeseries_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily TIME-WEIGHTED average value per event type (the TWAP /
    sensor-mean semantics where a value holds until the next reading):
    each observation is weighted by the integer seconds until the next
    observation in its (type, day) partition — the last one holds to
    midnight — so irregular sampling can't bias the mean toward burst
    periods. Σ(value·seconds) div Σ(seconds) in pure BIGINT; one lead
    window per (type, day) hash partition, one hash-agg."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("mu"),
        F.unix_timestamp("ts").alias("sec"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("event_type", "day").orderBy("ts", "event_id")
    spans = v.select(
        "event_type",
        "day",
        "mu",
        (
            F.coalesce(
                F.lead("sec").over(w),
                F.unix_timestamp(
                    F.date_add(F.col("day"), 1).cast("timestamp")
                ),
            )
            - F.col("sec")
        ).alias("w"),
    )
    return (
        spans.groupBy("event_type", "day")
        .agg(
            F.sum("w").cast("bigint").alias("covered_sec"),
            F.expr("CAST((SUM(mu * w) div SUM(w)) AS BIGINT)").alias("twap_mu"),
        )
        .where(F.col("covered_sec") > 0)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "covered_sec",
            "twap_mu",
        )
        .orderBy("event_type", "day")
    )
