"""Time-window aggregations over events (SURVEY §2.8 / E8), batch form.

These are the DuckDB-oracle-checkable equivalents of the Structured
Streaming jobs in ``streaming/jobs.py`` — same window semantics
(tumbling / sliding / session), same aggregates, executed as batch
plans. Spark's ``window()``/``session_window()`` produce identical
results in batch and streaming modes, which is what makes this a valid
differential check for the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.plans.parity import davg, davg_sql, dsum, dsum_sql
from data_lake_with_spark_spark.plans.registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


TUMBLING_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  event_type,
  COUNT(*)                 AS n_events,
  {dsum_sql('value')}     AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register("window_tumbling_hourly", oracle=TUMBLING_ORACLE, tags=("window", "streaming"))
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (streaming-equivalent)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


SLIDING_ORACLE = f"""
WITH starts AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS s, * FROM events
), expanded AS (
  SELECT s AS window_start, event_type, value FROM starts
  UNION ALL
  SELECT s - INTERVAL '30 minutes' AS window_start, event_type, value FROM starts
)
SELECT window_start, event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
FROM expanded
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register("window_sliding_hourly", oracle=SLIDING_ORACLE, tags=("window", "streaming"))
def window_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, 30-minute hop → every event lands
    in exactly 2 windows (the oracle materializes both membership
    copies explicitly)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '5 minutes'
              THEN 0 ELSE 1 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts)                        AS session_start,
       MAX(ts) + INTERVAL '5 minutes' AS session_end,
       COUNT(*)                       AS n_events,
       {dsum_sql('value')}           AS total_value
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register("window_session_5min", oracle=SESSION_ORACLE, tags=("window", "streaming"))
def window_session_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute inactivity gap per user —
    Spark's session_window end = last event + gap, mirrored in the
    oracle's lag/cumsum sessionization."""
    from data_lake_with_spark_spark.operators.plan_cache import shared

    ev = _events(spark, sf_dir)
    # shared() before the presentation sort — same sampling-recompute
    # fix as sessionize_event_paths: the range exchange otherwise
    # re-runs the sort-based session-window merge for its sample pass.
    agg = shared(
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return agg.orderBy("user_id", "session_start")


DAILY_USERS_ORACLE = """
SELECT
  time_bucket(INTERVAL '1 day', ts) AS day_start,
  COUNT(DISTINCT user_id)           AS n_users,
  COUNT(*)                          AS n_events
FROM events
GROUP BY 1
ORDER BY day_start
"""


@register("window_daily_active_users", oracle=DAILY_USERS_ORACLE, tags=("window", "streaming"))
def window_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user rollup (tumbling day windows)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("day_start"), "n_users", "n_events")
        .orderBy("day_start")
    )


HYPERTABLE_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '1 day', ts) AS day,
  event_type,
  COUNT(*) AS n_events,
  {dsum_sql('value')} AS total_value,
  MIN(ts) AS first_ts,
  MAX(ts) AS last_ts
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


@register("rollup_hypertable_daily", oracle=HYPERTABLE_ORACLE, tags=("window", "rollup", "streaming"))
def rollup_hypertable_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: raw events →
    HOURLY pre-aggregate → DAILY answer computed ONLY from the hourly
    rollup (sums of sums, counts of counts, min of mins, max of maxs).
    The oracle computes the daily answer directly from raw events, so
    parity proves the rollup is losslessly reaggregable — the property
    that lets a 100 TB deployment persist the hourly table (~1000×
    smaller), serve coarser windows from it, and merge late partitions
    by re-rolling only the touched hour. Decimal accumulation keeps
    the two-level float sum exactly equal to the one-level sum."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_dec"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").cast("timestamp").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("value_dec"), 2).cast("double").alias("total_value"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .orderBy("day", "event_type")
    )


@register("sketch_hll_daily_union", oracle=None, tags=("sketch", "approx", "streaming"))
def sketch_hll_daily_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pattern (Apache DataSketches HLL via Spark
    builtins): per-day HLL sketches of the active-user set, merged
    with hll_union_agg into one estimate of month-wide distinct users
    — without ever re-touching raw events. This is THE scale pattern
    for distinct-count dashboards: sketches are tiny, associative and
    commutative, so daily partitions roll up in any order; a 100 TB
    deployment stores one sketch per (day, dimension) instead of raw
    ids. Estimate accuracy vs exact distinct is pytest-bounded
    (rows-only here: DuckDB has no compatible HLL)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("users_est"),
        F.sum("exact_daily").alias("sum_daily_exact"),
    )


CMS_ORACLE = r"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), cells AS (
  SELECT t.r AS row,
         CAST(('0x' || substring(md5(tok || '#r' || t.r), 1, 8)) AS BIGINT) % 256 AS col
  FROM toks, range(4) t(r)
), sketch AS (
  SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY row, col
), vocab AS (
  SELECT DISTINCT tok FROM toks
), probes AS (
  SELECT v.tok, t.r AS row,
         CAST(('0x' || substring(md5(v.tok || '#r' || t.r), 1, 8)) AS BIGINT) % 256 AS col
  FROM vocab v, range(4) t(r)
), est AS (
  SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS e
  FROM probes p LEFT JOIN sketch s ON p.row = s.row AND p.col = s.col
  GROUP BY p.tok
), true_counts AS (
  SELECT tok, COUNT(*) AS t FROM toks GROUP BY tok
)
SELECT e.tok, CAST(e.e AS BIGINT) AS est, CAST(t.t AS BIGINT) AS true_cnt
FROM est e JOIN true_counts t USING (tok)
ORDER BY tok
"""


@register("sketch_countmin_tokens", oracle=CMS_ORACLE, tags=("sketch", "approx", "text"))
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter counting (operators/sketches.py):
    the corpus token stream folds into a 4×256 mergeable counter
    table, every vocabulary item is point-estimated (min over its d
    cells), and the estimate sits beside the true count. The hash
    family is md5-derived and engine-portable, so the DuckDB oracle
    rebuilds the IDENTICAL sketch — estimates hash-match exactly,
    proving determinism and the ≥-true bound in one query."""
    from data_lake_with_spark_spark.functions import text as TXT
    from data_lake_with_spark_spark.operators.sketches import cms_build, cms_query

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TXT.tokens("text")).alias("tok"))
    sketch = cms_build(toks, "tok")
    est = cms_query(sketch, toks.distinct(), "tok")
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(true_counts, "tok")
        .select("tok", F.col("est").cast("long"), F.col("true_cnt").cast("long"))
        .orderBy("tok")
    )


HLL_PORTABLE_ORACLE = """
WITH h AS (
  SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS gk,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'hll1'), 1, 8)
              AS BIGINT) AS h
  FROM events
), r AS (
  SELECT gk, h // 268435456 AS reg, h % 268435456 AS suffix FROM h
), rho AS (
  SELECT gk, reg,
         CASE WHEN suffix = 0 THEN 29 ELSE 29 - length(bin(suffix)) END AS rho
  FROM r
), base AS (
  SELECT gk, reg, MAX(rho) AS m FROM rho GROUP BY 1, 2
  UNION ALL
  SELECT 'ALL', reg, MAX(rho) FROM rho GROUP BY reg
), keys AS (
  SELECT DISTINCT gk FROM base
), fullreg AS (
  SELECT k.gk, g.reg, COALESCE(b.m, 0) AS m
  FROM keys k CROSS JOIN (SELECT UNNEST(range(16)) AS reg) g
  LEFT JOIN base b ON b.gk = k.gk AND b.reg = g.reg
), s AS (
  SELECT gk,
         FLOOR((0.673 * 256.0 * 4294967296.0)
               / SUM(CAST(1 AS BIGINT) << CAST(32 - m AS INTEGER))
               * 1e4 + 0.5) / 1e4 AS users_est,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_registers
  FROM fullreg GROUP BY gk
), ex AS (
  SELECT strftime(CAST(date_trunc('day', ts) AS TIMESTAMP), '%Y-%m-%d') AS gk,
         COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY 1
  UNION ALL
  SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
)
SELECT s.gk AS day_key, s.users_est, s.n_zero_registers,
       CAST(ex.exact_users AS BIGINT) AS exact_users
FROM s JOIN ex ON s.gk = ex.gk
ORDER BY day_key
"""


@register(
    "sketch_hll_portable",
    oracle=HLL_PORTABLE_ORACLE,
    tags=("sketch", "approx", "agg"),
)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog (m=16, md5 32-bit hash family): per-day
    distinct-user estimates PLUS the all-days union row ('ALL') merged
    register-wise — proving the sketch algebra — next to the exact
    distinct for error context. Unlike the DataSketches-based
    sketch_hll_daily_union (rows-only; DuckDB can't read its sketch),
    every step here is engine-portable: bin()-string leading-zero
    ranks, register MAX, and the 2^32-scaled EXACT integer sum
    Σ2^(32−M_j), with one final double division — a fully oracled
    approximate-distinct sketch. See operators/sketches.py:
    hll_registers/hll_estimate."""
    from data_lake_with_spark_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    from data_lake_with_spark_spark.operators.plan_cache import shared

    ev = _events(spark, sf_dir)
    keyed = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_key"),
        "user_id",
    )
    # shared(): the per-day register table (days x m rows) feeds both
    # the per-day estimate and the ALL-days register-wise union —
    # uncached, the events scan re-derived per branch (6 effective
    # scans, round-10 audit). The two exact countDistinct passes stay
    # uncached by design: exact per-day counts don't merge into the
    # exact ALL count, so those are genuinely separate aggregations.
    regs = shared(hll_registers(keyed, "user_id", "day_key"))
    all_regs = regs.withColumn("gk", F.lit("ALL"))
    est = hll_estimate(regs.unionByName(all_regs))
    exact = (
        keyed.groupBy(F.col("day_key").alias("gk"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .unionByName(
            keyed.agg(
                F.lit("ALL").alias("gk"),
                F.countDistinct("user_id").alias("exact_users"),
            ).select("gk", "exact_users")
        )
    )
    return (
        est.join(exact, "gk")
        .select(
            F.col("gk").alias("day_key"),
            "users_est",
            "n_zero_registers",
            F.col("exact_users").cast("bigint").alias("exact_users"),
        )
        .orderBy("day_key")
    )


WAU_ORACLE = """
WITH ud AS (
  SELECT DISTINCT event_type, user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), expanded AS (
  SELECT event_type, user_id, day + CAST(i AS INTEGER) AS win_day
  FROM ud, UNNEST(range(7)) AS u(i)
)
SELECT event_type, strftime(win_day, '%Y-%m-%d') AS win_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM expanded
GROUP BY 1, 2
ORDER BY event_type, win_day
"""


@register(
    "window_weekly_active_users",
    oracle=WAU_ORACLE,
    tags=("window", "events", "agg"),
)
def window_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day and event type — the
    sliding-window DISTINCT that plain window frames cannot compute
    (distinct is not subtractable). The scalable shape: collapse to
    distinct (type, user, day) first, replicate each row into the ≤7
    window-days it affects (bounded ×7 explode — never the raw event
    volume), then one distinct-count per (type, window-day). Window
    length scales the replication factor linearly, the classic
    time-decayed-audience trade; sketches (sketch_hll_portable) are
    the sublinear alternative when ×window is too much."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    ).distinct()
    expanded = ud.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    )
    return (
        expanded.groupBy(
            "event_type",
            F.date_format("win_day", "yyyy-MM-dd").alias("win_day"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .orderBy("event_type", "win_day")
    )


BITMAP_DISTINCT_ORACLE = """
WITH chunks AS (
  SELECT event_type, user_id // 32 AS chunk,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bits
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_users,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM chunks GROUP BY event_type ORDER BY event_type
"""


@register(
    "agg_bitmap_distinct_users",
    oracle=BITMAP_DISTINCT_ORACLE,
    tags=("agg", "sketch", "events"),
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through mergeable bitmaps (the
    roaring-bitmap warehouse pattern): ids land in 64-bit chunks via
    bit_or of shifted bits — associative/commutative state like a
    sketch, but exact — then popcounts sum per group. Map-side
    combinable, O(id_range/32) state per group, and chunk bitmaps from
    different partitions/days merge by OR, so incremental and
    streaming distincts come free. The HLL twin
    (sketch_hll_portable) trades exactness for id-range independence;
    this is the right tool when ids are dense integers."""
    ev = _events(spark, sf_dir)
    # exact integer floor-div/pmod (never double `/`): no precision
    # loss past 2^53 and well-defined for negative ids (pmod keeps the
    # shift amount in [0,32); floor-chunk matches the oracle's `//`)
    chunks = ev.groupBy(
        "event_type",
        F.expr("(user_id - pmod(user_id, 32)) div 32").alias("chunk"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 32) AS INT))")
        ).alias("bits")
    )
    return (
        chunks.groupBy("event_type")
        .agg(
            F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        )
        .orderBy("event_type")
    )


@register(
    "window_wau_bitmap",
    oracle=WAU_ORACLE,
    tags=("window", "events", "agg", "sketch"),
)
def window_wau_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME trailing-7-day distinct-actives as
    window_weekly_active_users, through a different physical strategy
    pinned to the IDENTICAL oracle: per-(type, day, chunk) 32-bit user
    bitmaps (the agg_bitmap_distinct_users state), replicated into the
    ≤7 anchor days they serve — replication of BITMAP rows (a handful
    per day), not user-day rows — OR-merged per anchor, popcounted.
    Sliding exact distinct whose shuffled state is O(days ×
    id_range/32) instead of O(user-days × window): the win when
    windows lengthen or users repeat heavily."""
    ev = _events(spark, sf_dir)
    daily = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("di"),
        F.expr("(user_id - pmod(user_id, 32)) div 32").alias("chunk"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 32) AS INT))"
        ).alias("bit"),
    ).groupBy("event_type", "di", "chunk").agg(F.bit_or("bit").alias("bits"))
    spread = daily.select(
        "event_type",
        "chunk",
        "bits",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "di",
    ).select(
        "event_type", "chunk", "bits", (F.col("di") + F.col("k")).alias("anchor")
    )
    merged = spread.groupBy("event_type", "anchor", "chunk").agg(
        F.bit_or("bits").alias("wbits")
    )
    return (
        merged.groupBy(
            "event_type",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("anchor").cast("int")),
                "yyyy-MM-dd",
            ).alias("win_day"),
        )
        .agg(F.sum(F.bit_count("wbits")).cast("bigint").alias("wau"))
        .orderBy("event_type", "win_day")
    )


THETA_OVERLAP_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type AS gk,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || 'kmv1'), 1, 8)
              AS BIGINT) AS h
  FROM events
), sk AS (
  SELECT gk, h FROM (
    SELECT gk, h, ROW_NUMBER() OVER (PARTITION BY gk ORDER BY h) AS rn FROM h
  ) WHERE rn <= 256
), th AS (
  SELECT gk,
         CASE WHEN COUNT(*) < 256 THEN 4294967296 ELSE MAX(h) END AS theta
  FROM sk GROUP BY gk
), shared AS (
  SELECT a.gk AS ta, b.gk AS tb, a.h AS h
  FROM sk a JOIN sk b ON a.h = b.h AND a.gk < b.gk
), inter AS (
  SELECT s.ta, s.tb, LEAST(x.theta, y.theta) AS theta,
         CAST(COUNT(*) AS BIGINT) AS n_sample
  FROM shared s JOIN th x ON s.ta = x.gk JOIN th y ON s.tb = y.gk
  WHERE s.h < LEAST(x.theta, y.theta)
  GROUP BY s.ta, s.tb, LEAST(x.theta, y.theta)
), na AS (
  SELECT i.ta, i.tb, COUNT(*) AS na
  FROM sk a JOIN inter i ON a.gk = i.ta AND a.h < i.theta
  GROUP BY i.ta, i.tb
), nb AS (
  SELECT i.ta, i.tb, COUNT(*) AS nb
  FROM sk b JOIN inter i ON b.gk = i.tb AND b.h < i.theta
  GROUP BY i.ta, i.tb
)
SELECT i.ta AS type_a, i.tb AS type_b,
       i.n_sample,
       CAST((i.n_sample * 4294967296) // i.theta AS BIGINT) AS est_overlap,
       CAST(((na.na + nb.nb - i.n_sample) * 4294967296) // i.theta AS BIGINT)
         AS est_union,
       CAST((i.n_sample * 1000000) // (na.na + nb.nb - i.n_sample) AS BIGINT)
         AS jaccard_ppm
FROM inter i JOIN na USING (ta, tb) JOIN nb USING (ta, tb)
ORDER BY type_a, type_b
"""


@register(
    "sketch_theta_overlap",
    oracle=THETA_OVERLAP_ORACLE,
    tags=("sketch", "events", "agg"),
)
def sketch_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-set OVERLAP between event types estimated with
    KMV theta sketches (k=256 minimum md5-hash values per set): the
    set-INTERSECTION capability HLL lacks, and the third mergeable-
    sketch family next to HLL and count-min. θ = min of the two
    k-th-smallest hashes, shared-hash sample below θ, estimate =
    |sample|·2³² div θ — integer end to end, so like the portable HLL
    this approximate sketch is itself bit-deterministic and fully
    value-verified — and the same θ-sample algebra yields the UNION
    estimate (|A<θ|+|B<θ|−|∩<θ| scaled by 2³²/θ) and audience
    Jaccard in integer parts-per-million. At 100 TB the pair
    comparison touches k·|types| sketch rows (an equi-join on the
    hash), never the user sets; sketches of shards/days merge by
    keeping the k smallest of the union. Sets smaller than k degrade
    to exact set arithmetic (θ = 2³²)."""
    from data_lake_with_spark_spark.operators.sketches import kmv_overlap, kmv_sketch

    ev = _events(spark, sf_dir)
    sk = kmv_sketch(ev, "user_id", "event_type", k=256)
    return (
        kmv_overlap(sk, k=256)
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n_sample",
            "est_overlap",
            "est_union",
            "jaccard_ppm",
        )
        .orderBy("type_a", "type_b")
    )


USERS_TO_DATE_ORACLE = """
WITH firsts AS (
  SELECT event_type, user_id,
         MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY event_type, user_id
), per_day AS (
  SELECT event_type, first_day AS day, COUNT(*) AS n_new
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_new AS BIGINT) AS n_new_users,
       CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS users_to_date
FROM per_day ORDER BY event_type, day
"""


@register(
    "window_users_to_date",
    oracle=USERS_TO_DATE_ORACLE,
    tags=("window", "events", "agg"),
)
def window_users_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE distinct users per event type by day — the running
    n_unique no window function computes directly. The scalable
    identity: distinct-to-date(d) = Σ first-occurrences ≤ d, so one
    (type, user) min-day agg + one tiny per-day rollup + a cumsum
    over DAYS (hundreds of rows, not user-days) replaces any attempt
    at COUNT(DISTINCT) OVER — state is O(users) in the first agg and
    O(days) after, the exact shape that survives 100 TB of events."""
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_day.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("users_to_date"),
    ).orderBy("event_type", "day")


CALENDAR_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS lo,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS hi
  FROM events
), days AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(EXTRACT(year FROM day) AS INTEGER) AS year,
       CAST(EXTRACT(quarter FROM day) AS INTEGER) AS quarter,
       CAST(EXTRACT(month FROM day) AS INTEGER) AS month,
       CAST(EXTRACT(day FROM day) AS INTEGER) AS dayofmonth,
       CAST((dayofweek(day) + 6) % 7 AS INTEGER) AS dow_monday0,
       CAST(CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS INTEGER)
         AS is_weekend
FROM days ORDER BY day
"""


@register(
    "dim_calendar_spine",
    oracle=CALENDAR_ORACLE,
    tags=("dim", "events", "timeseries"),
)
def dim_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar dimension spanning the fact table's day range —
    the gap-free date spine every reporting join needs (LOCF
    resampling and cohort grids both assume it): one min/max scan,
    then sequence()+explode generates the days table from two scalars
    (never a row-per-day shuffle of the facts). Weekday normalized
    Monday=0 across engine conventions; weekend flag for the
    reporting layer."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    return days.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.year("day").cast("int").alias("year"),
        F.quarter("day").cast("int").alias("quarter"),
        F.month("day").cast("int").alias("month"),
        F.dayofmonth("day").cast("int").alias("dayofmonth"),
        ((F.dayofweek("day") + 5) % 7).cast("int").alias("dow_monday0"),
        F.when(F.dayofweek("day").isin(1, 7), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_weekend"),
    ).orderBy("day")
