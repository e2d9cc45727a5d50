"""Physical-plan regression tests (SURVEY §4 / the 100 TB posture):
pushdown, pruning, join strategy, top-k, and no-Python-on-hot-paths
must survive refactors — a correct-but-10×-slower plan is a bug."""

from __future__ import annotations

import pytest

from data_lake_with_spark_spark.plans import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_filters_push_to_parquet_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "filter_predicates")
    assert "PushedFilters" in p
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "event_type" in scan and "value" in scan  # both predicates reached the scan


def test_column_pruning_on_wide_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q1_pricing_summary")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    # q1 needs 7 of lineitem's 11 columns; the keys must NOT be read
    assert "l_orderkey" not in scan.split("ReadSchema")[0]
    assert "l_partkey" not in scan.split("ReadSchema")[0]


def test_star_join_broadcasts_dims(spark, sf_dir):
    p = plan_of(spark, sf_dir, "q5_region_year_revenue")
    assert p.count("BroadcastHashJoin") >= 2  # nation/region at minimum


def test_top_k_avoids_global_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_anti_join_is_anti(spark, sf_dir):
    p = plan_of(spark, sf_dir, "join_left_anti_new_rows")
    assert "LeftAnti" in p


@pytest.mark.parametrize("name", ["dedup_embedding_cosine", "vector_near_pairs"])
def test_embedding_near_pairs_has_no_cross_join(spark, sf_dir, name):
    """Embedding near-dup queries must run the LSH-bucketed path: an
    O(n²) cartesian pair-generation would not survive a 100× scale-up."""
    p = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q5_region_year_revenue",
        "time_dimension",
        "epoch_ms_to_timestamp",
        "text_stats",
        "dedup_ngram_jaccard",
        "window_session_5min",
        "chunk_documents",
        "filter_gopher_repetition",
        "pii_redact",
        "dq_expectations",
        "timeseries_resample_locf",
        "sample_stratified_topk",
        "funnel_predicate_stages",
        "join_salted_skew",
    ],
)
def test_no_python_udf_on_hot_paths(spark, sf_dir, name):
    """The reference's biggest inefficiency was a row-at-a-time Python
    UDF on the hot path (etl.py:173). Core queries must stay JVM-side;
    Python (Arrow-vectorized only) is reserved for lsh/ivf/multimodal."""
    p = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_funnel_predicate_pushdown(spark, sf_dir):
    """Predicate funnel stages must push their type/value filters to
    the events scan, not evaluate them post-join."""
    p = plan_of(spark, sf_dir, "funnel_predicate_stages")
    scans = [l for l in p.splitlines() if "FileScan parquet" in l and "events" in l]
    assert scans
    assert any("value" in s.split("PushedFilters")[-1] for s in scans if "PushedFilters" in s)


def test_q6_predicates_reach_scan(spark, sf_dir):
    """q6 is the pushdown showcase: all three predicate columns must
    appear as pushed filters on the lineitem scan."""
    p = plan_of(spark, sf_dir, "q6_forecast_revenue")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    pushed = scan.split("PushedFilters")[1] if "PushedFilters" in scan else ""
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {scan[:300]}"


def test_q2_decorrelated_min_broadcasts(spark, sf_dir):
    """q2's correlated scalar-MIN decorrelates into broadcast joins
    against tiny aggregates/dims — no sort-merge joins should appear."""
    p = plan_of(spark, sf_dir, "q2_min_cost_part")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_shingle_tokenization_not_duplicated(spark, sf_dir):
    """The HOF shingle pipeline must slice the barrier-materialized
    token ATTRIBUTE, never an inlined tokenization — 'slice(split'
    (or slice(filter(split) in the plan means CollapseProject pushed
    the split into the transform lambda: O(tokens²) re-splitting per
    shingle, the measured 6× blowup this design exists to prevent.
    (split may legitimately appear in the scan-side filter/project —
    that's once per row, not once per shingle.)"""
    p = plan_of(spark, sf_dir, "dedup_ngram_jaccard")
    assert "slice(split" not in p and "slice(filter(split" not in p


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """100 TB posture: a selective dim-side filter should inject a
    runtime bloom filter on the fact-scan side of a shuffle join
    (cuts shuffled fact rows before the exchange). Size thresholds are
    lowered because the sf0.01 scan is far below the 10 GiB production
    default — the assertion is about plan shape, not byte counts."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {k: conf.get(k) for k in keys}
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "might_contain" in plan.lower(), plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_rag_ivf_scan_prunes_to_probed_partitions(spark, sf_dir):
    """The IVF layout contract: the retrieval scan must carry a
    list_id partition filter (only probed partition dirs are listed),
    and the pruned partition count must be below the total list count
    (8 landmarks, 2 probes per query over 5 near-identical queries)."""
    p = plan_of(spark, sf_dir, "rag_chunk_retrieval_ivf")
    layout_scans = [
        l for l in p.splitlines()
        if "FileScan parquet" in l and "dlws_rag_ivf_" in l
    ]
    assert layout_scans, "IVF layout scan missing from plan"
    scan = layout_scans[0]
    part = scan.split("PartitionFilters:")[-1].split("]")[0]
    assert "list_id" in part and ("IN" in part or "isin" in part.lower() or "in(" in part.lower()), part


def test_no_unintended_cartesian_anywhere(spark, sf_dir):
    """Registry-wide guard: no query may plan a CartesianProduct or an
    unconditioned BroadcastNestedLoopJoin Cross except the ones whose
    SEMANTICS are a cross join (join_cross; the tiny literal-landmark /
    broadcast-stats cross joins are bounded by construction and
    whitelisted by name). A silent cartesian is the classic
    100TB-killer regression."""
    allowed = {
        "join_cross",              # the operator IS a cross join
        "vector_pca_project",      # 8-row literal landmark/stat frames
        "vector_topk_pca",
        "rag_chunk_retrieval_ivf", # 8-row landmark broadcast
        "dedup_simhash_portable",  # 60-row bit-index broadcast
        "text_bm25_topk",          # broadcast corpus-stats scalar frame
        "scalar_case_when",
    }
    failures = []
    for name in sorted(REGISTRY):
        if name in allowed:
            continue
        try:
            p = plan_of(spark, sf_dir, name)
        except Exception:
            failures.append((name, "ANALYSIS ERROR"))
            continue
        if "CartesianProduct" in p:
            failures.append((name, "CartesianProduct"))
    assert not failures, failures


def test_global_shuffle_never_single_partition(spark, sf_dir):
    """training_global_shuffle's ordering must be per-shard windows:
    a global row_number would plan Exchange SinglePartition — the
    scale-killer the shard partitioning exists to avoid. (The final
    presentation orderBy is allowed to range-partition; only a
    SinglePartition exchange is fatal.)"""
    p = plan_of(spark, sf_dir, "training_global_shuffle")
    assert "SinglePartition" not in p, p


def test_segment_dedup_two_shuffles(spark, sf_dir):
    """dedup_segments_keep_first budgets exactly: one shuffle keyed on
    segment text (winner election) + one keyed on doc (rebuild) + the
    presentation sort — so at most 3 exchanges, none single-partition
    before the final sort."""
    p = plan_of(spark, sf_dir, "dedup_segments_keep_first")
    n_ex = p.count("Exchange hashpartitioning")
    assert n_ex <= 3, p


def test_quarantine_is_map_only(spark, sf_dir):
    """dq_quarantine_rows tags and filters in the scan stage: no hash
    shuffle anywhere (the only exchange is the presentation sort's
    range partitioning)."""
    p = plan_of(spark, sf_dir, "dq_quarantine_rows")
    assert "Exchange hashpartitioning" not in p, p


def test_matryoshka_is_broadcast_only(spark, sf_dir):
    """The coarse pass must be a k-query broadcast compare over the
    scan — at most the single presentation/window exchange, never a
    shuffle of the candidate vectors."""
    p = plan_of(spark, sf_dir, "vector_topk_matryoshka")
    assert "BroadcastExchange" in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "Exchange SinglePartition" not in p, p


def test_kmeans_assignment_never_shuffles_vectors(spark, sf_dir):
    """Lloyd assignment = k broadcast centroids against the scan; the
    only hash exchange allowed is the per-id window/presentation one."""
    p = plan_of(spark, sf_dir, "vector_kmeans_lloyd")
    assert "BroadcastExchange" in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_repeated_spans_shuffle_budget(spark, sf_dir):
    """Span-index build (distinct+count) plus the per-doc aggs: the
    whole query fits in 4 hash exchanges, none single-partition, and
    the index side shuffles 8-byte xxhash64 span keys (the ~10× byte
    cut at scale), not the raw span strings."""
    p = plan_of(spark, sf_dir, "dedup_repeated_spans")
    assert p.count("Exchange hashpartitioning") <= 4, p
    assert "Exchange SinglePartition" not in p, p
    assert "xxhash64" in p, p


def test_streaks_two_shuffles(spark, sf_dir):
    """Gaps-and-islands: one (user, day) distinct + one per-user
    window; nothing else may shuffle."""
    p = plan_of(spark, sf_dir, "streaks_active_days")
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "Exchange SinglePartition" not in p, p


def test_abc_distributed_avoids_global_sort(spark, sf_dir):
    """The two-level ABC may single-partition only the tiny band-total
    frame; the per-part cumsum window must be hash-partitioned on the
    band."""
    p = plan_of(spark, sf_dir, "segment_abc_distributed")
    assert "hashpartitioning(band" in p, p


def test_shuffle_hash_hint_takes_effect(spark, sf_dir):
    """join_hint_shuffle_hash must actually plan a ShuffledHashJoin —
    a silently ignored hint is a perf bug."""
    p = plan_of(spark, sf_dir, "join_hint_shuffle_hash")
    assert "ShuffledHashJoin" in p, p


def test_dynamic_partition_pruning_through_join(spark, sf_dir, tmp_path):
    """Hive-partitioned fact joined to a FILTERED dim on the partition
    column must plan a dynamicpruning subquery on the fact scan — at
    100 TB this is the difference between scanning one partition and
    all of them when the partition predicate only exists on the dim
    side of the join."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table

    path = str(tmp_path / "orders_by_priority")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(path)
    fact = spark.read.parquet(path)
    # The dim must come from DISK with the filter on a NON-join
    # attribute: a constant filter on the join column itself would be
    # propagated statically and never need runtime pruning.
    dim_path = str(tmp_path / "priority_dim")
    (
        fact.select("o_orderpriority")
        .distinct()
        .withColumn(
            "urgency_class",
            F.when(
                F.col("o_orderpriority").startswith("1"), F.lit("high")
            ).otherwise(F.lit("low")),
        )
        .write.parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).where(F.col("urgency_class") == "high")
    j = (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "dynamicpruning" in plan.lower(), plan
    assert j.collect()[0]["n"] > 0


def test_exact_percentiles_plan_shape(spark, sf_dir):
    """The two-phase selection must stay two-phase: the lazy plan is
    one broadcast join of the 3-row target frame plus ONE hash
    exchange (the per-pct window over the hit buckets) — no global
    sort, no single-partition stage, and the ROW_NUMBER-over-
    everything form must never reappear."""
    p = plan_of(spark, sf_dir, "stats_exact_percentiles")
    assert "Exchange SinglePartition" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "BroadcastHashJoin" in p, p


def test_trainset_pipeline_plan_shape(spark, sf_dir):
    """The composed pipeline must keep each stage's physical
    discipline when chained: benchmark gram side broadcast (never a
    shuffled join against the tiny eval set), no sort-merge joins, no
    single-partition exchanges, and the whole five-stage build within
    4 hash exchanges."""
    p = plan_of(spark, sf_dir, "pipeline_trainset_stats")
    assert "Exchange SinglePartition" not in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p
    assert p.count("Exchange hashpartitioning") <= 4, p


def test_spatial_near_pairs_is_cell_equi_join(spark, sf_dir):
    """The spatial candidate stage must be a hash join on the grid
    cell — an O(n²) point-vs-point theta join (BNLJ/cartesian) is the
    scale-killer grid blocking exists to avoid."""
    p = plan_of(spark, sf_dir, "spatial_grid_near_pairs")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
        "ShuffledHashJoin" in p
    ), p


def test_merge_hint_takes_effect(spark, sf_dir):
    """join_hint_merge must actually plan a SortMergeJoin — a
    silently ignored strategy hint is a perf bug."""
    p = plan_of(spark, sf_dir, "join_hint_merge")
    assert "SortMergeJoin" in p, p


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir, tmp_path):
    """AQE skew-join: a join keyed on a deliberately hot key must show
    the skew flag on the sort-merge join in the FINAL adaptive plan
    once thresholds are scaled to the test's data volume — the
    runtime remediation (alongside manual salting in
    operators/skew.py) that keeps one executor from absorbing a hot
    key's entire partition at 100 TB."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    )
    saved = {k: conf.get(k) for k in keys}
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB"
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    # the join feeds a groupBy: splitting the hot partition breaks the
    # reusable output partitioning, so AQE skips the rewrite unless
    # told the extra shuffle is worth it — exactly the production
    # trade-off this flag exists for
    conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        # 500k rows, ~90% on ONE key, with an md5 pad so the hot
        # shuffle partition clears the byte threshold post-compression
        left = spark.range(500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 200)
            .alias("k"),
            F.col("id").alias("payload"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(200).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        j = left.join(right, "k").groupBy("attr").count()
        j.toPandas()
        plan = j._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "isFinalPlan=true" in plan, plan[:1000]
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_reused_exchange_on_identical_subtrees(spark, sf_dir):
    """Diamond plans over the SAME canonical subtree must reuse the
    shuffle (ReusedExchange), not recompute it — the free win that
    renamed projections silently forfeit (ARCHITECTURE.md lesson:
    ReuseExchange needs identical canonical plans)."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table

    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    diamond = agg.unionByName(agg)
    diamond.collect()
    plan = diamond._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan, plan[:3000]


def test_zorder_locality_is_map_side(spark, sf_dir):
    """layout_zorder_locality's docstring claims value-space bucketing
    needs NO window sort: the plan must contain no Window operator —
    the morton key assignment is a broadcast-stats map stage (the only
    SinglePartition exchange allowed is the 1-row min/max stats agg
    itself), ending in one hash-agg."""
    p = plan_of(spark, sf_dir, "layout_zorder_locality")
    assert "Window" not in p, p
    assert "HashAggregate" in p
    # the single-partition exchange must feed the 4-value stats agg,
    # never the full-table side: it may appear at most once
    assert p.count("Exchange SinglePartition") <= 1, p


def test_keyset_pagination_avoids_global_sort(spark, sf_dir):
    """sort_keyset_pagination must plan per-partition top-k merges
    (TakeOrderedAndProject), never a single-partition global sort —
    the whole point of keyset over OFFSET."""
    p = plan_of(spark, sf_dir, "sort_keyset_pagination")
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange SinglePartition" not in p, p


def test_target_encoding_broadcasts_dim_and_prior(spark, sf_dir):
    """feature_target_encoding: the part dim must broadcast onto the
    fact scan (no shuffle of lineitem for the join) and the 1-row
    global prior must come back as a broadcast, not a shuffle."""
    p = plan_of(spark, sf_dir, "feature_target_encoding")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_welch_ttest_single_aggregate(spark, sf_dir):
    """stats_welch_ttest claims ONE conditional-aggregation scan: the
    plan must read events exactly once."""
    p = plan_of(spark, sf_dir, "stats_welch_ttest")
    assert p.count("FileScan parquet") == 1, p


def test_changelog_merge_splits_state_on_touched_keys(spark):
    """compact_changelog's merge claims O(changes) shuffle: prior state
    must split on the batch's key set via semi/anti joins so untouched
    state rows bypass the merge window. The plan must contain exactly
    those joins and exactly ONE Window (over the batch compaction +
    touched-key merge), never a Window over the full unioned state."""
    from data_lake_with_spark_spark.operators.cdc import compact_changelog

    batch_schema = "user_id bigint, event_id bigint, ts bigint, op string, value double"
    b1 = spark.createDataFrame([(1, 10, 100, "I", 1.0), (2, 11, 101, "U", 2.0)], batch_schema)
    state = compact_changelog(None, b1)
    b2 = spark.createDataFrame([(2, 12, 102, "D", None)], batch_schema)
    merged = compact_changelog(state, b2)
    p = merged._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "LeftSemi" in p, p
    assert "LeftAnti" in p, p


def test_funnel_latency_broadcasts_purchases_no_cartesian(spark, sf_dir):
    """funnel_conversion_latency: the range-conditioned signup→purchase
    join must be a broadcast hash join on user_id (range predicate as
    join residual), never a cartesian/nested-loop or a sort-merge."""
    p = plan_of(spark, sf_dir, "funnel_conversion_latency")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_not_in_subquery_plans_broadcast_anti(spark, sf_dir):
    """subquery_not_in_nations: NOT IN over the filtered customer set
    must plan as a broadcast LEFT ANTI on the 25-row nation side."""
    p = plan_of(spark, sf_dir, "subquery_not_in_nations")
    assert "LeftAnti" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_twap_single_scan_single_window(spark, sf_dir):
    """timeseries_twap_daily: one events scan, one window (the lead()
    segment-end), one keyed shuffle feeding it — the time-weighted
    average must not rescan or re-shuffle per day."""
    p = plan_of(spark, sf_dir, "timeseries_twap_daily")
    assert p.count("FileScan parquet") == 1, p
    assert p.count("Window ") == 1, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_ab_conversion_broadcasts_converters(spark, sf_dir):
    """ab_test_conversion: the converted-users side (distinct purchase
    user_ids) must broadcast onto the arm assignment, not shuffle it."""
    p = plan_of(spark, sf_dir, "ab_test_conversion")
    assert "BroadcastHashJoin" in p and "LeftOuter" in p, p
    assert "SortMergeJoin" not in p, p


def test_q20_aggregates_before_joining_dims(spark, sf_dir):
    """q20_heavy_promo_suppliers: the per-(supp,part) quantity rollup
    must reduce lineitem FIRST (one keyed shuffle), then broadcast the
    part and supplier dims onto the reduced frame; the shipdate year
    filter must reach the parquet scan."""
    p = plan_of(spark, sf_dir, "q20_heavy_promo_suppliers")
    scan = next(l for l in p.splitlines() if "lineitem.parquet" in l)
    assert "l_shipdate" in scan.split("ReadSchema")[0], scan
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "SortMergeJoin" not in p, p


def test_fifo_one_window_broadcast_demand(spark, sf_dir):
    """inventory_fifo_allocation: the closed form must cost exactly one
    window over one event_type-keyed shuffle, with per-type demand
    broadcast onto the lots — never a loop, a cartesian, or a second
    window."""
    p = plan_of(spark, sf_dir, "inventory_fifo_allocation")
    assert p.count("Window ") == 1, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_brier_and_kappa_single_scan(spark, sf_dir):
    """Both ML-eval folds derive every hash from event_id in one
    projection: events must be scanned exactly once, reading only the
    event_id column."""
    for name in ("ml_brier_decomposition", "ml_cohens_kappa"):
        p = plan_of(spark, sf_dir, name)
        assert p.count("FileScan parquet") == 1, (name, p)
        scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
        assert "struct<event_id:bigint>" in scan, (name, scan)


def _scans_outside_cache(node) -> int:
    """FileScan count in the executed plan EXCLUDING cached subtrees —
    descends AdaptiveSparkPlanExec/QueryStage wrappers (their
    children() are empty, so a naive walk sees nothing and passes
    vacuously — the first version of this gate did exactly that)."""
    cname = node.getClass().getSimpleName()
    if "InMemoryTableScan" in cname:
        return 0
    if cname == "AdaptiveSparkPlanExec":
        return _scans_outside_cache(node.executedPlan())
    if "QueryStage" in cname:
        return _scans_outside_cache(node.plan())
    n = 1 if cname.startswith("FileSourceScan") else 0
    ch = node.children()
    for i in range(ch.size()):
        n += _scans_outside_cache(ch.apply(i))
    return n


def test_textrank_iteration_reads_cached_edges(spark, sf_dir):
    """text_textrank_keywords fans 5 PageRank rounds out over the edge
    frame: without the cache the corpus re-tokenizes PER ROUND
    (measured: 32 scans). Every file read in the final plan must go
    through InMemoryTableScan — zero FileScans outside cached
    relations."""
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    try:
        df = REGISTRY["text_textrank_keywords"].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        assert _scans_outside_cache(plan) == 0
    finally:
        release_shared_caches()


def test_ktruss_pinned_unroll_reads_cached_edges(spark, sf_dir):
    """graph_ktruss_edges' lazy pinned unroll references the surviving
    edge frame 3× per peel round — uncached, the near-dup generator
    subtree multiplied 3^rounds-fold (measured: 864 scans at
    n_iter=2). Zero FileScans outside cached relations."""
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    try:
        df = REGISTRY["graph_ktruss_edges"].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        assert _scans_outside_cache(plan) == 0
    finally:
        release_shared_caches()


@pytest.mark.parametrize(
    "name",
    [
        "graph_local_clustering",
        "graph_harmonic_centrality",
        "graph_assortativity",
        "graph_link_prediction",
    ],
)
def test_graph_generators_read_cached_edges(spark, sf_dir, name):
    """Round-9 fix for the round-8 scan audit's worst rows: these four
    graph queries reference their candidate-generator subtree
    (co-visitation edges / LSH near-pairs) from several join branches,
    and uncached plans re-derived it per reference
    (local_clustering 94 effective FileScans, harmonic_centrality 48,
    assortativity 24, link_prediction 18). With the shared() lazy
    caches every file read goes through InMemoryTableScan.

    Caches are RELEASED after each case: CacheManager substitutes any
    registered identical subtree into later plans, so a leftover cache
    from case A would hide a removed shared() in case B (these queries
    share byte-identical edge generators)."""
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    try:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        assert _scans_outside_cache(plan) == 0
    finally:
        release_shared_caches()


# ---------------------------------------------------------------------------
# Registry-wide effective-scan budget (round-8 verdict directive #2):
# the 864×-class reused-subtree blowup must never land silently again.
# A query's effective FileScan count (outside cached relations) is
# bounded by ~table-arity times a small join fan-out; the worst
# legitimate row in the round-8 audit was 8
# (interval_max_concurrency — self-join over two event projections).
# Bound 16 = 2× that headroom; raising it for a query requires an
# entry in SCAN_BOUND_OVERRIDES with a written justification.
# ---------------------------------------------------------------------------

SCAN_BOUND_DEFAULT = 16
SCAN_BOUND_OVERRIDES: dict[str, tuple[int, str]] = {
    # name: (bound, justification)
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_effective_scans_bounded(spark, sf_dir, name):
    # release after every case: a leftover registered cache from an
    # earlier case substitutes into later identical subtrees
    # (CacheManager matches plans structurally), which would both hide
    # regressions and accumulate ~371 cache registrations for the rest
    # of the pytest session
    from data_lake_with_spark_spark.operators.plan_cache import (
        release_shared_caches,
    )

    bound, _why = SCAN_BOUND_OVERRIDES.get(name, (SCAN_BOUND_DEFAULT, ""))
    try:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        n = _scans_outside_cache(plan)
    finally:
        release_shared_caches()
    assert n <= bound, (
        f"{name}: {n} effective FileScans outside cached relations "
        f"(bound {bound}) — a reused subtree is being re-derived per "
        f"reference; cache the shared frame via operators.plan_cache.shared"
    )
