"""Content-deduplicating corpus ingestion (operators/ingest.py):
batch and streaming forms, idempotence by content rather than key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators import ingest as ING
from data_lake_with_spark_spark.sources import versioned as V


_MTIME_SEQ = [1_700_000_000]


def _pin_replay_order(*dirs):
    """FileStreamSource replays by MODIFICATION TIME; same-millisecond
    writes tie and can replay out of order (the moment-view flake
    class). Pin a strictly increasing mtime on every file of each dir,
    in the order given — call right after writing replay inputs whose
    processing order matters."""
    import os

    for d in dirs:
        for root, _subdirs, files in sorted(os.walk(d)):
            for fn in sorted(files):
                _MTIME_SEQ[0] += 10
                os.utime(
                    os.path.join(root, fn), (_MTIME_SEQ[0], _MTIME_SEQ[0])
                )


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_ingest_drops_exact_and_near_dups_against_corpus(spark, sf_dir, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    seed = docs.where(F.col("doc_id") >= 100)
    V.versioned_append(seed, path)
    n_seed = seed.count()

    fresh = docs.where(F.col("doc_id") < 20)
    exact_dup = (
        docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 110))
        .withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    near_dup = (
        docs.where((F.col("doc_id") >= 110) & (F.col("doc_id") < 115))
        .withColumn("doc_id", F.col("doc_id") + 20_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    batch = fresh.unionByName(exact_dup).unionByName(near_dup)

    n_added = ING.ingest_batch(spark, batch, path, threshold=0.5)
    table = V.versioned_read(spark, path)
    # exact dups die in the fingerprint stage, near dups in the
    # jaccard stage; only the fresh docs (minus any natural near-dups
    # of the seeded corpus) can land
    added_ids = {
        r["doc_id"] for r in table.join(seed, "doc_id", "left_anti").collect()
    }
    assert added_ids <= {r["doc_id"] for r in fresh.collect()}
    assert not any(i >= 10_000 for i in added_ids)
    assert n_added == len(added_ids)
    assert table.count() == n_seed + n_added

    # content idempotence: the same batch under NEW ids appends nothing
    renumbered = batch.withColumn("doc_id", F.col("doc_id") + 500_000)
    assert ING.ingest_batch(spark, renumbered, path, threshold=0.5) == 0
    assert table.count() == n_seed + n_added


def test_ingest_batch_internal_keep_first(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (3, "totally different words in this one right here"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota"),  # near dup of 1
    ]
    batch = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ING.dedup_batch_against_corpus(batch, None, threshold=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_stream_corpus_ingest_content_dedup_across_batches(spark, sf_dir, tmp_path):
    src = str(tmp_path / "incoming")
    path = str(tmp_path / "stream_corpus")
    docs = _docs(spark, sf_dir)
    first = docs.where(F.col("doc_id") < 30)
    # second file: same CONTENT as the first under fresh ids + 5 new docs
    second = (
        first.withColumn("doc_id", F.col("doc_id") + 900_000)
        .unionByName(docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 35)))
    )
    first.coalesce(1).write.parquet(f"{src}/f1")
    second.coalesce(1).write.parquet(f"{src}/f2")
    _pin_replay_order(f"{src}/f1", f"{src}/f2")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = ING.stream_corpus_ingest(stream, path, threshold=0.5, query_name="ci1")
    assert q.awaitTermination(600), 'stream did not terminate'
    table = V.versioned_read(spark, path)
    ids = sorted(r["doc_id"] for r in table.collect())
    # no renumbered duplicate of batch-1 content survived
    assert not any(i >= 900_000 for i in ids)
    # batch-1 survivors present, and the genuinely-new docs of batch 2
    # are present except any that near-dup batch-1 content
    n_first_survivors = ING.dedup_batch_against_corpus(
        first, None, threshold=0.5
    ).count()
    assert len([i for i in ids if i < 30]) == n_first_survivors
    assert table.count() == len(ids)


def test_companioned_corpus_not_retokenized(spark, sf_dir, tmp_path):
    """The perf contract of the companion columns: when every corpus row
    was ingested through ingest_batch, per-batch dedup must not tokenize
    corpus text. Plan-shape check: every corpus parquet scan that reads
    the text column does so only under the pushed IS-NULL legacy filter
    (matched by zero row groups on a fully-companioned corpus); the
    stored-keys scan reads (doc_id, _fp, _shingles) without text."""
    path = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    ING.ingest_batch(spark, docs.where(F.col("doc_id") >= 400), path)
    corpus = V.versioned_read(spark, path)
    assert {ING.FP_COL, ING.SHINGLES_COL} <= set(corpus.columns)
    assert corpus.where(F.col(ING.SHINGLES_COL).isNull()).count() == 0

    batch = spark.createDataFrame(
        [(1, "one fresh little document about nothing in particular")],
        ["doc_id", "text"],
    )
    plan = (
        ING.dedup_batch_against_corpus(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "FileScan parquet" not in line:
            continue
        read_schema = line.split("ReadSchema:")[-1]
        if "text" in read_schema:
            pushed = line.split("PushedFilters:")[-1].split("]")[0]
            assert "IsNull" in pushed, f"corpus text scanned without legacy filter: {line}"


def test_companion_path_matches_recompute_path(spark, sf_dir, tmp_path):
    """Stored-shingle dedup must produce byte-identical survivors to
    recomputing every corpus key from text (the pre-companion path)."""
    path = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    ING.ingest_batch(spark, docs.where(F.col("doc_id") >= 300), path)
    corpus = V.versioned_read(spark, path)

    batch = (
        docs.where(F.col("doc_id") < 20)
        .unionByName(
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 305))
            .withColumn("doc_id", F.col("doc_id") + 50_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra")))
        )
    )
    with_stored = ING.dedup_batch_against_corpus(batch, corpus, threshold=0.5)
    recompute = ING.dedup_batch_against_corpus(
        batch, corpus.drop(ING.FP_COL, ING.SHINGLES_COL), threshold=0.5
    )
    a = sorted(r["doc_id"] for r in with_stored.collect())
    b = sorted(r["doc_id"] for r in recompute.collect())
    assert a == b and len(a) > 0


def test_indexed_ingest_matches_unindexed(spark, sf_dir, tmp_path):
    """The posting-index fast path must admit exactly the same
    survivors as the rebuild path, batch after batch, and its
    candidate join must read the bucketed index without an exchange on
    the index side."""
    docs = _docs(spark, sf_dir)
    p_idx = str(tmp_path / "c_idx")
    p_ref = str(tmp_path / "c_ref")
    batches = [
        docs.where(F.col("doc_id") >= 300),
        docs.where(F.col("doc_id") < 20).unionByName(
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 305))
            .withColumn("doc_id", F.col("doc_id") + 70_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
        ),
        docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)),
    ]
    try:
        for b in batches:
            n_i = ING.ingest_batch_indexed(spark, b, p_idx)
            n_r = ING.ingest_batch(spark, b, p_ref)
            assert n_i == n_r
        ids_i = sorted(r["doc_id"] for r in V.versioned_read(spark, p_idx).collect())
        ids_r = sorted(r["doc_id"] for r in V.versioned_read(spark, p_ref).collect())
        assert ids_i == ids_r

        # plan shape: candidate join reads the bucketed posting table
        # with no Exchange on the index side
        corpus = V.versioned_read(spark, p_idx)
        batch = docs.where(F.col("doc_id") >= 490)
        plan = (
            ING.dedup_batch_against_index(spark, batch, corpus, p_idx)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        tbl = ING.posting_index_name(p_idx)
        idx_scans = [l for l in plan.splitlines() if tbl in l and "FileScan" in l]
        assert idx_scans, "posting index not scanned"
        assert "Bucketed: true" in idx_scans[0], idx_scans[0]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ING.posting_index_name(p_idx)}")
        spark.sql(f"DROP TABLE IF EXISTS {ING.fp_index_name(p_idx)}")


def test_indexed_ingest_bootstraps_index_over_existing_corpus(spark, sf_dir, tmp_path):
    """First indexed call over a corpus that PRE-DATES the index table
    (built via plain ingest_batch) must bootstrap the index from the
    full corpus companions — otherwise earlier corpus rows have no
    postings and their near-duplicates are silently admitted."""
    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "c_boot")
    # corpus exists, index does not
    assert ING.ingest_batch(spark, docs.where(F.col("doc_id") >= 300), path) > 0
    try:
        # near-dups of corpus rows, under fresh ids — plus genuinely new docs
        near = (
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 310))
            .withColumn("doc_id", F.col("doc_id") + 90_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
        )
        fresh = docs.where(F.col("doc_id") < 10)
        n = ING.ingest_batch_indexed(spark, near.unionByName(fresh), path)
        admitted = {
            r["doc_id"]
            for r in V.versioned_read(spark, path)
            .where(F.col("doc_id") >= 90_000)
            .collect()
        }
        assert admitted == set(), f"near-dups admitted past bootstrap: {admitted}"
        assert n <= fresh.count()
        # and the bootstrapped index covers the corpus: it has postings
        # for corpus rows (negative ids), not just this batch's survivors
        idx = spark.table(ING.posting_index_name(path))
        assert idx.where(F.col("id") < -300).count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ING.posting_index_name(path)}")
        spark.sql(f"DROP TABLE IF EXISTS {ING.fp_index_name(path)}")


def test_posting_index_name_encodes_threshold(tmp_path):
    """An index built for one threshold must never be probed for
    another — the prefix length is threshold-dependent."""
    p = str(tmp_path / "c")
    assert ING.posting_index_name(p, 0.5) != ING.posting_index_name(p, 0.7)
    assert ING.posting_index_name(p, 0.5) == ING.posting_index_name(p)


def test_fp_index_exact_stage_no_corpus_exchange(spark, sf_dir, tmp_path):
    """The exact-dedup anti join must read the bucketed fingerprint
    table with no Exchange on the corpus side (ROADMAP item: the
    shingle posting index covered the near stage; _fp bucketing covers
    the exact stage), and indexed survivors must still match the
    rebuild path."""
    docs = _docs(spark, sf_dir)
    p_fp = str(tmp_path / "c_fp")
    p_ref = str(tmp_path / "c_fp_ref")
    try:
        b1 = docs.where(F.col("doc_id") >= 300)
        b2 = docs.where(F.col("doc_id") < 20).unionByName(
            docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 310))
            .withColumn("doc_id", F.col("doc_id") + 80_000)
        )
        for b in [b1, b2]:
            n_i = ING.ingest_batch_indexed(spark, b, p_fp)
            n_r = ING.ingest_batch(spark, b, p_ref)
            assert n_i == n_r
        ids_i = sorted(r["doc_id"] for r in V.versioned_read(spark, p_fp).collect())
        ids_r = sorted(r["doc_id"] for r in V.versioned_read(spark, p_ref).collect())
        assert ids_i == ids_r

        corpus = V.versioned_read(spark, p_fp)
        batch = docs.where(F.col("doc_id") >= 490)
        plan = (
            ING.dedup_batch_against_index(spark, batch, corpus, p_fp)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        tbl = ING.fp_index_name(p_fp)
        fp_scans = [l for l in plan.splitlines() if tbl in l and "FileScan" in l]
        assert fp_scans, "fingerprint index not scanned"
        assert "Bucketed: true" in fp_scans[0], fp_scans[0]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ING.posting_index_name(p_fp)}")
        spark.sql(f"DROP TABLE IF EXISTS {ING.fp_index_name(p_fp)}")


def test_stream_corpus_ingest_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill-and-resume: a checkpointed ingest resumed after new files
    arrive processes ONLY the new files (offsets durable), converges to
    the uninterrupted run's corpus, and a no-new-data resume commits
    nothing."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    path = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    f1 = docs.where(F.col("doc_id") < 20)
    f2 = f1.withColumn("doc_id", F.col("doc_id") + 900_000)  # renumbered dup
    f3 = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 25))

    def make_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    f1.coalesce(1).write.parquet(f"{src}/f1")
    f2.coalesce(1).write.parquet(f"{src}/f2")
    _pin_replay_order(f"{src}/f1", f"{src}/f2")
    ING.stream_corpus_ingest(
        make_stream(), path, threshold=0.5, query_name="ck1", checkpoint=ckpt
    ).awaitTermination(600)
    v_after_first = V.current_version(path)

    # "crash", then new data arrives, then resume with the same checkpoint
    f3.coalesce(1).write.parquet(f"{src}/f3")
    _pin_replay_order(f"{src}/f3")
    ING.stream_corpus_ingest(
        make_stream(), path, threshold=0.5, query_name="ck2", checkpoint=ckpt
    ).awaitTermination(600)
    v_after_resume = V.current_version(path)
    # exactly one new micro-batch (f3) was ingested on resume
    assert v_after_resume == v_after_first + 1

    # uninterrupted reference run over the same three files
    ref = str(tmp_path / "ref_corpus")
    ING.stream_corpus_ingest(
        make_stream(), ref, threshold=0.5, query_name="ref"
    ).awaitTermination(600)
    got = sorted(r["doc_id"] for r in V.versioned_read(spark, path).collect())
    want = sorted(r["doc_id"] for r in V.versioned_read(spark, ref).collect())
    assert got == want
    assert not any(i >= 900_000 for i in got)

    # idle resume: no files left → no new version
    ING.stream_corpus_ingest(
        make_stream(), path, threshold=0.5, query_name="ck3", checkpoint=ckpt
    ).awaitTermination(600)
    assert V.current_version(path) == v_after_resume
