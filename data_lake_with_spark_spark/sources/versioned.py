"""Versioned parquet tables: append-delta snapshots with time travel.

A minimal pure-parquet approximation of what Delta/Iceberg's log gives
the lake (those jars aren't in this environment; this keeps the same
read API shape so swapping in Delta is a drop-in):

```
table/
  _v=00000/*.parquet     rows added in version 0
  _v=00001/*.parquet     rows added in version 1
  _LATEST                text file: highest committed version
```

- ``versioned_append(df, path)``  → stages the delta, claims the next
  ``_v=N`` by atomic rename, then advances ``_LATEST`` under a file
  lock (optimistic concurrency: racing writers all commit, each as
  its own version; a crashed write leaves a ``_stage-*`` dir but
  never a torn table; ``expect_version=`` turns the claim into a CAS
  that raises ``ConcurrentWriteError`` on conflict).
- ``versioned_read(spark, path, version=None)`` → union of all delta
  dirs ≤ version (default: ``_LATEST``). Time travel = pass an older
  version.
- ``versioned_upsert(...)`` → left-anti against the CURRENT view then
  append — the reference's incremental protocol (SURVEY §2.5) on a
  versioned table, so every load is also a recoverable snapshot.

Scale notes: deltas keep appends O(new data); compaction (folding old
deltas into one dir) is the same maintenance Delta's OPTIMIZE does.
Updates are ``versioned_merge`` (replace-by-key, resolved at read by
``versioned_read_merged``); deletes are ``versioned_delete``
tombstones resolved the same way, physically erased by
``compact(keys=...)`` + ``vacuum``. Delta MERGE INTO remains the
drop-in upgrade when its jars are available (see operators/cdc.py for
the logical SCD2 form).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


# Column marking a delta row as a merge-on-read DELETE of its key.
TOMBSTONE = "_tombstone"


class ConcurrentWriteError(RuntimeError):
    """A CAS-conditioned commit lost its race: the table advanced past
    the expected version between read and commit (the Delta/Iceberg
    optimistic-concurrency conflict). The staged write was rolled
    back; the caller re-reads and retries."""


class SchemaEnforcementError(ValueError):
    """An append's schema changes the TYPE of an existing column.
    Adding new columns and omitting existing ones are legal evolution
    (``mergeSchema`` reads reconcile them with nulls); a type flip
    would poison every future merged read, so it is rejected at write
    time — Delta's schema-enforcement contract."""


def _latest_path(path: str) -> str:
    return os.path.join(path, "_LATEST")


def _version_dir(path: str, v: int) -> str:
    return os.path.join(path, f"_v={v:05d}")


def current_version(path: str) -> int | None:
    try:
        with open(_latest_path(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


_META_NAME = "_META.json"


def _claimed_versions(path: str) -> list[int]:
    """Version numbers with an existing ``_v=N`` dir — the claimed set,
    which can run ahead of ``_LATEST`` while commits are in flight."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("_v="):
            try:
                out.append(int(n.split("=", 1)[1]))
            except ValueError:
                pass
    return out


def _next_free_version(path: str) -> int:
    cur = current_version(path)
    hi = max(_claimed_versions(path), default=-1)
    if cur is not None:
        hi = max(hi, cur)
    return hi + 1


def _claim_version(path: str, stage: str, expect_version: int | None) -> int:
    """Atomically promote ``stage`` to the next free ``_v=N`` dir.

    ``os.rename`` of a non-empty dir onto an existing one fails, so the
    rename IS the mutual exclusion: of two writers racing for the same
    number, exactly one wins and the loser retries with the next. The
    dir appears fully formed (data + stats manifest + commit meta were
    all staged first), so a reader can never observe a torn version.
    With ``expect_version`` the claim is CAS-conditioned: if the table
    advanced past it, the stage is rolled back and
    ``ConcurrentWriteError`` raised (serializable writers / compaction
    conflict detection). On an object store without atomic dir rename
    this seam is where a commit service goes (Delta on S3 uses
    DynamoDB for exactly this)."""
    while True:
        nxt = _next_free_version(path)
        if expect_version is not None and nxt != expect_version + 1:
            shutil.rmtree(stage, ignore_errors=True)
            raise ConcurrentWriteError(
                f"table at {path} advanced to {nxt - 1}, expected {expect_version}"
            )
        target = _version_dir(path, nxt)
        try:
            os.rename(stage, target)
            return nxt
        except OSError:
            if not os.path.isdir(target):
                raise
            # lost the race for nxt — loop recomputes and tries nxt+1


def _advance_latest(path: str, version: int) -> None:
    """Advance ``_LATEST`` to at least ``version`` (monotonic max) under
    an advisory file lock. Claims are dense — version N is only ever
    claimed after dir N-1 exists — so publishing the max never exposes
    a missing intermediate version; the lock only prevents two
    concurrent committers from ordering their read-max-write sections
    against each other and regressing the watermark."""
    import fcntl

    with open(os.path.join(path, "_COMMIT.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        cur = current_version(path)
        if cur is None or version > cur:
            tmp = _latest_path(path) + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                fh.write(str(version))
            os.replace(tmp, _latest_path(path))  # atomic on POSIX
        fcntl.flock(lock, fcntl.LOCK_UN)


def versioned_schema(spark: SparkSession, path: str, version: int | None = None):
    """The table's merged schema at ``version`` (default latest) — the
    union of all delta schemas up to it, i.e. exactly what
    ``versioned_read`` returns. Time travel to a version before a
    column was added yields the schema without it."""
    return versioned_read(spark, path, version).schema


def _stored_table_schema(path: str) -> dict[str, str] | None:
    """name → dataType.simpleString() for the merged table schema,
    reconstructed from per-version commit metas (no footer reads).
    None when any contributing version predates schema-in-meta."""
    from pyspark.sql import types as T

    latest = current_version(path)
    if latest is None:
        return None
    fields: dict[str, str] = {}
    for i in range(compaction_base(path), latest + 1):
        m = version_meta(path, i)
        if not m or "_schema" not in m:
            return None
        for f in T.StructType.fromJson(json.loads(m["_schema"])):
            fields[f.name] = f.dataType.simpleString()
    return fields


def _check_schema_compatible(df: DataFrame, path: str) -> None:
    if current_version(path) is None:
        return
    existing = _stored_table_schema(path)
    if existing is None:
        existing = {
            f.name: f.dataType.simpleString()
            for f in versioned_read(df.sparkSession, path).schema
        }
    for f in df.schema:
        have = existing.get(f.name)
        if have is not None and have != f.dataType.simpleString():
            raise SchemaEnforcementError(
                f"column {f.name!r}: table has {have}, append has "
                f"{f.dataType.simpleString()} — type changes are not "
                "legal schema evolution (pass enforce_schema=False to "
                "bypass at your own risk)"
            )


def versioned_append(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    collect_stats: bool = False,
    meta: dict | None = None,
    enforce_schema: bool = True,
    expect_version: int | None = None,
) -> int:
    """Write ``df`` as the next version's delta; returns the committed
    version number. ``partition_by`` hive-partitions the version dir
    (partition-pruned reads inside a pinned version — e.g. an IVF
    index layout). ``collect_stats`` records the per-file min/max
    manifest (see write_stats_manifest) for flat dirs — partitioned
    dirs already prune on the partition key. ``meta`` (JSON-able dict)
    is staged into the version dir BEFORE it becomes visible, so it
    commits atomically with the data — the Delta commitInfo analog;
    streaming sinks store the source epoch id there to make replayed
    micro-batches detectable (see streaming/materialized.py).

    Commit protocol (optimistic concurrency): the delta is written to a
    ``_stage-*`` dir, promoted to ``_v=N`` by one atomic rename (losers
    of a claim race retry with the next number — no writer ever blocks
    another, no reader ever sees a torn dir), then ``_LATEST`` advances
    monotonically under a file lock. Concurrent appends therefore all
    commit, each as its own version. ``expect_version`` makes the claim
    a compare-and-swap: commit only as ``expect_version + 1``, else
    roll back the stage and raise ``ConcurrentWriteError`` — the
    serializable mode read-modify-write callers (upsert, compaction)
    use for conflict detection.

    Schema: additive evolution is allowed (new columns appear, omitted
    columns read as null via mergeSchema); changing an existing
    column's type raises ``SchemaEnforcementError`` unless
    ``enforce_schema=False``."""
    os.makedirs(path, exist_ok=True)
    if enforce_schema:
        _check_schema_compatible(df, path)
    stage = os.path.join(path, f"_stage-{uuid.uuid4().hex}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.parquet(stage)
        if table_constraints(path):
            # Validate the STAGED parquet, not the input plan: the
            # check re-reads the just-written columnar files instead of
            # re-running the whole upstream computation a second time
            # (which doubled every constrained append, including each
            # streaming foreachBatch epoch). The explicit schema pins
            # hive partition-column types to the written ones so
            # constraint exprs on partition columns evaluate on the
            # same values the writer saw. A violation aborts the stage
            # before promotion — no version is ever committed.
            _check_constraints(
                df.sparkSession.read.schema(df.schema).parquet(stage), path
            )
        if collect_stats and not partition_by:
            write_stats_manifest(stage)
        full = dict(meta or {})
        # reserved keys: the delta's exact write schema + partition
        # spec, so reads/enforcement never have to re-infer them from
        # footers (and hive partition columns keep their written type
        # instead of being re-inferred, e.g. "02" as int); the commit
        # wall clock enables TIMESTAMP AS OF time travel
        full["_schema"] = df.schema.json()
        full["_partition_by"] = list(partition_by)
        full["_committed_at"] = time.time()
        with open(os.path.join(stage, _META_NAME), "w") as fh:
            json.dump(full, fh)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    nxt = _claim_version(path, stage, expect_version)
    _advance_latest(path, nxt)
    return nxt


def _dir_layout(path: str, version: int) -> list[str]:
    """Partition columns of one version dir: from its commit meta when
    recorded, else detected from hive-style subdirs (pre-meta dirs)."""
    m = version_meta(path, version)
    if m is not None and "_partition_by" in m:
        return list(m["_partition_by"])
    d = _version_dir(path, version)
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return []
    cols = sorted({n.split("=", 1)[0] for n in names if "=" in n and not n.startswith("_")})
    return cols


def version_meta(path: str, version: int | None = None) -> dict | None:
    """The ``meta`` dict committed with ``version`` (default: latest);
    None when the table/version doesn't exist or committed no meta."""
    latest = current_version(path)
    if latest is None:
        return None
    v = latest if version is None else version
    try:
        with open(os.path.join(_version_dir(path, v), _META_NAME)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def versioned_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot view at ``version`` (default latest): union of deltas
    0..version."""
    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise ValueError(f"version {v} out of range [0, {latest}]")
    base = compaction_base(path)
    start = base if v >= base else 0
    dirs = [_version_dir(path, i) for i in range(start, v + 1)]
    specs = [_dir_layout(path, i) for i in range(start, v + 1)]
    if any(s for s in specs):
        # Partition-spec evolution (some deltas hive-partitioned): a
        # single multi-path read would reject the mixed directory
        # structure, so read each version dir with its recorded write
        # schema (partition columns keep their written types instead
        # of being re-inferred) and union by name — missing columns
        # null-fill exactly like the mergeSchema path. Plan carries
        # one scan per delta dir; compaction folds them back to one.
        from pyspark.sql import types as T

        parts = []
        for d, i in zip(dirs, range(start, v + 1)):
            m = version_meta(path, i) or {}
            reader = spark.read.option("mergeSchema", "true")
            if m.get("_schema"):
                reader = reader.schema(
                    T.StructType.fromJson(json.loads(m["_schema"]))
                )
            parts.append(reader.parquet(d))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    # mergeSchema: tombstone deltas carry the extra _tombstone column;
    # without the merge, parquet would pick one file's schema and
    # silently drop columns on mixed tables.
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def versioned_snapshot_dir(path: str, version: int | None = None) -> str:
    """Directory of EXACTLY one committed version — for tables whose
    every version is a self-contained snapshot (index rebuilds,
    compaction outputs) rather than a delta. The returned dir is a
    plain parquet root, so hive partitioning inside it still prunes."""
    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise ValueError(f"version {v} out of range [0, {latest}]")
    return _version_dir(path, v)


def versioned_read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read exactly one version dir (no delta union) — see
    ``versioned_snapshot_dir``."""
    return spark.read.parquet(versioned_snapshot_dir(path, version))


def _base_path(path: str) -> str:
    return os.path.join(path, "_BASE")


def compaction_base(path: str) -> int:
    """Version at which the latest full-snapshot compaction sits;
    reads at or after it start there instead of at delta 0."""
    try:
        with open(_base_path(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def compact(
    spark: SparkSession,
    path: str,
    keys: list[str] | None = None,
    zorder_by: list[str] | None = None,
    n_files: int = 8,
    collect_stats: bool = False,
) -> int:
    """Fold all deltas into one full-snapshot version (what Delta's
    OPTIMIZE does for delta sprawl). The snapshot commits as version
    latest+1 and `_BASE` records it, so post-compaction reads scan one
    dir; time travel to pre-compaction versions still unions the
    original deltas (a vacuum step could prune those after a retention
    window). For merge-on-read tables pass ``keys`` so the snapshot
    resolves last-writer-wins first (compacting a merged table with a
    plain union would resurrect overwritten rows).

    ``zorder_by`` makes the rewrite CLUSTER the snapshot on the
    z-curve over those columns (Delta's OPTIMIZE ZORDER BY): the
    compaction is the natural moment to fix layout, since every row is
    being rewritten anyway. With ``collect_stats`` the new version
    also records the per-file min/max manifest, so post-compaction
    reads via ``versioned_read_range`` skip files in every z-ordered
    dimension. Returns the compacted version number."""
    snapshot_at = current_version(path)
    assert snapshot_at is not None
    if keys is None:
        snapshot = versioned_read(spark, path, version=snapshot_at).cache()
    else:
        snapshot = versioned_read_merged(spark, path, keys, version=snapshot_at).cache()
    snapshot.count()
    stage = os.path.join(path, f"_stage-{uuid.uuid4().hex}")
    try:
        if zorder_by:
            from data_lake_with_spark_spark.operators.zorder import MORTON, with_zorder_key

            (
                with_zorder_key(snapshot, zorder_by)
                .repartitionByRange(n_files, MORTON)
                .sortWithinPartitions(MORTON)
                .drop(MORTON)
                .write.mode("errorifexists")
                .parquet(stage)
            )
        else:
            snapshot.write.mode("errorifexists").parquet(stage)
        if collect_stats:
            write_stats_manifest(stage)
        # Carry the latest version's USER meta keys (e.g. a streaming
        # sink's epoch_id) into the snapshot: the compacted version
        # replaces the deltas as "latest", and a meta without epoch_id
        # would reset applied_epoch() to None — a micro-batch REPLAYED
        # after a compaction would refold instead of being skipped,
        # duplicating state rows.
        carried = {
            k: v
            for k, v in (version_meta(path) or {}).items()
            if not k.startswith("_")
        }
        with open(os.path.join(stage, _META_NAME), "w") as fh:
            json.dump(
                {
                    **carried,
                    "_schema": snapshot.schema.json(),
                    "_partition_by": [],
                },
                fh,
            )
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    finally:
        snapshot.unpersist()
    # CAS on the snapshot's version: an append that committed while the
    # snapshot was being rewritten would be silently erased from the
    # post-compaction base, so the claim aborts instead (Delta OPTIMIZE
    # aborts on the same transactional conflict) — caller retries.
    nxt = _claim_version(path, stage, expect_version=snapshot_at)
    tmp = _base_path(path) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.replace(tmp, _base_path(path))
    _advance_latest(path, nxt)
    return nxt


def vacuum(path: str, stage_retention_s: float = 86_400.0) -> list[int]:
    """Delete delta dirs below the compaction base — after this, time
    travel reaches back only to the base (Delta VACUUM semantics).
    Also removes ``_stage-*`` dirs orphaned by crashed writers once
    they're older than ``stage_retention_s`` (the retention window
    protects writers still staging — same reason Delta VACUUM defaults
    to 7 days). Returns the removed version numbers."""
    import time

    base = compaction_base(path)
    removed = []
    for v in range(base):
        d = _version_dir(path, v)
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed.append(v)
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return removed
    now = time.time()
    for n in names:
        if n.startswith("_stage-"):
            d = os.path.join(path, n)
            try:
                if now - os.path.getmtime(d) >= stage_retention_s:
                    shutil.rmtree(d, ignore_errors=True)
            except FileNotFoundError:
                pass
    return removed


def versioned_history(path: str) -> list[dict]:
    """The table's commit log (the DESCRIBE HISTORY analog): one dict
    per version with row/file/byte counts read from parquet FOOTERS
    (driver-side metadata only — no Spark job, no data scan) plus the
    user commit meta. Reserved meta keys (``_schema``,
    ``_partition_by``) are surfaced as ``n_columns``/``partition_by``
    rather than raw JSON."""
    from pyspark.sql import types as T

    latest = current_version(path)
    if latest is None:
        return []
    import pyarrow.parquet as pq

    out = []
    for v in range(latest + 1):
        d = _version_dir(path, v)
        if not os.path.isdir(d):
            continue  # vacuumed below the compaction base
        n_rows = n_files = n_bytes = 0
        for root, _dirs, files in os.walk(d):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(root, fname)
                n_rows += pq.read_metadata(fpath).num_rows
                n_files += 1
                n_bytes += os.path.getsize(fpath)
        m = version_meta(path, v) or {}
        entry = {
            "version": v,
            "committed_at": version_committed_at(path, v),
            "n_rows": n_rows,
            "n_files": n_files,
            "n_bytes": n_bytes,
            "is_compaction_base": v == compaction_base(path) and v > 0,
            "partition_by": m.get("_partition_by", []),
            "meta": {k: val for k, val in m.items() if not k.startswith("_")},
        }
        if m.get("_schema"):
            entry["n_columns"] = len(
                T.StructType.fromJson(json.loads(m["_schema"])).fields
            )
        out.append(entry)
    return out


def versioned_upsert(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    keys: list[str],
    serializable: bool = False,
    max_retries: int = 5,
) -> tuple[int, int]:
    """Insert-if-absent against the current snapshot, committed as a
    new version. Returns (version, rows_appended); appending zero rows
    still commits a version (an explicit no-op snapshot).

    The read-modify-write is a write-skew window: two concurrent
    upserts of the same key can both anti-join against a snapshot that
    lacks it and both insert. ``serializable=True`` closes it — the
    anti-join is pinned to a snapshot version and the commit is CAS'd
    on that same version, retrying the whole read-modify-write when
    another writer committed in between (Delta MERGE's
    Serializable-isolation behavior)."""
    for _ in range(max_retries):
        snapshot_at = current_version(path)
        candidates = new_rows.dropDuplicates(keys)
        if snapshot_at is not None:
            existing = versioned_read(spark, path, version=snapshot_at).select(*keys)
            candidates = candidates.join(existing, keys, "left_anti")
        candidates = candidates.cache()
        n = candidates.count()
        try:
            v = versioned_append(
                candidates,
                path,
                expect_version=(
                    (-1 if snapshot_at is None else snapshot_at)
                    if serializable
                    else None
                ),
            )
            return v, n
        except ConcurrentWriteError:
            continue
        finally:
            candidates.unpersist()
    raise ConcurrentWriteError(
        f"versioned_upsert: lost the commit race {max_retries} times at {path}"
    )


def versioned_merge(
    changed_rows: DataFrame,
    path: str,
    keys: list[str],
    order_by: str | None = None,
) -> tuple[int, int]:
    """Upsert-with-REPLACE (the update half Delta MERGE adds over
    plain appends): commit the new/changed rows as a delta; key
    resolution happens at read time (``versioned_read_merged``), so a
    merge is O(changed rows) with zero read-modify-write of existing
    data — the merge-on-read strategy (Iceberg MoR / Hudi MOR).
    Returns (version, rows_written).

    A batch with CONFLICTING rows for one key (same key, different
    values) has no well-defined merge result: pass ``order_by`` to
    resolve deterministically (highest value wins per key, ties on the
    key's first-sorted row), else the conflict raises rather than
    silently committing an arbitrary winner. Exact full-row duplicates
    are always collapsed silently."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if order_by is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
        candidates = (
            changed_rows.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        candidates = changed_rows.dropDuplicates(keys)
    candidates = candidates.cache()
    n = candidates.count()
    if order_by is None and changed_rows.dropDuplicates().count() != n:
        candidates.unpersist()
        raise ValueError(
            "versioned_merge: batch has conflicting rows for the same key; "
            "pass order_by= for a deterministic tie-break"
        )
    v = versioned_append(candidates, path)
    candidates.unpersist()
    return v, n


def versioned_changes(
    spark: SparkSession,
    path: str,
    keys: list[str],
    v_from: int,
    v_to: int | None = None,
    include_preimages: bool = False,
) -> DataFrame:
    """Change feed between two snapshots (the Delta Change Data Feed
    analog): one row per key whose RESOLVED STATE differs between
    merged view ``v_from`` and ``v_to`` — post-image columns plus
    ``_change_type`` ∈ {insert, update, delete} (delete rows carry the
    key with null attributes). ``v_from = -1`` means "before the table
    existed" (version 0's rows feed as inserts). Rewrites that leave a
    key's value unchanged are NOT emitted (state-diff semantics).

    With ``include_preimages`` the feed matches Delta CDF's four-type
    shape — updates emit an ``update_preimage`` row (old values) AND
    an ``update_postimage`` row, and delete rows carry their old
    values instead of nulls — which is exactly what downstream
    incremental aggregate maintenance needs (subtract pre, add post;
    see operators/ivm.py).

    Fast path reads only the deltas in (v_from, v_to] — O(changes) —
    and joins their keys against the v_from view for pre-images. When
    a compaction snapshot sits inside the range its dir is a full
    snapshot, not a delta, so the feed falls back to a full outer diff
    of the two merged views — O(table), still correct."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    end = latest if v_to is None else v_to
    if not -1 <= v_from <= end <= latest:
        raise ValueError(f"bad version range [{v_from}, {end}] (latest {latest})")

    post = versioned_read_merged(spark, path, keys, version=end)
    data_cols = [c for c in post.columns if c not in keys]
    pre = (
        versioned_read_merged(spark, path, keys, version=v_from)
        if v_from >= 0
        else post.where(F.lit(False))
    )

    base = compaction_base(path)
    if v_from < base <= end and base != 0:
        # compaction snapshot inside the range → full state diff
        candidates = post.select(
            *keys, *data_cols, F.lit(False).alias("_is_del")
        ).unionByName(
            # keys present before but absent after → deletes
            pre.select(*keys)
            .join(post.select(*keys), keys, "left_anti")
            .select(
                *keys,
                *[F.lit(None).cast(post.schema[c].dataType).alias(c) for c in data_cols],
                F.lit(True).alias("_is_del"),
            )
        )
    else:
        parts = []
        for i in range(v_from + 1, end + 1):
            d = _version_dir(path, i)
            if os.path.isdir(d):
                # read with the delta's RECORDED schema when available:
                # a hive-partitioned delta read bare would re-infer its
                # partition column's type (e.g. "02" as int) and break
                # the key join against the merged pre-image
                from pyspark.sql import types as T

                m = version_meta(path, i) or {}
                reader = spark.read
                if m.get("_schema"):
                    reader = reader.schema(
                        T.StructType.fromJson(json.loads(m["_schema"]))
                    )
                part = reader.parquet(d).withColumn("_v", F.lit(i))
                if TOMBSTONE not in part.columns:
                    part = part.withColumn(TOMBSTONE, F.lit(False))
                parts.append(part)
        if not parts:
            return post.where(F.lit(False)).withColumn(
                "_change_type", F.lit("insert")
            )
        touched = parts[0]
        for p in parts[1:]:
            touched = touched.unionByName(p, allowMissingColumns=True)
        w = Window.partitionBy(*keys).orderBy(F.desc("_v"))
        candidates = (
            touched.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                *keys,
                *data_cols,
                F.coalesce(F.col(TOMBSTONE), F.lit(False)).alias("_is_del"),
            )
        )

    pre_img = pre.select(
        *keys,
        F.struct(*data_cols).alias("_pre_vals"),
        F.lit(True).alias("_existed"),
    )
    joined = candidates.join(pre_img, keys, "left")
    existed = F.coalesce(F.col("_existed"), F.lit(False))
    change = (
        F.when(F.col("_is_del") & existed, F.lit("delete"))
        .when(F.col("_is_del"), F.lit(None))  # delete of an absent key
        .when(~existed, F.lit("insert"))
        .when(
            ~F.struct(*data_cols).eqNullSafe(F.col("_pre_vals")), F.lit("update")
        )
        .otherwise(F.lit(None))  # rewrite with identical values
    )
    tagged = joined.withColumn("_change_type", change).where(
        F.col("_change_type").isNotNull()
    )
    if not include_preimages:
        return tagged.select(*keys, *data_cols, "_change_type")
    pre_cols = [F.col(f"_pre_vals.{c}").alias(c) for c in data_cols]
    post_rows = tagged.where(F.col("_change_type") != "delete").select(
        *keys,
        *data_cols,
        F.when(F.col("_change_type") == "update", F.lit("update_postimage"))
        .otherwise(F.col("_change_type"))
        .alias("_change_type"),
    )
    pre_rows = tagged.where(
        F.col("_change_type").isin("update", "delete")
    ).select(
        *keys,
        *pre_cols,
        F.when(F.col("_change_type") == "update", F.lit("update_preimage"))
        .otherwise(F.lit("delete"))
        .alias("_change_type"),
    )
    return post_rows.unionByName(pre_rows)


def versioned_delete(
    spark: SparkSession, keys_df: DataFrame, path: str, keys: list[str]
) -> tuple[int, int]:
    """Merge-on-read DELETE (the tombstone half of Delta MERGE): commit
    full-schema rows flagged ``_tombstone`` for the given keys as a new
    version — O(deleted keys), zero read-modify-write.
    ``versioned_read_merged`` resolves a tombstoned key to absent; time
    travel to the pre-delete version still sees the rows; and
    ``compact(..., keys=...)`` + ``vacuum`` physically removes the data
    (the retention/right-to-erasure path). Returns
    (version, keys_tombstoned)."""
    from pyspark.sql import functions as F

    current = versioned_read(spark, path)
    tomb = keys_df.select(*keys).dropDuplicates(keys)
    for fld in current.schema.fields:
        if fld.name not in keys and fld.name != TOMBSTONE:
            tomb = tomb.withColumn(fld.name, F.lit(None).cast(fld.dataType))
    ordered = [f.name for f in current.schema.fields if f.name != TOMBSTONE]
    tomb = tomb.select(*ordered).withColumn(TOMBSTONE, F.lit(True)).cache()
    n = tomb.count()
    v = versioned_append(tomb, path)
    tomb.unpersist()
    return v, n


def versioned_read_merged(
    spark: SparkSession, path: str, keys: list[str], version: int | None = None
) -> DataFrame:
    """Snapshot view with last-writer-wins key resolution: for each
    key, the row from the highest version ≤ ``version``. One window
    shuffle on the keys — the read-side cost of merge-on-read, paid
    down by ``compact(..., keys=...)`` exactly like Delta OPTIMIZE
    after MERGE."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise ValueError(f"version {v} out of range [0, {latest}]")
    base = compaction_base(path)
    start = base if v >= base else 0
    parts = []
    for i in range(start, v + 1):
        d = _version_dir(path, i)
        if os.path.isdir(d):
            part = spark.read.parquet(d).withColumn("_v", F.lit(i))
            if TOMBSTONE not in part.columns:
                part = part.withColumn(TOMBSTONE, F.lit(False))
            parts.append(part)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.desc("_v"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(~F.coalesce(F.col(TOMBSTONE), F.lit(False)))
        .drop("_rn", "_v", TOMBSTONE)
    )


# ---------------------------------------------------------------------------
# File-level data skipping (Iceberg manifest analog)
# ---------------------------------------------------------------------------

_STATS_NAME = "_stats.json"


def write_stats_manifest(version_dir: str) -> int:
    """Record per-FILE column min/max for every parquet file in a
    (non-hive-partitioned) version dir, read from parquet FOOTER
    metadata only — no data scan, exactly how Iceberg builds its
    manifests. Columns whose footer lacks usable stats (or whose type
    doesn't serialize) are simply omitted for that file, which the
    pruner treats as "must read" — skipping stays conservative, never
    wrong. Returns the number of files recorded."""
    import pyarrow.parquet as pq

    entries = []
    for name in sorted(os.listdir(version_dir)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(version_dir, name)
        meta = pq.ParquetFile(fpath).metadata
        cols: dict[str, list] = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo, hi = st.min, st.max
                if not isinstance(lo, (int, float, str)) or not isinstance(
                    hi, (int, float, str)
                ):
                    continue
                cname = col.path_in_schema
                if cname in cols:
                    cols[cname] = [min(cols[cname][0], lo), max(cols[cname][1], hi)]
                else:
                    cols[cname] = [lo, hi]
        entries.append({"file": name, "stats": cols})
    tmp = os.path.join(version_dir, _STATS_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(entries, fh)
    os.replace(tmp, os.path.join(version_dir, _STATS_NAME))
    return len(entries)


def _dir_parquet_files(version_dir: str) -> list[str]:
    """Every parquet file under a version dir, RELATIVE to it —
    recursing so hive-partitioned layouts (files nested in key=value
    subdirs) are never silently skipped by a pruned read."""
    out = []
    for root, _dirs, files in os.walk(version_dir):
        for name in files:
            if name.endswith(".parquet"):
                out.append(
                    os.path.relpath(os.path.join(root, name), version_dir)
                )
    return sorted(out)


def _prune_dir(version_dir: str, column: str, lo, hi) -> tuple[list[str], int]:
    """(files to read, total files) for one version dir under the
    range predicate lo ≤ column ≤ hi. Files without a manifest entry
    or without stats for the column are always read."""
    manifest_path = os.path.join(version_dir, _STATS_NAME)
    all_files = _dir_parquet_files(version_dir)
    if not os.path.exists(manifest_path):
        return [os.path.join(version_dir, n) for n in all_files], len(all_files)
    with open(manifest_path) as fh:
        entries = {e["file"]: e["stats"] for e in json.load(fh)}
    keep = []
    for name in all_files:
        st = entries.get(name, {}).get(column)
        if st is None or (st[0] <= hi and st[1] >= lo):
            keep.append(os.path.join(version_dir, name))
    return keep, len(all_files)


def versioned_read_range(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Snapshot read with FILE-LEVEL skipping for lo ≤ column ≤ hi:
    only files whose manifest min/max overlaps the range are opened;
    the exact predicate is still applied on top (skipping prunes I/O,
    never semantics). Returns (df, {"files_read": n, "files_total": m})
    so callers/tests can see the pruning. At 100 TB this is the
    difference between opening every footer on the driver and touching
    only the files a range query needs — pair with
    operators/zorder.py, which is what makes per-file ranges tight in
    the first place."""
    from pyspark.sql import functions as F

    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise ValueError(f"version {v} out of range [0, {latest}]")
    base = compaction_base(path)
    start = base if v >= base else 0
    per_dir: list[tuple[int, list[str]]] = []
    total = 0
    n_files = 0
    for i in range(start, v + 1):
        keep, n = _prune_dir(_version_dir(path, i), column, lo, hi)
        total += n
        n_files += len(keep)
        if keep:
            per_dir.append((i, keep))
    if not per_dir:
        # empty-but-typed frame: read schema from any file of the span
        any_dir = _version_dir(path, start)
        df = spark.read.parquet(any_dir).where(F.lit(False))
    else:
        df = _read_file_groups(spark, path, per_dir)
    df = df.where((F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi)))
    return df, {"files_read": n_files, "files_total": total}


def _read_file_groups(
    spark: SparkSession, path: str, per_dir: list[tuple[int, list[str]]]
) -> DataFrame:
    """Read pruned file subsets grouped by their version dir: each
    group gets its own ``basePath`` (so hive partition values nested
    in key=value subdirs are recovered — a bare multi-file read would
    silently drop the partition column) and its recorded write schema
    when available; groups union by name with null-fill."""
    from pyspark.sql import types as T

    parts = []
    for v, paths in per_dir:
        m = version_meta(path, v) or {}
        reader = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", _version_dir(path, v))
        )
        if m.get("_schema"):
            reader = reader.schema(T.StructType.fromJson(json.loads(m["_schema"])))
        parts.append(reader.parquet(*paths))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


_BLOOM_NAME = "_BLOOM.json"


def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{value}#{i}".encode()).hexdigest()[:8], 16) % m_bits
        for i in range(k)
    ]


def write_bloom_index(
    version_dir: str, column: str, m_bits: int = 4096, k: int = 3
) -> int:
    """Per-FILE Bloom filters for point lookups on a high-cardinality
    column (the Delta bloom-filter-index analog; min/max manifests
    can't prune equality probes on unclustered keys — every file's
    range spans the probe). One m-bit filter per parquet file, built
    from a single-column read, stored as hex in ``_BLOOM.json``
    alongside the stats manifest. md5-derived positions make the
    filter engine-independent and re-buildable anywhere. False
    positives cost only an extra file read; absence proofs are exact,
    so pruning never changes results. Returns the file count."""
    import pyarrow.parquet as pq

    entries = []
    for name in _dir_parquet_files(version_dir):
        fpath = os.path.join(version_dir, name)
        bits = bytearray(m_bits // 8)
        col = pq.read_table(fpath, columns=[column])[column]
        for chunk in col.chunks:
            for v in chunk:
                val = v.as_py()
                if val is None:
                    continue
                for pos in _bloom_positions(val, m_bits, k):
                    bits[pos // 8] |= 1 << (pos % 8)
        entries.append({"file": name, "bloom": bytes(bits).hex()})
    payload = {"column": column, "m_bits": m_bits, "k": k, "files": entries}
    tmp = os.path.join(version_dir, _BLOOM_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(version_dir, _BLOOM_NAME))
    return len(entries)


def versioned_read_point(
    spark: SparkSession, path: str, column: str, value
) -> tuple[DataFrame, dict]:
    """Point lookup ``column == value`` with per-file Bloom pruning:
    version dirs with a matching ``_BLOOM.json`` skip every file whose
    filter proves the value absent; unindexed dirs/files read
    conservatively. Returns (filtered frame, {"files_read",
    "files_total"})."""
    from pyspark.sql import functions as F

    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    base = compaction_base(path)
    per_dir: list[tuple[int, list[str]]] = []
    total = 0
    n_files = 0
    for v in range(base, latest + 1):
        d = _version_dir(path, v)
        names = _dir_parquet_files(d)
        total += len(names)
        idx = None
        try:
            with open(os.path.join(d, _BLOOM_NAME)) as fh:
                idx = json.load(fh)
        except FileNotFoundError:
            pass
        if idx is None or idx.get("column") != column:
            keep = [os.path.join(d, n) for n in names]
        else:
            m_bits, kk = idx["m_bits"], idx["k"]
            blooms = {e["file"]: bytes.fromhex(e["bloom"]) for e in idx["files"]}
            probes = _bloom_positions(value, m_bits, kk)
            keep = []
            for n in names:
                bits = blooms.get(n)
                if bits is None or all(
                    bits[p // 8] & (1 << (p % 8)) for p in probes
                ):
                    keep.append(os.path.join(d, n))
        n_files += len(keep)
        if keep:
            per_dir.append((v, keep))
    info = {"files_read": n_files, "files_total": total}
    if not per_dir:
        empty = versioned_read(spark, path).where(F.lit(False))
        return empty, info
    df = _read_file_groups(spark, path, per_dir)
    return df.where(F.col(column) == F.lit(value)), info


def optimize_table(
    spark: SparkSession,
    path: str,
    keys: list[str] | None = None,
    zorder_by: list[str] | None = None,
    bloom_column: str | None = None,
    max_deltas: int = 8,
    run_vacuum: bool = False,
) -> dict:
    """One-call table maintenance (the OPTIMIZE job a lakehouse runs
    nightly): fold delta sprawl into a compacted snapshot once more
    than ``max_deltas`` dirs serve the current view (stats manifest
    always collected at the rewrite; ``zorder_by`` clusters it),
    refresh the ``bloom_column`` point-lookup index on the base
    snapshot, and optionally vacuum pre-base history + aged write
    stages. Each step is the already-tested primitive; this is the
    orchestration with a report. Raises ConcurrentWriteError if an
    append races the compaction (re-run; Delta OPTIMIZE aborts the
    same way)."""
    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed versions at {path}")
    base = compaction_base(path)
    report: dict = {"compacted": False, "bloom_files": 0, "vacuumed": []}
    if latest - base + 1 > max_deltas:
        cv = compact(spark, path, keys=keys, zorder_by=zorder_by, collect_stats=True)
        report["compacted"] = True
        report["compacted_version"] = cv
        base = cv
    if bloom_column is not None:
        report["bloom_files"] = write_bloom_index(
            _version_dir(path, base), bloom_column
        )
    if run_vacuum:
        report["vacuumed"] = vacuum(path)
    return report


def versioned_clone(src: str, dst: str, version: int | None = None) -> int:
    """Zero-copy fork of a versioned table (the Delta SHALLOW/deep
    CLONE analog, done as a fork): every committed ``_v=K`` delta dir
    with K ≤ ``version`` (default: latest) is recreated under ``dst``
    with HARDLINKED data files — no bytes copied, and unlike a
    path-reference shallow clone, vacuuming the SOURCE can never break
    the clone (the inodes survive until both tables drop them).
    Falls back to a real copy across filesystems.

    The clone preserves full history ≤ version — time travel, change
    feed, and stats/bloom manifests all work identically — and then
    evolves independently: appends/upserts/compaction on either side
    never touch the other. Returns the clone's latest version.

    At 100 TB this is metadata-speed table branching: dev/test forks
    of a production corpus, reproducible training snapshots pinned
    while ingest continues, A/B dedup-policy experiments on one
    physical copy.
    """
    latest = current_version(src)
    if latest is None:
        raise ValueError(f"not a versioned table: {src}")
    v = latest if version is None else int(version)
    if current_version(dst) is not None:
        raise ValueError(f"clone target already exists: {dst}")
    os.makedirs(dst, exist_ok=True)

    def _link_tree(s: str, d: str) -> None:
        os.makedirs(d, exist_ok=True)
        for name in os.listdir(s):
            sp, dp = os.path.join(s, name), os.path.join(d, name)
            if os.path.isdir(sp):
                _link_tree(sp, dp)
            else:
                try:
                    os.link(sp, dp)
                except OSError:
                    shutil.copy2(sp, dp)

    for k in sorted(_claimed_versions(src)):
        if k <= v:
            _link_tree(_version_dir(src, k), _version_dir(dst, k))
    _advance_latest(dst, v)
    return v


def version_committed_at(path: str, version: int) -> float | None:
    """Commit wall-clock (epoch seconds) of ``version``: the
    ``_committed_at`` recorded atomically with the commit, falling
    back to the staged meta file's mtime for tables written before
    the key existed. None when the version dir is gone (vacuumed)."""
    m = version_meta(path, version)
    if m is not None and "_committed_at" in m:
        return float(m["_committed_at"])
    meta_file = os.path.join(_version_dir(path, version), _META_NAME)
    try:
        return os.path.getmtime(meta_file)
    except FileNotFoundError:
        return None


def versioned_read_asof_timestamp(
    spark: SparkSession, path: str, ts: float
) -> DataFrame:
    """TIMESTAMP AS OF time travel (the Delta analog of
    ``versioned_read(version=...)``): snapshot as of wall-clock
    ``ts`` (epoch seconds) — the highest version whose commit time is
    ≤ ts. Commit times are recorded atomically with each commit, so
    the mapping is stable across readers; raises ValueError when the
    table has no version that old (matching Delta's behavior for a
    timestamp before the first commit)."""
    return versioned_read(spark, path, version=resolve_version_asof(path, ts))


def resolve_version_asof(path: str, ts: float) -> int:
    """Highest version committed at or before epoch-seconds ``ts`` —
    the shared TIMESTAMP AS OF resolver for both the plain and the
    merge-on-read readers (pass the result to
    ``versioned_read_merged(version=...)`` for keyed tables)."""
    latest = current_version(path)
    if latest is None:
        raise FileNotFoundError(path)
    pick = None
    for v in range(latest + 1):
        at = version_committed_at(path, v)
        if at is not None and at <= ts:
            pick = v
    if pick is None:
        raise ValueError(
            f"no version of {path} committed at or before {ts}"
        )
    return pick


_CONSTRAINTS_NAME = "_CONSTRAINTS.json"


class ConstraintViolationError(ValueError):
    """An appended batch contains rows violating a table CHECK
    constraint."""


def add_table_constraint(path: str, name: str, sql_expr: str) -> None:
    """Register a CHECK constraint (the Delta ``ALTER TABLE ... ADD
    CONSTRAINT`` analog): ``sql_expr`` is a boolean SQL expression
    every FUTURE appended row must satisfy (existing data is not
    re-validated — match Delta by adding constraints before data, or
    validate a snapshot manually). Constraints live beside ``_LATEST``
    as table-level metadata, not per-version."""
    os.makedirs(path, exist_ok=True)
    cons = table_constraints(path)
    cons[name] = sql_expr
    tmp = os.path.join(path, f"_constraints-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(cons, fh)
    os.replace(tmp, os.path.join(path, _CONSTRAINTS_NAME))


def drop_table_constraint(path: str, name: str) -> None:
    cons = table_constraints(path)
    cons.pop(name, None)
    tmp = os.path.join(path, f"_constraints-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(cons, fh)
    os.replace(tmp, os.path.join(path, _CONSTRAINTS_NAME))


def table_constraints(path: str) -> dict[str, str]:
    try:
        with open(os.path.join(path, _CONSTRAINTS_NAME)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def _check_constraints(df: DataFrame, path: str) -> None:
    """One job validates ALL constraints: a single filtered count of
    rows failing ANY predicate (null = fail, matching Delta: a CHECK
    must evaluate true). Runs against the STAGED delta before it is
    promoted, so a violating batch never becomes a version. Tombstone
    rows (``_tombstone = true``) are EXEMPT: their non-key columns are
    all NULL by construction (versioned_delete/versioned_restore), and
    Delta applies CHECK constraints to inserted data only, never to
    delete markers."""
    from pyspark.sql import functions as F

    cons = table_constraints(path)
    if not cons:
        return
    if TOMBSTONE in df.columns:
        df = df.where(~F.coalesce(F.col(TOMBSTONE), F.lit(False)))
    bad = F.lit(False)
    for expr in cons.values():
        bad = bad | ~F.coalesce(F.expr(expr), F.lit(False))
    n_bad = df.where(bad).limit(1).count()
    if n_bad:
        sample = df.where(bad).limit(3).collect()
        raise ConstraintViolationError(
            f"constraints {list(cons)} violated; sample rows: {sample}"
        )


def versioned_restore(
    spark: SparkSession, path: str, keys: list[str], to_version: int
) -> tuple[int, int, int]:
    """RESTORE TABLE ... TO VERSION AS OF — the Delta analog, built on
    the merge-on-read model: commit ONE new version whose effect makes
    ``versioned_read_merged`` equal the snapshot at ``to_version``.
    History is preserved (time travel before the restore still sees
    the undone states, exactly like Delta RESTORE); the commit is
    O(diff): rows whose current merged value differs from the old
    snapshot are re-appended (last-writer-wins re-asserts the old
    value), keys that did not exist at ``to_version`` get tombstones.
    Returns (version, rows_readded, keys_tombstoned)."""
    from pyspark.sql import functions as F

    old = versioned_read_merged(spark, path, keys, version=to_version)
    cur = versioned_read_merged(spark, path, keys)
    readd = old.exceptAll(cur).withColumn(TOMBSTONE, F.lit(False)).cache()
    tomb = (
        cur.select(*keys)
        .join(old.select(*keys), keys, "left_anti")
        .dropDuplicates(keys)
    )
    for fld in old.schema.fields:
        if fld.name not in keys:
            tomb = tomb.withColumn(fld.name, F.lit(None).cast(fld.dataType))
    ordered = [f.name for f in old.schema.fields]
    tomb = tomb.select(*ordered).withColumn(TOMBSTONE, F.lit(True)).cache()
    n_readd, n_tomb = readd.count(), tomb.count()
    batch = readd.unionByName(tomb)
    v = versioned_append(batch, path, enforce_schema=False)
    readd.unpersist()
    tomb.unpersist()
    return v, n_readd, n_tomb
