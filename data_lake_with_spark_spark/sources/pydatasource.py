"""Custom connector via the Python DataSource API (Spark 4): a
deterministic synthetic-documents feed with real partition planning
and real filter pushdown.

This is the extension seam a reference user needs for feeds Spark has
no built-in reader for (internal services, bespoke formats): implement
``DataSource``/``DataSourceReader`` in pure Python, register once, and
``spark.read.format("synthetic_docs")`` behaves like any native source
— schema'd, partitioned (one ``InputPartition`` per id-range slice, so
a 1000-executor cluster generates in parallel), and predicate-pruned
(``pushFilters`` narrows the generated ``doc_id`` range BEFORE any row
exists, the same contract parquet's PushedFilters gives a scan).

Rows are a pure function of ``doc_id`` (md5-derived words), so tests
and oracles can recompute any row without reading the source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

_WORDS = [
    "table", "scan", "merge", "window", "batch", "hash", "sort",
    "shuffle", "spark", "value", "row", "key", "join", "filter",
    "group", "order",
]
_LANGS = ["en", "de", "fr", "es"]


def synth_row(doc_id: int) -> tuple[int, str, str]:
    """The deterministic row for ``doc_id`` — shared by the reader and
    by tests/oracles (pure function, no I/O)."""
    h = hashlib.md5(f"synthdoc#{doc_id}".encode()).digest()
    n_tokens = 8 + h[0] % 9
    toks = [_WORDS[h[1 + i % 14] % len(_WORDS)] for i in range(n_tokens)]
    return doc_id, " ".join(toks), _LANGS[h[15] % len(_LANGS)]


class SyntheticDocsDataSource(DataSource):
    """format("synthetic_docs") — options: n (row count, default 100),
    partitions (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100))
        self.n_parts = int(options.get("partitions", 4))
        self.lo = 0
        self.hi = self.n  # exclusive

    def pushFilters(self, filters: Sequence[Filter]) -> Iterable[Filter]:
        """Absorb doc_id range/equality predicates by narrowing the
        generation range; everything else is returned for Spark to
        apply post-scan. Pruning the range is the real thing — rows
        outside it are never generated, not generated-then-dropped."""
        unsupported = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",) or col == "doc_id":
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            unsupported.append(f)
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        span = max(0, self.hi - self.lo)
        n_parts = max(1, min(self.n_parts, span or 1))
        step = (span + n_parts - 1) // n_parts if span else 0
        bounds = []
        for i in range(n_parts):
            lo = self.lo + i * step
            hi = min(self.lo + (i + 1) * step, self.hi)
            if lo < hi or (i == 0 and span == 0):
                bounds.append(InputPartition((lo, hi)))
        return bounds

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            yield synth_row(doc_id)


def register(spark) -> None:
    # pushFilters is gated behind this flag (runtime-settable); without
    # it Spark refuses to plan a reader that implements the method.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    def __init__(self, staged: str, n_rows: int) -> None:
        self.staged = staged
        self.n_rows = n_rows


class JsonlSinkDataSource(DataSource):
    """format("jsonl_sink") — the WRITER half of the connector seam
    (SyntheticDocsDataSource is the reader half): a two-phase-commit
    JSONL sink in pure Python.

    Protocol (the same contract FileFormatWriter gives parquet): each
    task streams its rows to a STAGED ``_tmp-*.jsonl`` file and
    returns a commit message; only the DRIVER's ``commit`` promotes
    staged files to ``part-NNNNN.jsonl`` and writes ``_MANIFEST.json``
    (file list + row counts) — so a failed/aborted job leaves no
    visible output (``abort`` deletes the stages), and a reader that
    honors the manifest never sees a torn write. Options: ``path``
    (required), mode append/overwrite via the save mode."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_sink: option 'path' is required")
        return JsonlWriter(path, [f.name for f in schema.fields], overwrite)


class JsonlWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str], overwrite: bool) -> None:
        self.path = path
        self.columns = columns
        self.overwrite = overwrite

    # -- executor side -----------------------------------------------
    def write(self, iterator) -> JsonlCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self.columns, row))) + "\n")
                n += 1
        return JsonlCommit(staged, n)

    # -- driver side -------------------------------------------------
    def commit(self, messages) -> None:
        import json
        import os

        existing = []
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, name))
        elif os.path.isfile(manifest_path):
            with open(manifest_path) as fh:
                existing = json.load(fh)["files"]
        base = len(existing)
        files = list(existing)
        for i, m in enumerate(messages):
            final = f"part-{base + i:05d}.jsonl"
            os.replace(m.staged, os.path.join(self.path, final))
            files.append({"file": final, "n_rows": m.n_rows})
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"files": files, "n_rows": sum(f["n_rows"] for f in files)}, fh
            )
        os.replace(tmp, manifest_path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.isfile(m.staged):
                os.remove(m.staged)
