"""Model-based differential fuzz of the merge-on-read versioned-table
layer — the storage substrate every streaming materialized view and
maintained state commits through (labels/edges/sigs/pairs tables, the
retractable top-k base, the windowed distinct states).

A random interleaving of the write primitives (merge, delete, upsert,
compaction) runs against a driver-side dict model of last-writer-wins
per-key semantics. After EVERY op the resolved view
(``versioned_read_merged``) must equal the model, and at the end every
HISTORICAL version at or above the compaction base must still resolve
to its op-time model snapshot — i.e. tombstones and compaction must
never change what the latest resolution returns or what time travel
sees.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lake_with_spark_spark.sources import versioned as V

KEYS = ["k"]
SCHEMA = "k bigint, v bigint"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _resolved(spark, path, version=None):
    return {
        (r["k"], r["v"])
        for r in V.versioned_read_merged(spark, path, KEYS, version).collect()
    }


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_versioned_merge_on_read_matches_dict_model(spark, tmp_path_factory, data):
    path = str(tmp_path_factory.mktemp("vfuzz") / "t")
    model: dict[int, int] = {}
    history: list[dict[int, int]] = []  # model snapshot per committed version
    n_ops = data.draw(st.integers(min_value=3, max_value=6), label="n_ops")
    kpool = st.integers(min_value=0, max_value=5)
    vpool = st.integers(min_value=0, max_value=99)
    for i in range(n_ops):
        op = data.draw(
            st.sampled_from(["merge", "merge", "delete", "upsert", "compact"]),
            label=f"op{i}",
        )
        if op in ("delete", "compact") and V.current_version(path) is None:
            continue  # nothing committed yet — nothing to act on
        if op == "merge":
            n = data.draw(st.integers(min_value=1, max_value=3), label=f"n{i}")
            ks = data.draw(
                st.lists(kpool, min_size=n, max_size=n, unique=True),
                label=f"mk{i}",
            )
            vs = data.draw(st.lists(vpool, min_size=n, max_size=n), label=f"mv{i}")
            rows = list(zip(ks, vs))
            V.versioned_merge(_df(spark, rows), path, keys=KEYS)
            model.update(dict(rows))
        elif op == "delete":
            n = data.draw(st.integers(min_value=1, max_value=2), label=f"d{i}")
            ks = data.draw(
                st.lists(kpool, min_size=n, max_size=n, unique=True),
                label=f"dk{i}",
            )
            V.versioned_delete(
                spark, _df(spark, [(k, 0) for k in ks]).select("k"), path, KEYS
            )
            for k in ks:
                model.pop(k, None)
        elif op == "upsert":
            n = data.draw(st.integers(min_value=1, max_value=3), label=f"u{i}")
            ks = data.draw(
                st.lists(kpool, min_size=n, max_size=n, unique=True),
                label=f"uk{i}",
            )
            vs = data.draw(st.lists(vpool, min_size=n, max_size=n), label=f"uv{i}")
            V.versioned_upsert(spark, _df(spark, list(zip(ks, vs))), path, KEYS)
            for k, v in zip(ks, vs):
                model.setdefault(k, v)  # insert-if-absent semantics
        else:
            V.compact(spark, path, keys=KEYS)
        # every primitive above commits exactly one version
        history.append(dict(model))
        assert V.current_version(path) == len(history) - 1
        got = _resolved(spark, path)
        assert got == set(model.items()), f"after op{i}={op}"
    # time travel: EVERY version must still resolve to its op-time
    # snapshot — at or above the compaction base via the snapshot dir,
    # below it by re-unioning the ORIGINAL deltas (still on disk until
    # vacuum)
    for ver, snap in enumerate(history):
        assert _resolved(spark, path, version=ver) == set(snap.items()), (
            f"time travel v{ver} (base {V.compaction_base(path)})"
        )
