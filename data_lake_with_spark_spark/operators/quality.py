"""Declarative data-quality expectations over lake tables — the
constraint checks (NOT NULL / UNIQUE / range / ordering / foreign key)
a warehouse enforces at write time, run as queries the lake can afford
at read time (Deequ/Great-Expectations shape, rebuilt as plain
aggregations).

Scale shape: ALL row-local checks on a table fold into ONE aggregate
pass (one scan per TABLE, not per expectation), then unpivot to the
long report form. Uniqueness rides the same agg (count −
count_distinct). The FK check is the only join — a key-only left-anti,
broadcast when the parent's stats allow. A 100 TB suite therefore
costs one scan per table plus one skinny join per FK.

Reference analog: the reference's implicit contracts — surrogate keys
assumed non-null/unique, songplays assumed to hit the songs dim
(/root/reference/etl.py:244-278) — made explicit and countable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cnt_null(col: str) -> Column:
    """NOT NULL expectation: violations = null rows."""
    return F.count_if(F.col(col).isNull())


def cnt_where(bad: Column) -> Column:
    """Row-local invariant: violations = rows matching the BAD
    predicate (range checks, ordering checks)."""
    return F.count_if(bad)


def cnt_dup(*keys: str) -> Column:
    """UNIQUE expectation: rows in excess of one per key. NOTE:
    count_distinct adds a partial-dedup pass inside the same scan."""
    return F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])


def table_expectations(df: DataFrame, specs: list[tuple[str, Column]]) -> DataFrame:
    """Run every (check_name, violation_count_agg) on ONE scan of
    ``df`` and return long-form ``(check_name, n_violations)`` rows."""
    if not specs:
        raise ValueError("empty expectation suite")
    wide = df.agg(*[c.cast("long").alias(name) for name, c in specs])
    pairs = ", ".join(f"'{n}', `{n}`" for n, _ in specs)
    return wide.selectExpr(
        f"stack({len(specs)}, {pairs}) as (check_name, n_violations)"
    )


def fk_expectation(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str],
    check: str,
    parent_keys: list[str] | None = None,
) -> DataFrame:
    """FOREIGN KEY expectation: child rows whose key has no parent
    (orphans), as one long-form row. Key-only left-anti join.
    ``parent_keys`` maps differently-named parent columns (e.g.
    lineitem.l_orderkey → orders.o_orderkey)."""
    pk = parent_keys or keys
    parent_side = parent.select(
        *[F.col(p).alias(c) for p, c in zip(pk, keys)]
    )
    orphans = child.select(*keys).join(parent_side, keys, "left_anti")
    return orphans.agg(
        F.lit(check).alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_violations"),
    )


def union_report(parts: list[DataFrame]) -> DataFrame:
    """Union per-table reports into one suite report."""
    if not parts:
        raise ValueError("empty expectation suite")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Row-level quarantine (the write-path complement of the
    aggregate expectation report): evaluate every (rule_name,
    bad_predicate) per row in ONE map-only pass and split the frame
    into (good, quarantined). Quarantined rows carry a ``_violations``
    array naming every rule they broke — the triage column a repair
    job keys on. No shuffle, no second scan; at 100 TB this is a free
    rider on whatever write was happening anyway (compose with
    write_with_metrics for counted quarantine sinks)."""
    viol = F.array_compact(
        F.array(*[F.when(bad, F.lit(name)) for name, bad in rules])
    )
    tagged = df.withColumn("_violations", viol)
    good = tagged.where(F.size("_violations") == 0).drop("_violations")
    bad = tagged.where(F.size("_violations") > 0)
    return good, bad
