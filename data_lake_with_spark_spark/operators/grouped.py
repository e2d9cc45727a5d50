"""Grouped-map operators (applyInPandas): per-group computations whose
output shape is per-row (the remaining Arrow API surface after
mapInPandas and applyInPandasWithState).

Used where the per-group logic would be awkward as window expressions;
for anything expressible with windows, prefer the JVM-side form (see
``zscore_window`` — the two are differentially tested against each
other).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def zscore_grouped_map(df: DataFrame, key: str, col: str) -> DataFrame:
    """Per-group z-score via applyInPandas (ddof=0). Arrow batches one
    group per call — at scale groups must fit an executor's memory,
    which is the documented applyInPandas contract."""
    out_schema = f"{key} string, {col} double, z double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[col].std(ddof=0)
        z = (pdf[col] - pdf[col].mean()) / std if std > 0 else pdf[col] * 0.0
        return pd.DataFrame({key: pdf[key], col: pdf[col], "z": z})

    return df.select(key, col).groupBy(key).applyInPandas(per_group, out_schema)


def zscore_window(df: DataFrame, key: str, col: str) -> DataFrame:
    """The JVM-side equivalent: window mean/stddev_pop. Same semantics
    (ddof=0), whole-stage-codegen'd, no Python workers."""
    w = W.partitionBy(key)
    mean = F.mean(col).over(w)
    std = F.stddev_pop(col).over(w)
    z = F.when(std > 0, (F.col(col) - mean) / std).otherwise(F.lit(0.0))
    return df.select(key, col, z.alias("z"))


def weighted_mean_udaf():
    """Arrow-batched GROUPED_AGG pandas UDF (the UDAF surface): numpy
    dot over each group's Arrow batch. Registerable in SQL via
    ``spark.udf.register`` too. Like all float UDAFs its sum order is
    partition-dependent — differential-test with allclose, never
    oracle it exactly (plans/parity.py rules)."""
    import numpy as np

    @F.pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        ws = float(np.dot(w, np.ones_like(w)))
        return float(np.dot(v, w) / ws) if ws else float("nan")

    return weighted_mean


def discount_weighted_price(df: DataFrame, key: str, val: str, weight: str) -> DataFrame:
    """groupBy().agg(UDAF) demo: weight-averaged value per key via the
    pandas UDAF, joined to the equivalent native JVM expression
    (sum(v*w)/sum(w)) — two aggregations because Spark disallows mixing
    GROUPED_AGG pandas UDFs with native aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT); callers differential-test the two
    columns."""
    wm = weighted_mean_udaf()
    udaf_side = df.groupBy(key).agg(wm(F.col(val), F.col(weight)).alias("wmean_udaf"))
    native_side = df.groupBy(key).agg(
        (F.sum(F.col(val) * F.col(weight)) / F.sum(F.col(weight))).alias("wmean_native")
    )
    return udaf_side.join(native_side, key)


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_p",
) -> DataFrame:
    """As-of join via COGROUPED applyInPandas — the two-sided Arrow
    seam (groupBy().cogroup()): both sides' rows for one key arrive as
    a pair of pandas frames and pd.merge_asof does the backward
    nearest-at-or-before match. Semantically identical to the
    JVM-side union+last_value asof_join (operators/joins.py) — the
    registry query reuses that oracle verbatim — this form exists for
    per-key logic the window trick can't express (interpolation,
    per-key models, tolerance bands). Arrow batches one key per call;
    each key's rows must fit an executor (the cogroup contract), so
    prefer the JVM form for plain as-of at scale."""
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # Rename right columns BEFORE the cogroup: when both sides derive
    # from the same scan, identically-named attributes share ids and
    # the right side's copy is silently pruned from its pandas frame
    # (observed: right arrived without "ts" in a self-cogroup).
    # Distinct names also free the merge from rename bookkeeping.
    right2 = right.select(
        by, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    )
    out_fields = [f"`{c}` {t}" for c, t in left.dtypes]
    for c in right_cols:
        out_fields.append(f"`{c}{suffix}` {rtypes[c]}")
    schema = ", ".join(out_fields)
    out_cols = [*lcols, *[f"{c}{suffix}" for c in right_cols]]
    rts = f"{right_ts}{suffix}"

    def _null_for(spark_type: str):
        if "timestamp" in spark_type or "date" in spark_type:
            return pd.NaT
        return None

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # a key present on only one side arrives with the other frame
        # empty — emit left rows with null right columns, or nothing
        # when there are no left rows
        if l.empty:
            return pd.DataFrame({c: [] for c in out_cols})
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            out = l.copy()
            for c in right_cols:
                out[f"{c}{suffix}"] = _null_for(rtypes[c])
            return out[out_cols]
        r = r.drop(columns=[by]).sort_values(rts, kind="mergesort")
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=rts,
            direction="backward",
            allow_exact_matches=True,
        )
        return out[out_cols]

    return (
        left.groupBy(by)
        .cogroup(right2.groupBy(by))
        .applyInPandas(merge, schema)
    )


def capped_running_fold(
    df: DataFrame,
    key: str,
    amount_col: str,
    order_cols: list[str],
    cap: int,
) -> DataFrame:
    """Per-group SEQUENTIAL fold with clamping: balance ←
    min(max(balance + amount, 0), cap) applied in ``order_cols``
    order — the inventory / credit-limit / battery-charge recurrence
    that NO window function expresses (the clamp makes each step
    depend nonlinearly on the last, so prefix sums don't decompose).
    This is exactly what the grouped-map Arrow seam is for: one group
    per pandas frame, a tight integer loop inside, shuffle keyed on
    the group — and with integer amounts the fold is bit-exact, so
    even this sequential operator is SQL-oracle-able (DuckDB
    list_reduce over the same ordered list). Returns
    (key, n_events, final_balance) per group."""
    import pandas as pd

    out_schema = f"{key} long, n_events long, final_balance long"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        b = 0
        for v in pdf[amount_col]:
            b = min(max(b + int(v), 0), cap)
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n_events": [len(pdf)], "final_balance": [b]}
        )

    cols = [key, amount_col, *order_cols]
    return df.select(*cols).groupBy(key).applyInPandas(per_group, out_schema)
