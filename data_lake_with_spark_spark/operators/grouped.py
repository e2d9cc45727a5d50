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
