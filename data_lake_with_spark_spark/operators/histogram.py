"""Mergeable unit-bucket histograms → quantile estimates.

The scale-correct approximate-quantile design: per-group bucket counts
are bounded, map-side-combinable state that merges across partitions,
days, or micro-batches by bucket-wise ADDITION — so the same
``histogram_quantiles`` read step serves a one-shot batch query
(plans/analytics_ops.py:quantile_fixed_histogram), an incremental
IVM view, and a streaming materialized view
(streaming/materialized.py), all producing identical estimates.
Interpolation inputs are exact integers, so results are deterministic
and fully oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def unit_histogram(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, bucket, cnt): unit-width floor buckets — ONE hash agg
    with map-side partial aggregation; state per group is bounded by
    the value range, not the row count."""
    return df.groupBy(
        group_col, F.floor(value_col).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    group_col: str = "event_type",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bucket_col: str = "bucket",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Quantile estimates from a (group, bucket, cnt) histogram:
    linear interpolation inside the bucket holding ceil(q·N). All
    interpolation inputs are exact integers → deterministic on any
    engine. Returns (group, q, est) with est portable-rounded 1e-6."""
    spark = hist.sparkSession
    w_cum = W.partitionBy(group_col).orderBy(bucket_col)
    cum = hist.withColumn("cum", F.sum(cnt_col).over(w_cum)).withColumn(
        "n", F.sum(cnt_col).over(W.partitionBy(group_col))
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .withColumn("needed", F.ceil(F.col("q") * F.col("n")).cast("bigint"))
        .where(F.col("cum") >= F.col("needed"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(group_col, "q").orderBy(F.asc(bucket_col))
            ),
        )
        .where(F.col("rn") == 1)
    )
    est = F.col(bucket_col) + (
        F.col("needed") - (F.col("cum") - F.col(cnt_col))
    ) * F.lit(1.0) / F.col(cnt_col)
    return hit.select(
        group_col,
        "q",
        (F.floor(est * 1e6 + F.lit(0.5)) / 1e6).alias("est"),
    )
