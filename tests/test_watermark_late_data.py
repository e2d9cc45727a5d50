"""Watermark semantics: late data beyond the watermark is dropped from
append-mode windowed aggregation (the property that bounds streaming
state at scale). Batch files are fed one micro-batch at a time so the
watermark advances deterministically between them."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_with_spark_spark.functions.time import normalize_ts

# This test writes its own feed with ts as epoch-NANOS long (the old
# encoding), so the declared stream schema is long — and normalize_ts
# must handle it (bigint branch).
NANOS_LONG_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _write_events(path, rows):
    # columns mirror events.parquet: ts as epoch-NANOS long
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [int(pd.Timestamp(r[1]).value) for r in rows],
            "user_id": [1] * len(rows),
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    _write_events(str(src / "b1.parquet"), [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:59:00"),
    ])

    raw = (
        spark.readStream.schema(NANOS_LONG_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    stream = normalize_ts(raw, "ts")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark ≈ 10:49
        # batch 2: one row far beyond the watermark (08:30) + one fresh
        _write_events(str(src / "b2.parquet"), [
            (3, "2024-01-01 08:30:00"),  # LATE: must be dropped
            (4, "2024-01-01 12:00:00"),  # advances watermark to 11:50
        ])
        q.processAllAvailable()
        # one empty commit so the 10:00 window (end 11:00 ≤ wm 11:50) emits
        _write_events(str(src / "b3.parquet"), [(5, "2024-01-01 12:01:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["ws"].isoformat(): r["n"] for r in spark.sql("SELECT * FROM late_test").collect()}
    assert "2024-01-01T10:00:00" in out and out["2024-01-01T10:00:00"] == 2
    # the late 08:30 row produced NO window — dropped, not resurrected
    assert not any(ws.startswith("2024-01-01T08") for ws in out)
    # the 12:00 window is still open (watermark hasn't passed its end)
    assert not any(ws.startswith("2024-01-01T12") for ws in out)
