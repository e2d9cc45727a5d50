"""functions/time.normalize_ts must give identical TIMESTAMP values for
every physical encoding the driver has shipped events.ts in — the
failure class that broke round 3 (nanos-as-long assumption vs
timestamp[us] reality)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_lake_with_spark_spark.functions.time import epoch_ms, normalize_ts

STAMPS = ["2024-01-01 10:00:00", "2024-03-15 23:59:59.123456", "2023-07-04 00:00:01"]


def _values(spark, path):
    df = normalize_ts(spark.read.parquet(path), "ts")
    assert dict(df.dtypes)["ts"] == "timestamp"
    return sorted(r["ms"] for r in df.select(epoch_ms("ts").alias("ms")).collect())


def test_all_encodings_normalize_identically(spark, tmp_path):
    ts = pd.DatetimeIndex([pd.Timestamp(s) for s in STAMPS])

    p_nanos = str(tmp_path / "nanos.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([t.value for t in ts], type=pa.int64())}), p_nanos
    )
    p_us = str(tmp_path / "us.parquet")
    pq.write_table(pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))}), p_us)
    p_us_tz = str(tmp_path / "us_utc.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(ts.tz_localize("UTC"), type=pa.timestamp("us", tz="UTC"))}),
        p_us_tz,
    )

    want = sorted(int(t.value // 1_000_000) for t in ts)
    assert _values(spark, p_nanos) == want   # bigint branch
    assert _values(spark, p_us) == want      # timestamp_ntz branch
    assert _values(spark, p_us_tz) == want   # already-timestamp branch
