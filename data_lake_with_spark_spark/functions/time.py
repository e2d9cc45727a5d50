"""Event-time normalization: one choke point for every ts encoding.

The driver's ``events.parquet`` has shipped with two physical encodings
so far — TIMESTAMP(NANOS) (read as epoch-nanos ``bigint`` under
``spark.sql.legacy.parquet.nanosAsLong=true``) and plain
``timestamp[us]`` (read by Spark 4 as TIMESTAMP_NTZ). Every operator in
this engine wants one logical type: TIMESTAMP (µs, session-TZ-aware,
pinned UTC in session.py). This module is the single place that knows
about physical encodings; callers never touch ``unix_millis`` /
``unix_micros`` on a raw table column directly (SURVEY §7.3 named
timestamp parity the top t2 risk, and round 3 proved it: the encoding
flip broke 5 queries and crashed the bench).

Rebuild of the reference's ts handling intent (``etl.py:173,176-177``:
epoch-ms → timestamp via a Python UDF; here JVM builtins, SURVEY §2.6
F1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP whatever its encoding.

    - ``bigint``: epoch-nanos long (old nanosAsLong shape). Integer
      division ``DIV 1000`` keeps the math in long space — values
      ~1.7e18 overflow double's 53-bit mantissa, so float division
      would corrupt them. The testdata has zero sub-µs residue, so the
      truncation DuckDB applies (ns → µs) matches exactly.
    - ``timestamp_ntz``: the new ``timestamp[us]`` parquet encoding.
      Cast to TIMESTAMP — exact under the pinned UTC session TZ, which
      is also how DuckDB reads the naive value, so oracle parity holds.
    - ``timestamp``: already normalized, no-op.

    Works on batch and streaming DataFrames (``dtypes`` is an
    analysis-time property, no job runs).
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_ms(col: str | Column) -> Column:
    """Epoch-milliseconds of a normalized TIMESTAMP column.

    Call sites must receive the column via ``normalize_ts`` (catalog /
    events_stream do this); this wrapper exists so epoch math is
    greppable and lives behind one name if the logical type ever
    changes again.
    """
    return F.unix_millis(F.col(col) if isinstance(col, str) else col)


def epoch_us(col: str | Column) -> Column:
    """Epoch-microseconds of a normalized TIMESTAMP column."""
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)
