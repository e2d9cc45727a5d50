"""Cross-engine float-aggregate parity helpers.

Double summation is order-dependent; Spark and DuckDB sum groups in
different orders, so a rounded double sum can land on opposite sides
of a .005 boundary (observed: 219973.63 vs .62). Fix: cast each term
to DECIMAL(18,6) — precision ≤ 18 keeps Spark on the long-backed
Decimal fast path (measured: same cost as a double sum; (24,8) was
2× slower) — per-row terms are bit-identical across engines, the
decimal cast rounds them identically, and decimal summation is EXACT
and associative — then round and cast back to double. Result: the
same value on both engines regardless of summation order.

Spark side: ``dsum(expr)`` / ``davg(expr)``.
Oracle side: the matching SQL via ``DSUM_SQL``/``DAVG_SQL`` templates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent rounded sum (exact decimal accumulation)."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent rounded average: exact decimal sum cast to
    double, divided by count (both operands identical across engines)."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), scale
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale})"
    )
