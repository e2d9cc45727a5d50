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


def pround(col: Column, scale: int) -> Column:
    """Portable double rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Engine ROUND(double, n) tie-breaking DIFFERS: Spark rounds the
    double's shortest decimal representation half-up while DuckDB
    rounds the binary value (observed: ROUND(101.47925, 4) → 101.4793
    vs 101.4792). Dyadic ratios (5/128 = 0.0390625) are exact ties and
    DO occur in jaccard/ratio outputs. floor/multiply/add are
    bit-identical IEEE ops on both engines, so this form always agrees.
    Use for any rounded COMPUTED double; ROUND over DECIMAL values is
    safe (both engines round decimals half-up — probed)."""
    factor = float(10**scale)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def pround_sql(expr: str, scale: int) -> str:
    factor = float(10**scale)
    return f"FLOOR(({expr}) * {factor} + 0.5) / {factor}"


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent rounded average: exact decimal sum cast to
    double, divided by count (both operands identical across engines),
    portable-rounded."""
    return pround(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale)


def dsum_expr(expr: str, scale: int = 2) -> Column:
    """``dsum`` built from ONE expr string (round-15
    construction-chatter cut): the Column form costs ~6 py4j round
    trips per aggregate — driver latency the bench pays per pass.
    Parses to the identical ROUND(SUM(CAST(...)))::DOUBLE tree."""
    return F.expr(f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), {scale}) AS DOUBLE)")


def davg_expr(expr: str, scale: int = 4) -> Column:
    """``davg`` as one expr string (see dsum_expr); D-suffixed literals
    keep the rounding factors DOUBLE exactly like F.lit(float(...))."""
    factor = float(10**scale)
    return F.expr(
        f"FLOOR((CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr})) * {factor!r}D + 0.5D) / {factor!r}D"
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), {scale}) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    inner = f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
    return pround_sql(inner, scale)
