"""Deterministic numeric aggregation helpers.

Floating-point ``SUM`` is order-dependent; Spark's parallel partial
aggregation and DuckDB's sequential scan will differ in the last ulps,
which breaks exact value-hash comparison (and, at 100 TB, makes reruns
non-reproducible).  For money-like fixed-point columns the engine sums in
DECIMAL — exact, associative, order-independent — and converts once at
the end.  This is also the faithful TPC-H semantic (the spec types these
columns DECIMAL(15,2)).

Scale choice caveat: the final decimal->double conversions must agree
across engines. Spark converts via BigDecimal (correctly rounded);
DuckDB divides double(unscaled_int)/double(10^scale), which
double-rounds once the unscaled value exceeds 2^53.  Keep
``sum_magnitude × 10^scale < 2^53`` (scale<=4 for ~1e9-magnitude sums)
and both paths produce the identical double — verified by a 1-ulp
sum_charge mismatch at sf0.1 before this constraint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, as_double: bool = True) -> Column:
    """Order-independent SUM: cast to DECIMAL(18, scale), sum exactly,
    optionally convert back to double (one deterministic rounding)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal(18,{scale})"))
    return s.cast("double") if as_double else s


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG = exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def dsum_duckdb(expr: str, scale: int = 2) -> str:
    """Oracle-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_duckdb(expr: str, scale: int = 2) -> str:
    """Oracle-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
    )
