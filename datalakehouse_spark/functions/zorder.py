"""Z-order (Morton) interleaving for multi-column data clustering.

The reference clusters files on a single write order (create.sql:53-56
``write.distribution-mode`` + order); Iceberg/Delta additionally offer
Z-ordering so range predicates on EITHER of two columns prune files.
The key is pure bit math — built-in expressions on both engines, so the
DuckDB oracle verifies it exactly.

Scale posture: the morton key is a narrow per-row projection (64 shifts
and masks fused into whole-stage codegen); clustering is the same
``sortWithinPartitions`` the single-column cluster path uses — no extra
shuffle beyond the write's partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton32(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Callers bucket/normalize their columns into [0, 2^bits) first —
    out-of-range high bits are simply ignored (masked per bit).
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return key


def morton32_duckdb(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """Oracle twin of :func:`morton32` (same shift/mask arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
