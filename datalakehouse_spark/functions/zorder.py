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


def _spread_bits(x: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of ``x`` to even positions (bit i →
    bit 2i) with the binary-magic-numbers doubling trick — O(log bits)
    shift/mask steps instead of one shift/mask/add per bit.  Identical
    output to the per-bit formulation for every long input (both read
    the low ``bits`` two's-complement bits)."""
    x = x.bitwiseAND(F.lit((1 << bits) - 1))
    if bits > 16:
        x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    if bits > 8:
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    if bits > 4:
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    if bits > 2:
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    if bits > 1:
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def morton32(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Callers bucket/normalize their columns into [0, 2^bits) first —
    out-of-range high bits are simply ignored (masked).  Round 12: the
    per-bit shift/add chain (2*bits codegen terms) was the real cost
    behind the zorder_key_accounting bench gap; the magic-number
    spread is ~5 shift/mask steps per column at any ``bits``.
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    return _spread_bits(ca, bits).bitwiseOR(F.shiftleft(_spread_bits(cb, bits), 1))


def morton32_duckdb(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """Oracle twin of :func:`morton32` (same shift/mask arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
