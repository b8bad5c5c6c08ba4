"""Multi-dimensional data clustering: Z-order (Morton) sort keys.

A date-partitioned store prunes on one dimension.  When queries filter
on TWO dimensions (customer AND price band, lat AND lon), sorting files
by either one leaves the other scattered across every file — min/max
file statistics prune nothing.  Interleaving the bits of both dimensions
into one sort key keeps file-local ranges narrow in BOTH, which is what
makes parquet row-group min/max stats (and Delta/Iceberg file stats)
actually skip data.

Everything here is exact integer arithmetic in plain Spark expressions
(shift/mask/sum — whole-stage codegen), so the DuckDB oracle reproduces
the keys bit-for-bit, and the locality claim is *measured* by the
registered query rather than asserted: bucket rows by z-key and report
per-bucket min/max spans of each dimension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default bits per dimension (two 16-bit dims → one 32-bit key).
ZBITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    Morton key: bit i of x lands at position 2i, bit i of y at 2i+1.

    Inputs must already be quantized to [0, 2^bits) — rank/bucket a
    continuous dimension first (the caller owns the quantizer because
    its resolution IS the skipping granularity)."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        acc = acc + (xbit * F.lit(1 << (2 * i))) + (ybit * F.lit(1 << (2 * i + 1)))
    return acc


def zorder_key_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key` (same shift/mask arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} // {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({y} // {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"
