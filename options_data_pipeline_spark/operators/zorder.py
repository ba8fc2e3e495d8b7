"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

A 100 TB table sorted on ONE column skips beautifully on that column
and not at all on any other.  Interleaving the bits of two (or more)
grid-quantized dimensions into a single **z-value** and range-
partitioning on it gives every output file a small bounding box in
EVERY interleaved dimension at once — parquet min/max pruning then
works for predicates on any of them.  This is what Delta's
``OPTIMIZE ... ZORDER BY`` does to choose file layout; Spark has no
public expression for it, so this module builds the key out of
``shiftleft``/``shiftright``/``&`` column arithmetic (pure JVM, whole-
stage-codegen friendly — no UDF).

Everything is integer math end-to-end (grid quantization never touches
a fractional intermediate that double arithmetic could round), so the
DuckDB oracle reproduces the z-values bit-for-bit from the same
generated expression grammar (:func:`interleave_sql` / ``//``).

Layout recipe at scale::

    z = interleave_bits(quantize(x, ...), quantize(y, ...))
    df.repartitionByRange(n_files, z).sortWithinPartitions(z).write...

The ``zorder_layout`` query adjudicates the math and reports per-
bucket bounding boxes — evidence that buckets are tight in both
dimensions simultaneously (a single-column sort gives full-range
boxes in the second dimension).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: bits per dimension (grid 0..2^BITS-1); 2 dims * 10 bits = 20-bit z
BITS = 10


def quantize(col: Column, cmin: Column, cmax: Column, bits: int = BITS) -> Column:
    """Map an integer column onto the 0..2^bits-1 grid, integer-exact:
    ``(x - min) * 2^bits div (max - min + 1)`` — monotone, endpoints
    land on 0 and 2^bits-1.

    ``floor(a / b)`` here IS exact integer division: a and b are
    integer-valued longs below 2^41, both exactly representable as
    doubles; the quotient would need to sit within n*2^-53 of an
    integer to mis-floor, which requires a ~ 2^53 — out of range by
    construction (a <= 2^31 ids * 2^10 grid).  DuckDB's ``//`` on
    BIGINT agrees digit-for-digit.
    """
    num = (col.cast("long") - cmin.cast("long")) * F.lit(1 << bits).cast("long")
    den = (cmax.cast("long") - cmin.cast("long") + F.lit(1)).cast("long")
    return F.floor(num / den).cast("long")


def interleave_bits(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave two grid coordinates: x on the even bit
    positions, y on the odd.  2*bits shift/mask terms OR-folded into
    one codegen'd expression."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def interleave_sql(x: str, y: str, bits: int = BITS) -> str:
    """The identical interleave as DuckDB SQL over expressions x / y."""
    terms = []
    for b in range(bits):
        terms.append(f"(((({x}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({y}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def quantize_sql(x: str, xmin: str, xmax: str, bits: int = BITS) -> str:
    """The identical quantization as DuckDB SQL (integer ``//``)."""
    return f"((({x}) - ({xmin})) * {1 << bits} // (({xmax}) - ({xmin}) + 1))"
