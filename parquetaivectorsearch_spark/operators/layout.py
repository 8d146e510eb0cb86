"""Z-order (Morton curve) data layout: multi-dimensional clustering for
scan pruning (north-star extension; no analog in the reference, which reads
its whole directory unconditionally, Program.cs:31-43).

At 100 TB, queries filter on more than one column (e.g. customer AND price
band); sorting by either column alone leaves the other scattered across
every file. Interleaving the bits of both keys (Morton/Z-value) and
range-partitioning on that value clusters *both* dimensions at once, so
parquet min/max row-group stats prune scans on either predicate — the
technique behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain
Catalyst integer expressions (shiftleft/and/or — whole-stage codegen, no
UDF).

The bit-spreading is the standard O(log b) magic-number sequence (public
domain "Interleave bits by Binary Magic Numbers", Stanford Bit Twiddling
Hacks); each 16-bit key spreads into even bit positions in 4 shift-mask
steps, chained as separate projections to keep the expression tree linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit int so bit i lands at position 2i.
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits_16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i moves to bit 2i."""
    v = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def zorder_value(x: Column, y: Column) -> Column:
    """Morton Z-value interleaving two 16-bit keys (x in even bits, y odd)."""
    return spread_bits_16(x).bitwiseOR(F.shiftleft(spread_bits_16(y), 1))


def zorder_repartition(df: DataFrame, x: str, y: str, num_files: int,
                       z_col: str = "z") -> DataFrame:
    """Cluster ``df`` for writing: range-partition into ``num_files`` splits
    by the Z-value of (x, y). ``df.write.parquet`` after this produces files
    whose per-file min/max stats are tight on BOTH dimensions.

    repartitionByRange samples the Z distribution to pick balanced split
    points — the scalable path (no global sort, no single-partition window).
    """
    out = df.withColumn(z_col, zorder_value(F.col(x), F.col(y)))
    return out.repartitionByRange(num_files, z_col).sortWithinPartitions(z_col)
