"""Z-order (Morton) index as a column expression — the layout lever for
2-D window locality at scale.

Interleaving x/y bits makes lexicographic file order preserve spatial
locality, so parquet row-group min/max stats on the z column prune 2-D
windows far better than row-major order (the same idea behind Delta's
OPTIMIZE ZORDER; the reference gets locality from its fixed fraction
grid — this generalizes it to within-fraction ordering when fractions
are sized at the 100 TB target, e.g. 4800² pixels per file).

Pure bit arithmetic: stays in whole-stage codegen, usable in
``sortWithinPartitions`` at write time and in range predicates at read
time.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def z_index(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` of x (even positions) and
    y (odd positions) into one bigint."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_index_py(x: int, y: int, bits: int = 16) -> int:
    """Python reference implementation (tests)."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
