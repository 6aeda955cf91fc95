"""Cross-engine determinism helpers.

Floating sums are order-dependent; the driver hash-compares values after a
6-dp round, so any aggregate whose error can exceed 1e-6 is computed via an
exact DECIMAL accumulation in BOTH engines, then cast back to DOUBLE
(SURVEY.md §7.4 'deterministic hashing of floats').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# money/measure values: per-row cast to decimal (deterministic), exact sum.
DEC = "decimal(24,6)"


def dsum(col: Column | str) -> Column:
    """Exact decimal sum of a double column, returned as rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), 6)


def dsum_sql(expr: str) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(24,6))) AS DOUBLE), 6)"


def davg(col: Column | str) -> Column:
    """Exact decimal-based average, rounded double (sum/count, not avg())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        (F.sum(c.cast(DEC)) / F.count(c)).cast("double"), 6
    )


def davg_sql(expr: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(24,6))) / COUNT(({expr})) "
        f"AS DOUBLE), 6)"
    )


REVENUE = "l_extendedprice * (1.0 - l_discount)"


def revenue_col() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
