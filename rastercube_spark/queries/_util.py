"""Cross-engine determinism helpers.

Floating sums are order-dependent, and the driver hash-compares values
exactly, so any aggregate whose result must match DuckDB bit-for-bit is
computed from an exact accumulation followed by IEEE double ops that both
engines execute identically:

- per-row cast to DECIMAL(24,6) (deterministic in both engines), exact sum;
- cast the exact sum to DOUBLE (correctly-rounded conversion in both
  engines while the unscaled value stays below 2^53 — true through sf0.1;
  sums at larger SF belong in decimal/bigint outputs, not doubles);
- for averages, ONE double division of that sum by the double count.

What is deliberately absent (CORRECTNESS_r03's qr07 lesson):
- decimal/decimal or decimal/integer DIVISION — engines disagree on the
  result type and rounding of decimal division (DuckDB 1.0 produces a
  DOUBLE, newer versions a DECIMAL; Spark a DECIMAL with its own scale
  rules), so the quotient is version-sensitive;
- a final ROUND on a double — Spark rounds via BigDecimal in the decimal
  domain, DuckDB in the double domain, diverging at representation
  boundaries even on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# money/measure values: per-row cast to decimal (deterministic), exact sum.
DEC = "decimal(24,6)"


def dsum(col: Column | str) -> Column:
    """Exact decimal sum of a double column, emitted as a double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(24,6))) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Exact-sum average: decimal sum cast to double, one IEEE division
    by the non-null count (sum/count, not avg())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")


def davg_sql(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(24,6))) AS DOUBLE) "
        f"/ CAST(COUNT(({expr})) AS DOUBLE)"
    )


REVENUE = "l_extendedprice * (1.0 - l_discount)"


def revenue_col() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
