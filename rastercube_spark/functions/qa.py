"""MODIS QA bitmask → confidence score (F1).

Exact gate logic of the reference's Cython kernel
(rastercube/datasources/modis_qa.pyx:22-103), re-expressed as a Catalyst
column expression: bit tests with shifts/masks + a CASE chain. This is the
fast path — whole-stage-codegen'd, vectorized, no Python in the loop. The
pandas-UDF variant (Q80) exists to prove UDF↔builtin parity.

Gates (all → confidence 0):
  bits 0-1  MODLAND == 3            (not produced)
  bits 6-7  aerosol == 3            (high aerosol)
  bit 8     adjacent cloud
  bit 10    mixed cloud
  bits 11-13 land/water != 1        (anything but land)
  bit 14    possible snow/ice
  bit 15    possible shadow
Otherwise confidence = 1 − usefulness(bits 2-5)/12.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qaconf_col(qa: Column) -> Column:
    """Vectorized JVM-side QA→confidence (identical to modis_qa.pyx)."""
    bad = (
        (qa.bitwiseAND(F.lit(3)) == 3)
        | (F.shiftright(qa, 6).bitwiseAND(F.lit(3)) == 3)
        | (F.shiftright(qa, 8).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 10).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 11).bitwiseAND(F.lit(7)) != 1)
        | (F.shiftright(qa, 14).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 15).bitwiseAND(F.lit(1)) == 1)
    )
    usefulness = F.shiftright(qa, 2).bitwiseAND(F.lit(15)).cast("double")
    return F.when(bad, F.lit(0.0)).otherwise(F.lit(1.0) - usefulness / F.lit(12.0))


# Same expression in ANSI SQL for the DuckDB oracle; format with {qa}.
QACONF_SQL = (
    "CASE WHEN (({qa}) & 3) = 3"
    " OR ((({qa}) >> 6) & 3) = 3"
    " OR ((({qa}) >> 8) & 1) = 1"
    " OR ((({qa}) >> 10) & 1) = 1"
    " OR ((({qa}) >> 11) & 7) <> 1"
    " OR ((({qa}) >> 14) & 1) = 1"
    " OR ((({qa}) >> 15) & 1) = 1"
    " THEN 0.0 ELSE 1.0 - ((({qa}) >> 2) & 15) / 12.0 END"
)


def qaconf_numpy(qa):
    """Numpy reference implementation (used by the pandas UDF, Q80).

    Mirrors modis_qa.pyx:22-103 exactly; operates on an int array.
    """
    import numpy as np

    qa = np.asarray(qa, dtype=np.int64)
    bad = (
        ((qa & 3) == 3)
        | (((qa >> 6) & 3) == 3)
        | (((qa >> 8) & 1) == 1)
        | (((qa >> 10) & 1) == 1)
        | (((qa >> 11) & 7) != 1)
        | (((qa >> 14) & 1) == 1)
        | (((qa >> 15) & 1) == 1)
    )
    conf = 1.0 - ((qa >> 2) & 15) / 12.0
    conf[bad] = 0.0
    return conf


# --- Landsat8 QA (F2) ---------------------------------------------------

def landsat_qaconf_col(qa: Column) -> Column:
    """Landsat8 QA word → binary confidence (F2; exact gate logic of
    reference rastercube/datasources/landsat8_qa.pyx:22-67): fill,
    dropped frame, terrain occlusion, or high-confidence water / snow /
    cirrus / cloud (2-bit field == 3) → 0, else 1. Vegetation confidence
    (bits 8-9) deliberately ignored, matching the reference."""
    bad = (
        (qa.bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 1).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 2).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(qa, 4).bitwiseAND(F.lit(3)) == 3)
        | (F.shiftright(qa, 10).bitwiseAND(F.lit(3)) == 3)
        | (F.shiftright(qa, 12).bitwiseAND(F.lit(3)) == 3)
        | (F.shiftright(qa, 14).bitwiseAND(F.lit(3)) == 3)
    )
    return F.when(bad, F.lit(0.0)).otherwise(F.lit(1.0))


LANDSAT_QACONF_SQL = (
    "CASE WHEN (({qa}) & 1) = 1"
    " OR ((({qa}) >> 1) & 1) = 1"
    " OR ((({qa}) >> 2) & 1) = 1"
    " OR ((({qa}) >> 4) & 3) = 3"
    " OR ((({qa}) >> 10) & 3) = 3"
    " OR ((({qa}) >> 12) & 3) = 3"
    " OR ((({qa}) >> 14) & 3) = 3"
    " THEN 0.0 ELSE 1.0 END"
)
