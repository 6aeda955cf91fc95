"""Distributed as-of (point-in-time) join.

Spark has no built-in as-of join; the scalable formulation is the
union-and-carry-forward trick: tag both sides, union on (key, time), sort
within key, and carry the most recent right-side row forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. One
shuffle on the key, no per-row probing, no broadcast requirement — survives
arbitrarily large both sides (the window sort is per-key, and AQE splits
skewed keys).

Reference analog: Q17 of the declared surface (SURVEY.md §2.9); the
reference itself has no as-of join — closest is its time-axis search
(jgrid3.py:298-305 frac_for_time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_on: str | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time, matching left.``on`` = right.``right_on``
    (defaults to ``on``).

    Returns left columns plus ``<right_time><suffix>`` and each value col
    as ``<col><suffix>`` (NULL when no prior right row exists).
    """
    value_cols = value_cols or []
    right_on = right_on or on
    lcols = left.columns

    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        # tie-break: right rows at the same instant sort before left probes
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        # derive the placeholder type from the right time column so
        # non-timestamp keys (epoch ints, dates) survive the union
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*lcols).alias("s")).schema["s"].dataType).alias(
            "__l"
        ),
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("__k")
        # value columns complete the tiebreak: without them, multiple
        # right rows at the same (key, time) have no total order and the
        # carried value is nondeterministic across runs/retries (latent —
        # only bites on duplicate timestamps). Deterministic rule: the
        # greatest (time, values) tuple wins.
        .orderBy("__t", "__side", "__rt", *[f"__v_{c}" for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "__side",
        "__l",
        F.last("__rt", ignorenulls=True).over(w).alias("__rt_filled"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__vf_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        F.col("__rt_filled").alias(f"{right_time}{suffix}"),
        *[F.col(f"__vf_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
