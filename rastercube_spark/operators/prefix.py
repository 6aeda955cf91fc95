"""Distributed prefix scan: running aggregates over a GLOBAL order
without a single-task global window.

``Window.orderBy(...)`` with no partition key funnels every row through
one task — fine as an sf0.01 oracle emulation, fatal at 100 TB. The
classic fix is the two-pass prefix scan:

1. split the order domain into buckets at approx-quantile boundaries —
   the bucket id is an EXPLICIT column derived from literal boundaries,
   so every downstream action sees the same assignment
   (``repartitionByRange`` + ``spark_partition_id`` is NOT usable here:
   its sampling re-runs per action and the pid→range mapping shifts
   between the offsets pass and the main pass — observed live);
2. per-bucket running aggregate via a window PARTITIONED by bucket
   (parallel, bounded by bucket size);
3. per-bucket totals (one row per bucket) prefix-combined on the driver
   and broadcast back as a map literal of offsets.

Semantically identical to the global window; wall-clock bounded by the
largest bucket, not the whole relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType


def _bucket_col(df: DataFrame, order_col: str, boundaries: list[float]) -> Column:
    """Bucket id = number of boundaries at or below the row's order value.

    Correctness requires the comparison to be MONOTONE in the true order:
    for integral order columns the comparison stays in the integer domain
    (casting an int64 above 2^53 to double can round two distinct order
    values onto the same double, mis-bucketing rows across a boundary and
    corrupting the prefix combine). Boundary literals from approxQuantile
    are doubles either way — any consistent boundary VALUE is fine, only
    the comparison domain matters.
    """
    order = F.col(order_col)
    integral = isinstance(
        df.schema[order_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    if integral:
        lits = sorted({int(v) for v in boundaries})
        order = order.cast("long")
    else:
        lits = sorted(set(boundaries))
        order = order.cast("double")
    b: Column = F.lit(0)
    for v in lits:
        b = b + F.when(order >= F.lit(v), 1).otherwise(0)
    return b


def running_sum_exclusive(
    df: DataFrame, order_col: str, value_col: str, num_buckets: int = 32
) -> DataFrame:
    """Add ``__running_sum`` = sum(value) over all rows strictly before
    the current row in ``order_col`` order (0 for the global first row) —
    same two-pass bucket topology as :func:`running_max_exclusive`, with
    sum as the combine. The workhorse for sequence packing / offset
    assignment over a global document order."""
    boundaries = df.stat.approxQuantile(
        order_col, [i / num_buckets for i in range(1, num_buckets)], 0.001
    )
    bucketed = df.withColumn("__bkt", _bucket_col(df, order_col, boundaries))
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "__local_sum", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    totals = {
        r["__bkt"]: r["s"]
        for r in bucketed.groupBy("__bkt").agg(F.sum(value_col).alias("s")).collect()
    }
    prefix: dict[int, int] = {}
    acc = 0
    for bkt in sorted(totals):
        prefix[bkt] = acc
        acc += totals[bkt] or 0
    entries = [x for bkt, v in prefix.items() for x in (F.lit(bkt), F.lit(v))]
    offset = (
        F.element_at(F.create_map(*entries), F.col("__bkt"))
        if entries
        else F.lit(0)
    )
    return local.withColumn(
        "__running_sum", F.col("__local_sum") + F.coalesce(offset, F.lit(0))
    ).drop("__bkt", "__local_sum")


def running_max_exclusive(
    df: DataFrame, order_col: str, value_col: str, num_buckets: int = 32
) -> DataFrame:
    """Add ``__running_max`` = max(value) over all rows strictly before
    the current row in ``order_col`` order (NULL for the global first
    row) — distributed, no global window. ``order_col`` must be numeric.
    """
    boundaries = df.stat.approxQuantile(
        order_col, [i / num_buckets for i in range(1, num_buckets)], 0.001
    )
    bucketed = df.withColumn("__bkt", _bucket_col(df, order_col, boundaries))
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__local_max", F.max(value_col).over(w))

    # per-bucket totals → exclusive prefix max (driver-side: one row per
    # bucket, trivially small at any scale). A bucket whose values are all
    # NULL has max None — it contributes nothing to the running prefix
    # (mirrors F.max ignoring NULLs).
    totals = {
        r["__bkt"]: r["m"]
        for r in bucketed.groupBy("__bkt").agg(F.max(value_col).alias("m")).collect()
    }
    prefix: dict[int, object] = {}
    best = None
    for bkt in sorted(totals):
        prefix[bkt] = best
        if totals[bkt] is not None and (best is None or totals[bkt] > best):
            best = totals[bkt]

    # offsets ride back as a broadcast map literal keyed by bucket id;
    # element_at yields NULL for buckets with no predecessor data
    mapping: Column = F.lit(None).cast(df.schema[value_col].dataType)
    entries = [
        x
        for bkt, v in prefix.items()
        if v is not None
        for x in (F.lit(bkt), F.lit(v))
    ]
    if entries:
        mapping = F.element_at(F.create_map(*entries), F.col("__bkt"))

    # greatest() ignores NULLs (returns the largest non-null operand), so
    # the combine is exact: NULL only for the global first rows
    return local.withColumn(
        "__running_max", F.greatest(F.col("__local_max"), mapping)
    ).drop("__bkt", "__local_max")
