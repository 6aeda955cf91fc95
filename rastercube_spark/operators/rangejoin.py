"""Bucketed range (interval) join — the scale path for point-in-interval
predicates.

A naive interval join (``p BETWEEN lo AND hi``) has no equi key, so Spark
plans a broadcast nested loop — O(points × intervals) comparisons
(q16_theta_join shows that shape; it is correct but dies at scale).
The bucketed formulation turns it into an equi-join:

1. choose a bucket width; each POINT hashes to ``floor(p / w)`` — one row;
2. each INTERVAL explodes to every bucket it overlaps
   (``sequence(floor(lo/w), floor(hi/w))``) — ``len/w + 1`` rows;
3. equi-join on the bucket id, then re-check the exact BETWEEN predicate.

A (point, interval) match joins in EXACTLY one bucket — the point's — so
no dedup is needed. Shuffle volume: O(points + intervals·spread) instead
of a nested loop; with a small interval side the exploded dim broadcasts
and there is no shuffle at all. Correctness does not depend on float
bucket math: division by a positive width is monotone, so a contained
point's bucket always lies inside the interval's bucket range, and the
final BETWEEN is exact.

The reference has no interval join (its temporal logic is dense axis
indexing); this is net-new engine surface in the spirit of SURVEY §2's
custom-operator guidance (as-of join, range join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (inclusive both ends), via bucket equi-join.

    ``bucket_width`` trades interval fan-out (≈ interval length / width
    rows per interval) against bucket selectivity; pick it near the
    median interval length. ``broadcast_intervals`` marks the exploded
    interval side for broadcast (the common shape: big fact, small dim
    of bands/windows).

    Inner join only: an outer variant cannot simply post-filter the
    BETWEEN predicate (unmatched rows would be dropped with it) — it
    needs an anti-join complement, which callers can compose themselves.
    """
    w = float(bucket_width)
    pb = points.withColumn("__bucket", F.floor(F.col(point_col) / F.lit(w)))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)),
                F.floor(F.col(hi_col) / F.lit(w)),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    joined = pb.join(ib, "__bucket").where(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__bucket")
