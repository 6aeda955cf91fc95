"""Relational point-in-polygon (P4) — replaces GDAL raster-burn masks.

The reference rasterizes polygons with PIL and masks arrays
(reference imutils.py:5-17, jgrid/utils.py:27-51). Spark-first formulation:
ray casting as a join against the polygon's *edge* table + odd-crossings
test. The edge table is tiny (broadcast); the bbox prefilter is a plain
column predicate, so Catalyst prunes partitions/row-groups before the edge
join runs. Fully engine-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def polygon_edges(poly_df: DataFrame) -> DataFrame:
    """region_polygons (region_name, vertex_idx, vx, vy; closed ring) →
    one row per edge (region_name, x1, y1, x2, y2)."""
    a = poly_df.alias("a")
    b = poly_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.region_name") == F.col("b.region_name"))
            & (F.col("b.vertex_idx") == F.col("a.vertex_idx") + 1),
        )
        .select(
            F.col("a.region_name").alias("region_name"),
            F.col("a.vx").alias("x1"),
            F.col("a.vy").alias("y1"),
            F.col("b.vx").alias("x2"),
            F.col("b.vy").alias("y2"),
        )
    )


def points_in_polygon(
    points: DataFrame, poly_df: DataFrame, region: str, x: str = "x", y: str = "y"
) -> DataFrame:
    """Filter ``points`` to those whose pixel center (x+0.5, y+0.5) lies
    inside ``region`` (ray cast to +x, odd crossing count)."""
    edges = polygon_edges(poly_df).where(F.col("region_name") == region)
    bbox = edges.agg(
        F.least(F.min("x1"), F.min("x2")).alias("xmin"),
        F.greatest(F.max("x1"), F.max("x2")).alias("xmax"),
        F.least(F.min("y1"), F.min("y2")).alias("ymin"),
        F.greatest(F.max("y1"), F.max("y2")).alias("ymax"),
    )
    px = F.col(x) + F.lit(0.5)
    py = F.col(y) + F.lit(0.5)
    pts = points.join(F.broadcast(bbox)).where(
        (px >= F.col("xmin")) & (px <= F.col("xmax")) & (py >= F.col("ymin")) & (py <= F.col("ymax"))
    ).drop("xmin", "xmax", "ymin", "ymax")

    crossing = (
        ((F.col("y1") > py) != (F.col("y2") > py))
        & (
            px
            < (F.col("x2") - F.col("x1")) * (py - F.col("y1")) / (F.col("y2") - F.col("y1"))
            + F.col("x1")
        )
    )
    inside = (
        pts.join(F.broadcast(edges))
        .groupBy(*points.columns)
        .agg(F.sum(F.when(crossing, 1).otherwise(0)).alias("n_cross"))
        .where(F.col("n_cross") % 2 == 1)
        .drop("n_cross")
    )
    return inside


# Same ray-cast as SQL (DuckDB oracle); format with the pixels relation,
# polygon parquet path and region name.
POINTS_IN_POLYGON_SQL = """
    SELECT p.*
    FROM ({points}) p
    JOIN (
        SELECT a.region_name, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
        FROM read_parquet('{poly_path}') a
        JOIN read_parquet('{poly_path}') b
          ON a.region_name = b.region_name AND b.vertex_idx = a.vertex_idx + 1
        WHERE a.region_name = '{region}'
    ) e ON TRUE
    GROUP BY ALL
    HAVING SUM(CASE WHEN ((e.y1 > p.{y} + 0.5) <> (e.y2 > p.{y} + 0.5))
                     AND (p.{x} + 0.5 < (e.x2 - e.x1) * (p.{y} + 0.5 - e.y1)
                                        / (e.y2 - e.y1) + e.x1)
               THEN 1 ELSE 0 END) % 2 = 1
"""
