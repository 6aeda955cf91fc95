"""Q30-Q33 — window functions (SURVEY.md §2.9, §2.8).

Q31/Q32 are the engine's form of the reference's per-pixel time-series
operations (the terra-i smoothing primitive); partitioning by (x, y) keeps
each pixel's series on one task, so the window sort is local and bounded by
ndates — exactly the reference's per-fraction memory bound (jgrid3.py:31-34)
but without loading whole fractions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rastercube_spark.queries._util import davg_sql
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import fixture_path, load


@query(
    "q30_ranking",
    oracle="""
        SELECT n_name, c_custkey, c_acctbal, rn, rnk, drnk
        FROM (
            SELECT n_name, c_custkey, c_acctbal,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
        )
        WHERE rn <= 3
        ORDER BY n_name, rn
    """,
)
def q30(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("n_name", "rn")
    )


@query(
    "q31_lag_lead_gapfill",
    oracle=f"""
        SELECT x, y, t, ndvi_v,
               lag(ndvi_v) OVER w AS prev_ndvi,
               lead(ndvi_v) OVER w AS next_ndvi,
               last_value(ndvi_v IGNORE NULLS) OVER (
                   PARTITION BY x, y ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_ndvi
        FROM (
            SELECT x, y, t,
                   CASE WHEN ndvi = -3000 THEN NULL ELSE ndvi END AS ndvi_v
            FROM read_parquet('{fixture_path('ndvi_pixels')}')
            WHERE frac_num < 8
        )
        WINDOW w AS (PARTITION BY x, y ORDER BY t)
        ORDER BY x, y, t
    """,
)
def q31(spark, sf_dir):
    px = (
        load(spark, sf_dir, "ndvi_pixels")
        .where(F.col("frac_num") < 8)
        .select(
            "x",
            "y",
            "t",
            F.when(F.col("ndvi") == -3000, None).otherwise(F.col("ndvi")).alias("ndvi_v"),
        )
    )
    w = Window.partitionBy("x", "y").orderBy("t")
    wfill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return px.select(
        "x",
        "y",
        "t",
        "ndvi_v",
        F.lag("ndvi_v").over(w).alias("prev_ndvi"),
        F.lead("ndvi_v").over(w).alias("next_ndvi"),
        F.last("ndvi_v", ignorenulls=True).over(wfill).alias("filled_ndvi"),
    ).orderBy("x", "y", "t")


@query(
    "q32_moving_average",
    oracle=f"""
        SELECT x, y, t,
               ROUND(CAST(SUM(CAST(ndvi_v AS DECIMAL(24,6))) OVER w
                          / COUNT(ndvi_v) OVER w AS DOUBLE), 6) AS ma3
        FROM (
            SELECT x, y, t,
                   CASE WHEN ndvi = -3000 THEN NULL ELSE ndvi END AS ndvi_v
            FROM read_parquet('{fixture_path('ndvi_pixels')}')
            WHERE frac_num < 8
        )
        WINDOW w AS (PARTITION BY x, y ORDER BY t
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY x, y, t
    """,
)
def q32(spark, sf_dir):
    """3-step moving average per pixel — the terra-i smoothing primitive
    (reference consumes per-pixel series in notebooks; SURVEY §2.9 Q32)."""
    px = (
        load(spark, sf_dir, "ndvi_pixels")
        .where(F.col("frac_num") < 8)
        .select(
            "x",
            "y",
            "t",
            F.when(F.col("ndvi") == -3000, None).otherwise(F.col("ndvi")).alias("ndvi_v"),
        )
    )
    w = Window.partitionBy("x", "y").orderBy("t").rowsBetween(-2, Window.currentRow)
    ma = (F.sum(F.col("ndvi_v").cast("decimal(24,6)")).over(w) / F.count("ndvi_v").over(w))
    return px.select(
        "x", "y", "t", F.round(ma.cast("double"), 6).alias("ma3")
    ).orderBy("x", "y", "t")


@query(
    "q33_running_total",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 6) AS cum_revenue
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q33(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(24,6)")).over(w).cast("double"), 6).alias(
            "cum_revenue"
        ),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")
