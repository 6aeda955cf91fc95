"""Q01-Q03 — scans, projection, filters (SURVEY.md §2.9).

The relational analog of the reference's chunk reads + pruning (S2/S3, P1/P2
— jgrid3.py:375-412,470-489): Catalyst pushes these filters into the parquet
scan (PushedFilters) and prunes columns (ReadSchema), which is strictly
better than the reference's read-whole-blob-then-slice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.registry import query
from rastercube_spark.sources.tables import load


@query(
    "q01_scan_count",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def q01(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@query(
    "q02_project_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
        ORDER BY l_orderkey, l_linenumber
    """,
)
def q02(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q03_in_null_predicates",
    oracle="""
        SELECT o_orderkey
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_orderstatus IS NOT NULL
        ORDER BY o_orderkey
    """,
)
def q03(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_orderstatus").isNotNull()
        )
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )
