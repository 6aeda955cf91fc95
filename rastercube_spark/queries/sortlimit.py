"""Q40-Q41 — sort / limit / top-k (SURVEY.md §2.9).

Global top-k in Spark is TakeOrderedAndProject — each partition keeps k
rows, the driver merges; no global sort materialization. Per-group top-k is
a window + filter (one shuffle on the group key).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rastercube_spark.registry import query
from rastercube_spark.sources.tables import load


@query(
    "q40_global_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
)
def q40(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q41_per_group_topk",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 2
        ORDER BY o_custkey, rn
    """,
)
def q41(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    )
