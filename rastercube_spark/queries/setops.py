"""Q50-Q53 — set operations (SURVEY.md §2.9).

Relational generalization of the reference's chunk-id set algebra
(J3/J4 — reference hadoop/spark.py:166-177 intersection/difference of
available-fraction sets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.registry import query
from rastercube_spark.sources.tables import load


def _big_buyers(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select(F.col("l_suppkey").alias("key"))
    )


def _suppliers(spark, sf_dir):
    return load(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("key"))


@query(
    "q50_union_all",
    oracle="""
        SELECT key FROM (
            SELECT l_suppkey AS key FROM lineitem WHERE l_quantity > 45
            UNION ALL
            SELECT s_suppkey AS key FROM supplier
        ) ORDER BY key
    """,
)
def q50(spark, sf_dir):
    return (
        _big_buyers(spark, sf_dir)
        .unionAll(_suppliers(spark, sf_dir))
        .orderBy("key")
    )


@query(
    "q51_union_distinct",
    oracle="""
        SELECT key FROM (
            SELECT l_suppkey AS key FROM lineitem WHERE l_quantity > 45
            UNION
            SELECT s_suppkey AS key FROM supplier
        ) ORDER BY key
    """,
)
def q51(spark, sf_dir):
    return (
        _big_buyers(spark, sf_dir)
        .union(_suppliers(spark, sf_dir))
        .distinct()
        .orderBy("key")
    )


@query(
    "q52_intersect",
    oracle="""
        SELECT key FROM (
            SELECT c_custkey AS key FROM customer
            INTERSECT
            SELECT o_custkey AS key FROM orders
        ) ORDER BY key
    """,
)
def q52(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return c.intersect(o).orderBy("key")


@query(
    "q53_except",
    oracle="""
        SELECT key FROM (
            SELECT c_custkey AS key FROM customer
            EXCEPT
            SELECT o_custkey AS key FROM orders
        ) ORDER BY key
    """,
)
def q53(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    # subtract == EXCEPT (distinct) semantics
    return c.subtract(o).orderBy("key")
