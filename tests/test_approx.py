"""Sketch aggregates (rows-only in the driver gate) are bounded here
against their exact counterparts — the check an oracle can't do."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.registry import queries
from rastercube_spark.sources.tables import load


def test_approx_count_distinct_bounds(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in queries()["q2a_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


def test_approx_quantiles_bounds(spark, sf_dir):
    approx = {
        r["l_returnflag"]: (r["median_price"], r["p99_price"])
        for r in queries()["q2b_approx_quantiles"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["m"], r["p"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("m"),
            F.percentile("l_extendedprice", 0.99).alias("p"),
        )
        .collect()
    }
    for k, (m, p) in exact.items():
        am, ap = approx[k]
        assert abs(am - m) / m < 0.02 and abs(ap - p) / p < 0.02
