"""Sketch aggregates are bounded here against their exact counterparts
with raw estimates (the query surface itself emits only the exact anchor
plus the in-engine 5%-bound verdict — see q2a/q2b docstrings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.registry import queries
from rastercube_spark.sources.tables import load


def test_approx_count_distinct_bounds(spark, sf_dir):
    rows = load(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a"),
        F.countDistinct("l_orderkey").alias("n"),
    ).collect()
    for r in rows:
        assert abs(r["a"] - r["n"]) / r["n"] < 0.05, tuple(r)
    # and the registered query's own verdicts must all hold
    out = queries()["q2a_approx_count_distinct"](spark, sf_dir).collect()
    assert out and all(r["approx_ok"] for r in out)


def test_approx_quantiles_bounds(spark, sf_dir):
    rows = load(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("am"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("ap"),
        F.percentile("l_extendedprice", 0.5).alias("m"),
        F.percentile("l_extendedprice", 0.99).alias("p"),
    ).collect()
    for r in rows:
        assert abs(r["am"] - r["m"]) / r["m"] < 0.02
        assert abs(r["ap"] - r["p"]) / r["p"] < 0.02
    out = queries()["q2b_approx_quantiles"](spark, sf_dir).collect()
    assert out and all(r["median_ok"] and r["p99_ok"] for r in out)
