"""Salted-join operator: equivalence with the plain join and actual
reducer-spread of a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.skew import salted_join
from rastercube_spark.sources.tables import load


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    # small side with the join column name aligned
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    for how in ("inner", "left"):
        got = salted_join(o, c, ["o_custkey"], n_salt=8, how=how)
        want = o.join(c, ["o_custkey"], how)
        assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_salt_spreads_hot_key(spark):
    """A single dominating key must occupy every salt bucket (the whole
    point: one reducer becomes n_salt reducers)."""
    big = spark.range(0, 10000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    salted = big.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    )
    n_buckets = salted.select("s").distinct().count()
    assert n_buckets == 16


def test_salted_join_rejects_right(spark, sf_dir):
    import pytest

    o = load(spark, sf_dir, "orders").select("o_custkey")
    with pytest.raises(ValueError):
        salted_join(o, o, ["o_custkey"], how="right")
