"""Distributed prefix scan ≡ global window (the scale-safe replacement
for Window.orderBy with no partition key)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from rastercube_spark.operators.prefix import running_max_exclusive
from rastercube_spark.sources.tables import load


def test_running_max_equals_global_window(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    got = running_max_exclusive(e, "event_id", "ts", num_buckets=7).select(
        "event_id", F.col("__running_max").alias("m")
    )
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    want = e.withColumn("m", F.max("ts").over(w)).select("event_id", "m")
    g = {r["event_id"]: r["m"] for r in got.collect()}
    x = {r["event_id"]: r["m"] for r in want.collect()}
    assert g == x


def test_running_max_parallel_plan(spark, sf_dir):
    """The scan must not contain a partition-less window (the single-task
    pattern this operator exists to avoid)."""
    e = load(spark, sf_dir, "events")
    df = running_max_exclusive(e, "event_id", "ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan  # window runs partitioned by bucket
