"""D1 per-chunk pipeline: full run, incremental skip, chunk granularity
(reference hadoop/spark.py:120-177 job runner semantics)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from rastercube_spark.operators.chunks import map_chunks
from rastercube_spark.sources.tables import load

SCHEMA = "frac_num int, time_chunk int, n int, mean_v double"


def _make_stats():
    # defined inside a factory so cloudpickle serializes it by value —
    # executors cannot import the tests package
    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        valid = pdf[pdf["ndvi"] != -3000]
        return pd.DataFrame(
            {
                "frac_num": [int(pdf["frac_num"].iloc[0])],
                "time_chunk": [int(pdf["time_chunk"].iloc[0])],
                "n": [len(valid)],
                "mean_v": [float(valid["ndvi"].mean()) if len(valid) else None],
            }
        )

    return _stats


def test_map_chunks_full(spark, sf_dir):
    px = load(spark, sf_dir, "ndvi_pixels")
    out = map_chunks(px, _make_stats(), SCHEMA)
    expect = (
        px.where(F.col("ndvi") != -3000)
        .groupBy("frac_num", "time_chunk")
        .count()
    )
    got = {(r["frac_num"], r["time_chunk"]): r["n"] for r in out.collect()}
    want = {(r["frac_num"], r["time_chunk"]): r["count"] for r in expect.collect()}
    assert got == want


def test_map_chunks_incremental(spark, sf_dir):
    px = load(spark, sf_dir, "ndvi_pixels")
    done = (
        px.select("frac_num", "time_chunk")
        .distinct()
        .where(F.col("frac_num") < 24)
    )
    out = map_chunks(px, _make_stats(), SCHEMA, done_catalog=done)
    fracs = {r["frac_num"] for r in out.select("frac_num").distinct().collect()}
    assert fracs and all(f >= 24 for f in fracs)
