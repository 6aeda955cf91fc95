"""Z-order layout: Morton index correctness vs the python reference, and
the z-ordered cube reads back identically to the row-major cube."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from rastercube_spark.functions.zorder import z_index, z_index_py
from rastercube_spark.sources.raster import CubeHeader, RasterCube


def test_z_index_matches_reference(spark):
    df = (
        spark.range(512)
        .select(
            ((F.col("id") * 7) % 160).cast("int").alias("x"),
            ((F.col("id") * 13) % 120).cast("int").alias("y"),
        )
        .withColumn("z", z_index(F.col("x"), F.col("y")))
    )
    for r in df.collect():
        assert r["z"] == z_index_py(r["x"], r["y"]), (r["x"], r["y"])


def test_zordered_cube_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(12)
    data = rng.randint(0, 100, size=(40, 40, 3)).astype(np.int16)
    header = CubeHeader(
        width=40, height=40, frac_width=20, frac_height=20, dtype="int16",
        nodataval=-1, frac_ndates=2, timestamps_ms=[0, 1, 2],
    )
    plain = RasterCube(str(tmp_path / "plain"), CubeHeader.from_json(header.to_json()))
    plain.write_arrays(spark, data)
    zc = RasterCube(str(tmp_path / "zorder"), CubeHeader.from_json(header.to_json()))
    zc.write_long(spark, plain.df(spark), zorder=True)
    got = zc.load_slice_array(spark, (3, 5), (33, 35), 1, 3)
    np.testing.assert_array_equal(got, data[5:35, 3:33, 1:3])
    # the data files must actually be z-sorted (first column pair of each
    # partition ordered by morton code)
    part = zc.df(spark).where((F.col("frac_num") == 0) & (F.col("time_chunk") == 0))
    rows = part.select("x", "y").limit(50).collect()
    zs = [z_index_py(r["x"], r["y"]) for r in rows]
    assert zs == sorted(zs)
