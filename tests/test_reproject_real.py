"""Real-grid reprojection: a RasterCube on the PHYSICAL MODIS sinusoidal
worldgrid reprojected into a GLCF WGS84 window (the two grids the
reference actually runs on, grids.py:58-67 + 100-159) — not synthetic
geotransforms. Tolerance-tested against an independent numpy computation
of the same projection math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rastercube_spark.functions.geo import MODIS_SPHERE_R
from rastercube_spark.functions.grids import (
    GLCFGrid,
    MODISGrid,
    glcf_to_modis_px,
    modis_cube_header,
)
from rastercube_spark.operators.resample import gather_nearest_crs
from rastercube_spark.sources.raster import RasterCube

# a 64×64 GLCF window centered near (lat 40°, lng 20°)
GX0 = int((20.0 - GLCFGrid.GEOT[0]) / GLCFGrid.GEOT[1]) - 32
GY0 = int((40.0 - GLCFGrid.GEOT[3]) / GLCFGrid.GEOT[5]) - 32
GW = 64


def _expected_src_px():
    """numpy mirror of the GLCF→MODIS mapping for the window."""
    dx, dy = np.meshgrid(np.arange(GX0, GX0 + GW), np.arange(GY0, GY0 + GW))
    lng = GLCFGrid.GEOT[0] + (dx + 0.5) * GLCFGrid.GEOT[1]
    lat = GLCFGrid.GEOT[3] + (dy + 0.5) * GLCFGrid.GEOT[5]
    xm = MODIS_SPHERE_R * np.radians(lng) * np.cos(np.radians(lat))
    ym = MODIS_SPHERE_R * np.radians(lat)
    sx = np.floor((xm - MODISGrid.GEOT[0]) / MODISGrid.GEOT[1]).astype(np.int64)
    sy = np.floor((ym - MODISGrid.GEOT[3]) / MODISGrid.GEOT[5]).astype(np.int64)
    return dx, dy, sx, sy


def test_reproject_modis_cube_to_glcf_window(spark, tmp_path):
    dx, dy, sx, sy = _expected_src_px()
    x0, x1 = int(sx.min()) - 2, int(sx.max()) + 3
    y0, y1 = int(sy.min()) - 2, int(sy.max()) + 3

    # source cube on the REAL MODIS grid; value encodes the pixel so the
    # gathered value identifies which source pixel each target chose
    hdr = modis_cube_header([0], dtype="int32", frac_ndates=1)
    cube = RasterCube(str(tmp_path / "modis_cube"), hdr)
    xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
    xs, ys = xs.ravel(), ys.ravel()
    code = (ys - y0) * (x1 - x0) + (xs - x0)
    src_rows = spark.createDataFrame(
        [
            (int(hdr.frac_for_xy(x, y)), 0, int(x), int(y), 0, int(c))
            for x, y, c in zip(xs, ys, code)
        ],
        "frac_num int, time_chunk int, x int, y int, t int, v int",
    )
    cube.write_long(spark, src_rows)
    assert cube.df(spark).select("frac_num").distinct().count() >= 1

    src = cube.df(spark).where(F.col("t") == 0).select("x", "y", "v")
    out = gather_nearest_crs(
        spark,
        src,
        glcf_to_modis_px,
        (GX0, GX0 + GW),
        (GY0, GY0 + GW),
        value_col="v",
    ).collect()

    # every GLCF pixel found a MODIS source pixel
    assert len(out) == GW * GW

    exp = {
        (int(a), int(b)): (int(c), int(d))
        for a, b, c, d in zip(dx.ravel(), dy.ravel(), sx.ravel(), sy.ravel())
    }
    exact = 0
    for r in out:
        got_code = r["v"]
        gy_, gx_ = divmod(got_code, x1 - x0)
        got = (gx_ + x0, gy_ + y0)
        want = exp[(r["dst_x"], r["dst_y"])]
        # Spark trig (Java Math) and numpy may differ in the last ulp —
        # a floor flip moves the chosen pixel by at most one.
        assert abs(got[0] - want[0]) <= 1 and abs(got[1] - want[1]) <= 1
        exact += got == want
    assert exact / len(out) > 0.99


def test_mapping_matches_scalar_math(spark):
    """The column-expression mapping agrees with scalar python math on a
    probe of window corners (sanity on the formula composition)."""
    rows = spark.range(1).select(
        *[
            c.alias(n)
            for c, n in zip(
                glcf_to_modis_px(F.lit(GX0), F.lit(GY0)), ("sx", "sy")
            )
        ]
    ).collect()[0]
    lng = GLCFGrid.GEOT[0] + (GX0 + 0.5) * GLCFGrid.GEOT[1]
    lat = GLCFGrid.GEOT[3] + (GY0 + 0.5) * GLCFGrid.GEOT[5]
    xm = MODIS_SPHERE_R * math.radians(lng) * math.cos(math.radians(lat))
    ym = MODIS_SPHERE_R * math.radians(lat)
    assert rows["sx"] == pytest.approx(
        math.floor((xm - MODISGrid.GEOT[0]) / MODISGrid.GEOT[1]), abs=1
    )
    assert rows["sy"] == pytest.approx(
        math.floor((ym - MODISGrid.GEOT[3]) / MODISGrid.GEOT[5]), abs=1
    )
