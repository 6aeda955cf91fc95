"""Ingest + export golden tests, in the spirit of the reference's
tests/scripts/test_create_ndvi_worldgrid.py:19-81 (ingest tiles → grid ≡
source arrays) and its tiff round-trip usage (tiff.py:92-122)."""

from __future__ import annotations

import numpy as np
import pytest

from rastercube_spark.sources.geotiff import (
    export_geotiff,
    ingest_tiles,
    read_geotiff,
    write_geotiff,
)
from rastercube_spark.sources.raster import CubeHeader, RasterCube

W, H, ND = 80, 40, 4
GEOT = (-1000.0, 25.0, 0.0, 500.0, 0.0, -25.0)


@pytest.fixture(scope="module")
def source(tmp_path_factory):
    """Synthesize the full grid + tile files: 2 tiles per date splitting
    the grid horizontally (tiles cross fraction boundaries, as MODIS tiles
    cross cell boundaries in the reference)."""
    rng = np.random.RandomState(5)
    full = rng.randint(-2000, 10001, size=(H, W, ND)).astype(np.int16)
    full[rng.rand(H, W, ND) < 0.04] = -3000
    tile_dir = tmp_path_factory.mktemp("tiles")
    for t in range(ND):
        np.save(tile_dir / f"tile_0_0_t{t}.npy", full[:, : W // 2, t])
        np.save(tile_dir / f"tile_{W // 2}_0_t{t}.npy", full[:, W // 2 :, t])
    return full, str(tile_dir)


@pytest.fixture(scope="module")
def ingested(spark, source, tmp_path_factory):
    full, tile_dir = source
    root = str(tmp_path_factory.mktemp("cube") / "ingested")
    cube = RasterCube(
        root,
        CubeHeader(
            width=W,
            height=H,
            frac_width=20,
            frac_height=20,
            dtype="int16",
            nodataval=-3000,
            frac_ndates=3,
            timestamps_ms=list(range(ND)),
            geot=GEOT,
        ),
    )
    ingest_tiles(spark, cube, f"{tile_dir}/*.npy")
    return cube, full


def test_ingest_golden(spark, ingested):
    cube, full = ingested
    got = cube.load_slice_array(spark, (0, 0), (W, H))
    np.testing.assert_array_equal(got, full)


def test_ingest_partitions_layout(spark, ingested):
    cube, _ = ingested
    parts = (
        cube.df(spark).select("frac_num", "time_chunk").distinct().count()
    )
    # 4x2 fractions × 2 time chunks
    assert parts == 8 * 2


def test_geotiff_roundtrip(tmp_path):
    rng = np.random.RandomState(9)
    data = rng.randint(-3000, 10001, size=(33, 47)).astype(np.int16)
    p = str(tmp_path / "x.tif")
    write_geotiff(p, data, GEOT, nodataval=-3000)
    arr, geot, nodata = read_geotiff(p)
    np.testing.assert_array_equal(arr, data)
    assert geot == GEOT
    assert nodata == -3000


def test_export_window(spark, ingested, tmp_path):
    cube, full = ingested
    p = str(tmp_path / "win.tif")
    export_geotiff(spark, cube, p, (10, 5), (50, 35), t=2)
    arr, geot, nodata = read_geotiff(p)
    np.testing.assert_array_equal(arr, full[5:35, 10:50, 2])
    # geotransform shifted to the window origin
    assert geot[0] == GEOT[0] + 10 * GEOT[1]
    assert geot[3] == GEOT[3] + 5 * GEOT[5]
    assert nodata == -3000
