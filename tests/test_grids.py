"""Worldgrid tile↔cell arithmetic, mirroring the reference's own test
strategy (reference tests/worldgrid/test_grids.py:8-36: tile/cell
coherence + exact full-coverage of a tile by its cells)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rastercube_spark.functions.grids import (
    GLCFGrid,
    MODISGrid,
    cells_for_tiles_df,
    glcf_cube_header,
    modis_cube_header,
)


def test_tile_for_cell_coherence():
    h, v = 10, 8
    cells = MODISGrid.cells_for_tile(h, v)
    assert len(cells) == MODISGrid.CELLS_PER_TILE_X * MODISGrid.CELLS_PER_TILE_Y
    for cell in cells:
        assert MODISGrid.tile_for_cell(cell) == (h, v)


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(0, MODISGrid.N_TILES_X - 1),
    v=st.integers(0, MODISGrid.N_TILES_Y - 1),
)
def test_tile_cell_bijection(h, v):
    """Every cell of every tile maps back to its tile; tiles are disjoint
    by construction of the row-major numbering."""
    cells = MODISGrid.cells_for_tile(h, v)
    assert len(set(cells)) == len(cells)
    assert all(MODISGrid.tile_for_cell(c) == (h, v) for c in cells)


def test_cell_indices_cover_tile_exactly():
    """Filling a tile-sized array through cell_indices_in_tile covers
    every pixel exactly once (≡ reference test_grids.py:18-36)."""
    h, v = 20, 11
    tile = np.zeros((MODISGrid.TILE_H, MODISGrid.TILE_W), dtype=np.int16)
    for cell in MODISGrid.cells_for_tile(h, v):
        (i0, i1), (j0, j1) = MODISGrid.cell_indices_in_tile(cell, h, v)
        tile[i0:i1, j0:j1] += 1
    np.testing.assert_array_equal(tile, np.ones_like(tile))


def test_cell_indices_wrong_tile_raises():
    cell = MODISGrid.cells_for_tile(3, 4)[0]
    with pytest.raises(ValueError):
        MODISGrid.cell_indices_in_tile(cell, 3, 5)


def test_cell_is_frac_num_on_real_header():
    """A MODIS cell number IS the frac_num of the real-grid cube header:
    the tile origin pixel of any cell falls in fraction == cell."""
    hdr = modis_cube_header([0])
    for cell in (0, 431, 432, MODISGrid.cells_for_tile(35, 17)[-1]):
        i, j = divmod(cell, MODISGrid.N_CELLS_X)
        x, y = j * MODISGrid.CELL_W, i * MODISGrid.CELL_H
        assert hdr.frac_for_xy(x, y) == cell


def test_glcf_cell_for_tile():
    # VU3334: rows V/U → grid row 1, cols 33/34 → grid col 16
    assert GLCFGrid.cell_for_tile("VU3334") == 1 * 30 + 16
    # top-left tile
    assert GLCFGrid.cell_for_tile("XW0102") == 0
    hdr = glcf_cube_header([0])
    assert hdr.num_fracs == GLCFGrid.N_CELLS_X * GLCFGrid.N_CELLS_Y


def test_real_headers_geometry():
    m, g = modis_cube_header([0]), glcf_cube_header([0])
    # both grids are centered on the projection origin
    assert m.geot[0] == pytest.approx(-m.geot[1] * MODISGrid.WIDTH / 2)
    assert g.geot[0] == pytest.approx(-g.geot[1] * GLCFGrid.WIDTH / 2)
    assert "Sinusoidal" in m.sr_wkt and "WGS 84" in g.sr_wkt


def test_cells_for_tiles_df(spark):
    df = cells_for_tiles_df(spark, [(10, 8), (11, 8)])
    assert df.count() == 2 * 144
    back = {
        (r["tile_h"], r["tile_v"])
        for r in df.select("tile_h", "tile_v").distinct().collect()
    }
    assert back == {(10, 8), (11, 8)}
