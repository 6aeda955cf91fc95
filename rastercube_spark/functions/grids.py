"""World grids: MODIS sinusoidal and GLCF WGS84 tile↔cell arithmetic.

Re-expresses the reference's worldgrid helpers (reference
rastercube/worldgrid/grids.py:7-218) for the Spark engine:

- the pure-int tile↔cell maps (``cells_for_tile`` / ``tile_for_cell`` /
  ``cell_indices_in_tile``) are driver-side *planning* math — they pick
  which cube partitions an ingest/reload touches, exactly like the
  reference uses them to route MODIS HDF tiles to jGrid fractions
  (reload_fraction_worldgrid.py:80-91);
- ``cells_for_tiles_df`` lifts the tile→cell map into a small DataFrame
  (the reference builds a driver dict, frac_tilename — here it is a
  broadcastable dim joinable against a file catalog at any scale);
- ``modis_cube_header`` / ``glcf_cube_header`` build first-class
  :class:`CubeHeader` instances on the REAL grids (geotransform + WKT
  from the reference constants), so reprojection between the two
  physical SRS (sinusoidal meters ↔ WGS84 degrees) runs on honest
  geometry, not synthetic fixtures.

Cell numbering is row-major over the cell grid (reference grids.py's
``np.ravel_multi_index((i, j), (n_cells_y, n_cells_x))``), which is
exactly the engine's ``frac_num`` layout (sources/raster.py
CubeHeader.frac_num), so a MODIS cell number IS the frac_num of the
matching cube partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rastercube_spark.sources.raster import CubeHeader


class MODISGrid:
    """MODIS sinusoidal worldgrid (reference grids.py:100-218): 36×18
    tiles of 4800×4800 px at ~231.656 m, chunked into 400×400 cells."""

    TILE_W = 4800
    TILE_H = 4800
    N_TILES_X = 36
    N_TILES_Y = 18
    CELL_W = 400
    CELL_H = 400

    CELLS_PER_TILE_X = TILE_W // CELL_W  # 12
    CELLS_PER_TILE_Y = TILE_H // CELL_H  # 12
    N_CELLS_X = TILE_W * N_TILES_X // CELL_W  # 432
    N_CELLS_Y = TILE_H * N_TILES_Y // CELL_H  # 216
    WIDTH = N_TILES_X * TILE_W
    HEIGHT = N_TILES_Y * TILE_H

    PIX_SIZE = (231.65635826374995, -231.65635826395834)
    GEOT = (
        -TILE_W * PIX_SIZE[0] * N_TILES_X / 2,
        PIX_SIZE[0],
        0.0,
        -TILE_H * PIX_SIZE[1] * N_TILES_Y / 2,
        0.0,
        PIX_SIZE[1],
    )
    # sr-org:6842 (public spec; reference grids.py:147-159)
    PROJ_WKT = (
        'PROJCS["unnamed",GEOGCS["Unknown datum based upon the custom '
        'spheroid",DATUM["Not specified (based on custom spheroid)",'
        'SPHEROID["Custom spheroid",6371007.181,0]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION["Sinusoidal"],'
        'PARAMETER["longitude_of_center",0],PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["Meter",1]]'
    )

    @classmethod
    def cells_for_tile(cls, tile_h: int, tile_v: int) -> list[int]:
        """All cell numbers covered by MODIS tile (h, v), row-major
        (≡ reference get_cells_for_tile, grids.py:163-181)."""
        return [
            i * cls.N_CELLS_X + j
            for i in range(
                tile_v * cls.CELLS_PER_TILE_Y, (tile_v + 1) * cls.CELLS_PER_TILE_Y
            )
            for j in range(
                tile_h * cls.CELLS_PER_TILE_X, (tile_h + 1) * cls.CELLS_PER_TILE_X
            )
        ]

    @classmethod
    def tile_for_cell(cls, cell: int) -> tuple[int, int]:
        """(tile_h, tile_v) containing a cell (≡ grids.py:187-192)."""
        i, j = divmod(cell, cls.N_CELLS_X)
        return j // cls.CELLS_PER_TILE_X, i // cls.CELLS_PER_TILE_Y

    @classmethod
    def tile_xy_from(cls, tile_h: int, tile_v: int) -> tuple[int, int]:
        """Global pixel origin of a tile (≡ grids.py:183-185)."""
        return tile_h * cls.TILE_W, tile_v * cls.TILE_H

    @classmethod
    def cell_indices_in_tile(
        cls, cell: int, tile_h: int, tile_v: int
    ) -> tuple[tuple[int, int], tuple[int, int]]:
        """((i_from, i_to), (j_from, j_to)) of the cell's pixels relative
        to the tile's array; to-bounds exclusive, so
        ``cell_data = tile_data[i_from:i_to, j_from:j_to]``
        (≡ grids.py:194-218)."""
        if cls.tile_for_cell(cell) != (tile_h, tile_v):
            raise ValueError(f"cell {cell} is not covered by tile ({tile_h}, {tile_v})")
        i, j = divmod(cell, cls.N_CELLS_X)
        y0 = i * cls.CELL_H - tile_v * cls.TILE_H
        x0 = j * cls.CELL_W - tile_h * cls.TILE_W
        return (y0, y0 + cls.CELL_H), (x0, x0 + cls.CELL_W)


class GLCFGrid:
    """GLCF WGS84 worldgrid (reference grids.py:7-98): 30×10 tiles of
    2880×3840 px at 1/240°, one cell per tile."""

    TILE_W = 2880
    TILE_H = 3840
    N_TILES_X = 30
    N_TILES_Y = 10
    CELL_W = TILE_W
    CELL_H = TILE_H
    N_CELLS_X = N_TILES_X
    N_CELLS_Y = N_TILES_Y
    WIDTH = N_TILES_X * TILE_W
    HEIGHT = N_TILES_Y * TILE_H

    PIX_SIZE = (0.004166666666667, -0.004166666666667)
    GEOT = (
        -TILE_W * PIX_SIZE[0] * N_TILES_X / 2,
        PIX_SIZE[0],
        0.0,
        -TILE_H * PIX_SIZE[1] * N_TILES_Y / 2,
        0.0,
        PIX_SIZE[1],
    )
    # EPSG:4326 (public spec; reference grids.py:58-67)
    PROJ_WKT = (
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
        'AUTHORITY["EPSG","4326"]]'
    )

    # UTM row letters → grid row (reference grids.py:70-74)
    ROW_MAP = {
        "X": 0, "W": 1, "V": 2, "U": 3, "T": 4, "S": 5, "R": 6, "Q": 7,
        "P": 8, "N": 9, "M": 10, "L": 11, "K": 12, "J": 13, "H": 14,
        "G": 15, "F": 16, "E": 17, "D": 18, "C": 19,
    }  # fmt: skip

    @classmethod
    def cell_for_tile(cls, tile: str) -> int:
        """Cell number for a GLCF UTM tile id like ``VU3334``
        (≡ grids.py:81-98): each GLCF tile covers a 2×2 block of UTM
        zones, so rows/cols are halved."""
        i = cls.ROW_MAP[tile[0].upper()] // 2
        j = (int(tile[2:4]) - 1) // 2
        return i * cls.N_CELLS_X + j


def cells_for_tiles_df(
    spark: SparkSession, tiles: list[tuple[int, int]]
) -> DataFrame:
    """The MODIS tile→cell map as a small DataFrame ``(tile_h, tile_v,
    cell)`` — broadcastable against a file catalog to route each tile
    file to its cube partitions (the reference's driver-side
    frac_tilename dict, reload_fraction_worldgrid.py:80-87, as a
    relation)."""
    rows = [
        (h, v, c) for (h, v) in tiles for c in MODISGrid.cells_for_tile(h, v)
    ]
    return spark.createDataFrame(rows, "tile_h int, tile_v int, cell int")


def modis_cube_header(
    timestamps_ms: list[int],
    dtype: str = "int16",
    nodataval: float | int = -3000,
    frac_ndates: int = 50,
    value_col: str = "v",
) -> CubeHeader:
    """A CubeHeader on the REAL MODIS sinusoidal worldgrid (fractions =
    MODIS cells, 400×400; geotransform/radius per reference
    grids.py:124-159)."""
    return CubeHeader(
        width=MODISGrid.WIDTH,
        height=MODISGrid.HEIGHT,
        frac_width=MODISGrid.CELL_W,
        frac_height=MODISGrid.CELL_H,
        dtype=dtype,
        nodataval=nodataval,
        frac_ndates=frac_ndates,
        timestamps_ms=timestamps_ms,
        geot=MODISGrid.GEOT,
        sr_wkt=MODISGrid.PROJ_WKT,
        value_col=value_col,
    )


def glcf_cube_header(
    timestamps_ms: list[int],
    dtype: str = "uint8",
    nodataval: float | int = 0,
    value_col: str = "v",
) -> CubeHeader:
    """A CubeHeader on the REAL GLCF WGS84 worldgrid (fractions = GLCF
    tiles, 2880×3840 at 1/240°; reference grids.py:44-67)."""
    return CubeHeader(
        width=GLCFGrid.WIDTH,
        height=GLCFGrid.HEIGHT,
        frac_width=GLCFGrid.CELL_W,
        frac_height=GLCFGrid.CELL_H,
        dtype=dtype,
        nodataval=nodataval,
        frac_ndates=max(1, len(timestamps_ms)),
        timestamps_ms=timestamps_ms,
        geot=GLCFGrid.GEOT,
        sr_wkt=GLCFGrid.PROJ_WKT,
        value_col=value_col,
    )


def glcf_to_modis_px(dst_x, dst_y):
    """Column mapping GLCF pixel index → covering MODIS pixel index:
    GLCF pixel center → (lat, lng) degrees (the GLCF geotransform IS
    WGS84 degrees) → sinusoidal meters → MODIS pixel (floor). For use
    with operators.resample.gather_nearest_crs — the whole chain is
    codegen'd column math, no GDAL."""
    from pyspark.sql import functions as F

    from rastercube_spark.functions.geo import latlng_to_modis_xy

    lng = F.lit(GLCFGrid.GEOT[0]) + (dst_x + F.lit(0.5)) * F.lit(GLCFGrid.GEOT[1])
    lat = F.lit(GLCFGrid.GEOT[3]) + (dst_y + F.lit(0.5)) * F.lit(GLCFGrid.GEOT[5])
    return latlng_to_modis_xy(lat, lng, gt=MODISGrid.GEOT)
