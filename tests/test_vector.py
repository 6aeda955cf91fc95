"""Vector source/sink (S9/S13): GeoJSON + shapefile round-trips, and the
loaded polygons drive the relational ray-cast identically to the parquet
fixture (reference shputils.py:11-111 load/write parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.polygon import points_in_polygon
from rastercube_spark.sources.tables import load
from rastercube_spark.sources.vector import (
    polygons_df,
    read_geojson,
    read_shapefile,
    write_geojson,
    write_shapefile,
)

CONCAVE = {
    "concave": [(10.0, 10.0), (60.0, 10.0), (60.0, 60.0), (35.0, 35.0),
                (10.0, 60.0), (10.0, 10.0)],
    "tri": [(70.0, 5.0), (90.0, 5.0), (80.0, 25.0), (70.0, 5.0)],
}


def test_geojson_roundtrip(tmp_path):
    p = str(tmp_path / "regions.geojson")
    write_geojson(p, CONCAVE)
    assert read_geojson(p) == CONCAVE


def test_shapefile_roundtrip(tmp_path):
    base = str(tmp_path / "regions")
    write_shapefile(base, CONCAVE)
    got = read_shapefile(base)
    assert set(got) == set(CONCAVE)
    for name in CONCAVE:
        assert got[name] == CONCAVE[name]


def test_shapefile_drives_raycast(spark, tmp_path):
    """Polygons loaded from a shapefile produce the same mask as the
    driver's parquet fixture for the same region geometry."""
    polys = load(spark, "", "region_polygons")
    name = polys.select("region_name").distinct().orderBy("region_name").first()[0]
    ring = [
        (r["vx"], r["vy"])
        for r in polys.where(F.col("region_name") == name)
        .orderBy("vertex_idx")
        .collect()
    ]
    base = str(tmp_path / "rt")
    write_shapefile(base, {name: ring})
    from_shp = polygons_df(spark, read_shapefile(base))

    pts = (
        spark.range(160)
        .select(F.col("id").cast("int").alias("x"))
        .crossJoin(spark.range(120).select(F.col("id").cast("int").alias("y")))
    )
    got = {
        (r["x"], r["y"])
        for r in points_in_polygon(pts, from_shp, name).select("x", "y").collect()
    }
    want = {
        (r["x"], r["y"])
        for r in points_in_polygon(pts, polys, name).select("x", "y").collect()
    }
    assert got == want and got


def test_region_catalog_lookup_and_mask(spark, tmp_path):
    """Named-region catalog (reference regions.py): register geojson +
    shapefile collections, resolve <collection>.<region> specs, and
    drive the relational ray-cast from a name alone."""
    import pytest

    from rastercube_spark.functions.regions import RegionCatalog

    cat = RegionCatalog()
    gj = str(tmp_path / "zones.geojson")
    write_geojson(gj, CONCAVE)
    assert cat.register_geojson(gj) == "zones"
    base = str(tmp_path / "tiles")
    write_shapefile(base, {"h10v09": CONCAVE["tri"]})
    cat.register_shapefile(base, name="tiles")

    assert cat.collections() == ["tiles", "zones"]
    assert cat.region_names("zones") == ["concave", "tri"]
    assert cat.polygon_for_region("zones.tri") == CONCAVE["tri"]
    # (lat, lng) accessor swaps the stored (lng, lat) file order
    assert cat.polygon_latlng("zones.tri")[0] == (5.0, 70.0)
    with pytest.raises(KeyError):
        cat.polygon_for_region("zones.nope")
    with pytest.raises(KeyError):
        cat.polygon_for_region("missing.x")
    with pytest.raises(ValueError):
        cat.polygon_for_region("noseparator")

    pts = (
        spark.range(100)
        .select(F.col("id").cast("int").alias("x"))
        .crossJoin(spark.range(30).select(F.col("id").cast("int").alias("y")))
    )
    inside = points_in_polygon(
        pts, cat.region_df(spark, "tiles"), "h10v09"
    ).count()
    # tri has vertices (70,5) (90,5) (80,25): area 200 → ~200 pixel centers
    assert 150 <= inside <= 250
