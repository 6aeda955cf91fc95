"""S7 file catalog: regex name parsing + per-tile coverage (reference
modis.py:17-24, 54-110)."""

from __future__ import annotations

import datetime as dt


def test_parse_modis_paths(spark):
    from rastercube_spark.sources.catalog import catalog_by_tile, parse_modis_paths

    names = [
        "/raw/MOD13Q1.A2016017.h10v08.005.2016034145345.hdf",
        "/raw/MOD13Q1.A2016033.h10v08.005.2016050000000.hdf",
        "/raw/MOD13Q1.A2016017.h11v09.005.2016034145345.hdf",
        "/raw/readme.txt",  # dropped
        "/raw/MYD13Q1.A2016017.h10v08.005.2016034145345.hdf",
    ]
    df = spark.createDataFrame([(n,) for n in names], "path string")
    parsed = parse_modis_paths(df)
    rows = {r["path"]: r for r in parsed.collect()}
    assert len(rows) == 4 and "/raw/readme.txt" not in rows

    r = rows["/raw/MOD13Q1.A2016017.h10v08.005.2016034145345.hdf"]
    assert (r["product"], r["tile_h"], r["tile_v"]) == ("MOD13Q1", 10, 8)
    # A2016017 = 2016 day 17 = Jan 17
    assert r["ts_ms"] == int(
        dt.datetime(2016, 1, 17, tzinfo=dt.timezone.utc).timestamp() * 1000
    )

    cat = {(r["tile_h"], r["tile_v"]): r for r in catalog_by_tile(parsed).collect()}
    assert cat[(10, 8)]["n_files"] == 3 and cat[(10, 8)]["n_dates"] == 2
    assert cat[(11, 9)]["n_files"] == 1
