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


def test_list_files_df_end_to_end(spark, tmp_path):
    """Filesystem → metadata-only listing → parse → per-tile catalog,
    and the listing's plan must not read file CONTENT (pruned away)."""
    from rastercube_spark.sources.catalog import (
        catalog_by_tile,
        list_files_df,
        parse_modis_paths,
    )

    names = [
        "MOD13Q1.A2016017.h10v08.005.2016034145345.hdf",
        "MOD13Q1.A2016033.h10v08.005.2016050000000.hdf",
        "notes.txt",
    ]
    for n in names:
        (tmp_path / n).write_bytes(b"x" * 64)

    listing = list_files_df(spark, str(tmp_path))
    plan = listing._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan, "listing must not materialize file bytes"

    parsed = parse_modis_paths(listing)
    cat = catalog_by_tile(parsed).collect()
    assert len(cat) == 1
    assert cat[0]["n_files"] == 2 and cat[0]["n_dates"] == 2
