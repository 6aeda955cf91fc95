"""CLI surface (reference user-script analogs): full cube workflow +
query runner, in-process (main() reuses the active session)."""

from __future__ import annotations

import numpy as np
import pytest

from rastercube_spark.cli import main
from rastercube_spark.sources.geotiff import read_geotiff


@pytest.fixture()
def tiles(tmp_path):
    rng = np.random.RandomState(8)
    full = rng.randint(-2000, 10001, size=(40, 40, 3)).astype(np.int16)
    for t in range(3):
        np.save(tmp_path / f"tile_0_0_t{t}.npy", full[:, :, t])
    extra = rng.randint(-2000, 10001, size=(40, 40, 1)).astype(np.int16)
    np.save(tmp_path / "extra.npy", extra)
    return str(tmp_path), full, extra


def test_cli_cube_workflow(spark, tiles, capsys):
    w, full, extra = tiles
    assert main([
        "create-cube", "--root", f"{w}/cube", "--tiles", f"{w}/tile_*.npy",
        "--width", "40", "--height", "40", "--frac-ndates", "2",
        "--nodata=-3000", "--timestamps", "0,100,200",
    ]) == 0
    assert main(["info", f"{w}/cube"]) == 0
    assert '"ndates": 3' in capsys.readouterr().out

    assert main(["append-cube", "--root", f"{w}/cube",
                 "--array", f"{w}/extra.npy", "--timestamps", "300"]) == 0
    assert "appended" in capsys.readouterr().out
    assert main(["append-cube", "--root", f"{w}/cube",
                 "--array", f"{w}/extra.npy", "--timestamps", "300"]) == 0
    assert "no-op" in capsys.readouterr().out

    assert main(["cube-stats", f"{w}/cube"]) == 0
    assert main(["export-tiff", "--root", f"{w}/cube", "--out", f"{w}/o.tif",
                 "--window", "0,0,40,40", "--t", "3"]) == 0
    arr, _, _ = read_geotiff(f"{w}/o.tif")
    np.testing.assert_array_equal(arr, extra[:, :, 0])


def test_cli_queries_and_errors(spark, capsys, sf_dir):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "q20_tpch_q1_agg\toracle" in out and len(out.splitlines()) >= 70

    assert main(["run", "q40_global_topk", "--sf-dir", sf_dir, "--rows", "3"]) == 0
    assert main(["run", "q_bogus"]) == 2
    assert "unknown query" in capsys.readouterr().err
    assert main(["explain", "q40_global_topk", "--sf-dir", sf_dir]) == 0
    assert "TakeOrderedAndProject" in capsys.readouterr().out

    with pytest.raises(SystemExit) as e:
        main(["info", "/nonexistent"])
    assert e.value.code == 2


def test_cli_reload_fraction(spark, tiles, capsys):
    """create-cube → corrupt one fraction → reload-fraction restores it
    (reference reload_fraction_worldgrid.py as a CLI verb)."""
    from pyspark.sql import functions as F

    from rastercube_spark.sources.raster import RasterCube

    w, full, _extra = tiles
    assert main([
        "create-cube", "--root", f"{w}/cube2", "--tiles", f"{w}/tile_*.npy",
        "--width", "40", "--height", "40", "--frac-ndates", "2",
        "--nodata=-3000", "--timestamps", "0,100,200",
    ]) == 0
    cube = RasterCube.open(f"{w}/cube2")
    bad = cube.df(spark).where("frac_num = 0").withColumn(
        "value", F.lit(77).cast("smallint")
    )
    (
        bad.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("frac_num", "time_chunk")
        .parquet(cube.data_path)
    )
    assert main([
        "reload-fraction", "--root", f"{w}/cube2", "--frac", "0",
        "--tiles", f"{w}/tile_*.npy",
    ]) == 0
    assert "reloaded fraction 0" in capsys.readouterr().out
    got = cube.load_slice_array(spark, (0, 0), (40, 40))
    np.testing.assert_array_equal(got, full)
