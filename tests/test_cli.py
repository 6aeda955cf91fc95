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

    assert main(["export-tiles", "--root", f"{w}/cube", "--out", f"{w}/tiles",
                 "--t", "0"]) == 0
    assert '"tiles":' in capsys.readouterr().out
    from rastercube_spark.sources.geotiff import read_tiled_export

    stitched, _ = read_tiled_export(f"{w}/tiles")
    np.testing.assert_array_equal(stitched, full[:, :, 0])

    # --compress opt-outs (r9): uncompressed export verbs still
    # round-trip and the manifest records the opt-out
    import json as _json

    assert main(["export-tiff", "--root", f"{w}/cube", "--out", f"{w}/u.tif",
                 "--window", "0,0,40,40", "--t", "0",
                 "--compress", "none"]) == 0
    capsys.readouterr()
    arr_u, _, _ = read_geotiff(f"{w}/u.tif")
    np.testing.assert_array_equal(arr_u, full[:, :, 0])
    assert main(["export-tiles", "--root", f"{w}/cube",
                 "--out", f"{w}/tiles_u", "--t", "0",
                 "--compress", "none"]) == 0
    capsys.readouterr()
    with open(f"{w}/tiles_u/manifest.json") as f:
        assert _json.load(f)["compression"] is None
    stitched_u, _ = read_tiled_export(f"{w}/tiles_u")
    np.testing.assert_array_equal(stitched_u, full[:, :, 0])


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


def test_cli_collect_dates(spark, tmp_path, capsys):
    """collect-dates mirrors ndvi_collect_dates.py: sorted ISO dates for
    one tile, written to a file."""
    names = [
        "MOD13Q1.A2016033.h10v09.005.2016050000000.hdf",
        "MOD13Q1.A2016017.h10v09.005.2016034145345.hdf",
        "MOD13Q1.A2016017.h11v09.005.2016034145345.hdf",  # other tile
        "MYD13Q1.A2016049.h10v09.005.2016066000000.hdf",  # aqua
    ]
    for n in names:
        (tmp_path / n).write_bytes(b"x")
    out = tmp_path / "dates.csv"
    assert main([
        "collect-dates", "--src", str(tmp_path), "--tile", "h10v09",
        "--satellite", "terra", "--out", str(out),
    ]) == 0
    assert out.read_text().splitlines() == ["2016-01-17", "2016-02-02"]
    assert main([
        "collect-dates", "--src", str(tmp_path), "--tile", "h10v09",
    ]) == 0
    assert "2016-02-18" in capsys.readouterr().out  # aqua date included


def test_cli_regions(tmp_path, capsys):
    """regions verb: list collections and resolve a regspec (reference
    regions.py first-use flow) without a Spark session."""
    import json

    from rastercube_spark.sources.vector import write_geojson

    gj = str(tmp_path / "zones.geojson")
    write_geojson(gj, {"a": [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]})
    assert main(["regions", "--geojson", gj]) == 0
    listing = json.loads(capsys.readouterr().out)
    assert listing == {"zones": ["a"]}
    assert main(["regions", "--geojson", gj, "--region", "zones.a"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["region"] == "zones.a"
    assert got["ring"][0] == [0.0, 0.0] and len(got["ring"]) == 4
    # unknown collection/region/regspec: clean nonzero exit + stderr
    # message, never a raw traceback (ADVICE r05)
    for spec in ("nope.a", "zones.nope", "zones"):
        assert main(["regions", "--geojson", gj, "--region", spec]) == 2
        err = capsys.readouterr().err
        assert err.startswith("regions: ") and "Traceback" not in err
    assert main(["regions", "--region", "any.a"]) == 2  # nothing registered
    assert "regions: " in capsys.readouterr().err


def test_cli_query_region(spark, tiles, capsys):
    """query-region verb: named-region zonal stats over a cube — the
    reference notebook one-liner (regions.py:119-130) end-to-end:
    geojson catalog → ray-cast mask → engine aggregate, verified
    against the source array's numpy slice."""
    import json

    from rastercube_spark.sources.vector import write_geojson

    w, full, _ = tiles
    assert main([
        "create-cube", "--root", f"{w}/qr_cube", "--tiles",
        f"{w}/tile_*.npy", "--width", "40", "--height", "40",
        "--frac-ndates", "2", "--nodata=-3000", "--timestamps", "0,100,200",
    ]) == 0
    capsys.readouterr()
    gj = f"{w}/zones.geojson"
    # rectangle in grid pixel coords: centers x∈[5,20), y∈[5,15)
    write_geojson(
        gj,
        {"box": [(5.0, 5.0), (20.0, 5.0), (20.0, 15.0), (5.0, 15.0), (5.0, 5.0)]},
    )
    assert main([
        "query-region", "--root", f"{w}/qr_cube", "--region", "zones.box",
        "--geojson", gj, "--t", "1",
    ]) == 0
    got = json.loads(capsys.readouterr().out)
    window = full[5:15, 5:20, 1].astype("int64")
    assert got["n_px"] == window.size
    assert got["n_valid"] == int((window != -3000).sum())
    assert got["min"] == int(window.min()) and got["max"] == int(window.max())
    assert got["mean"] == round(float(window.mean()), 6)
    # unknown region: clean error, no traceback
    assert main([
        "query-region", "--root", f"{w}/qr_cube", "--region", "zones.nope",
        "--geojson", gj,
    ]) == 2
    assert "query-region: " in capsys.readouterr().err


def test_cli_download_modis(tmp_path, capsys, monkeypatch):
    """download-modis verb drives the acquisition flow offline."""
    import json

    import rastercube_spark.sources.acquire as A

    root = tmp_path / "www"
    d = root / "2016.01.17"
    d.mkdir(parents=True)
    f = "MOD13Q1.A2016017.h10v08.005.2016034145345.hdf"
    (d / "index.html").write_text(f'<html><a href="{f}">{f}</a></html>')
    (d / f).write_bytes(b"HDFDATA")
    (root / "index.html").write_text(
        '<html><a href="2016.01.17/">2016.01.17/</a></html>'
    )
    real_fetch = A._fetch
    monkeypatch.setattr(
        A,
        "_fetch",
        lambda u, op=None: real_fetch(
            u + "index.html" if u.endswith("/") else u, op
        ),
    )
    assert main([
        "download-modis", "--base-url", f"{root.as_uri()}/",
        "--mirror-dir", str(tmp_path / "m"),
        "--hdf-dir", str(tmp_path / "h"),
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep == {"pages_fetched": 1, "advertised": 1, "downloaded": 1}
    assert (tmp_path / "h" / "2016" / f).read_bytes() == b"HDFDATA"


def test_cli_decontaminate(spark, tmp_path, capsys):
    """decontaminate verb flags corpus docs leaking eval text and writes
    the flagged parquet."""
    import json

    ev_dir = str(tmp_path / "eval")
    # use two real corpus docs as the "benchmark" -> they flag themselves
    from rastercube_spark.sources.tables import load

    load(spark, "/root/testdata/sf0.001", "documents").where(
        "doc_id < 2"
    ).select("doc_id", "text").write.parquet(ev_dir)
    out = str(tmp_path / "flagged")
    assert main([
        "decontaminate", "--sf-dir", "/root/testdata/sf0.001",
        "--eval-set", ev_dir, "--out", out, "--k", "5",
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["contaminated_docs"] >= 2  # at least the eval docs themselves
    assert spark.read.parquet(out).count() == rep["contaminated_docs"]


def test_cli_sample_corpus(spark, tmp_path, capsys):
    """sample-corpus verb applies a JSON mixture spec (down- and
    up-weights) deterministically and reports per-source counts."""
    import json

    spec = {f"src{i}": (0.5 if i % 2 else 2.5) for i in range(20)}
    spec_path = str(tmp_path / "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    out = str(tmp_path / "sampled")
    assert main([
        "sample-corpus", "--sf-dir", "/root/testdata/sf0.001",
        "--spec", spec_path, "--out", out,
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["output"] == spark.read.parquet(out).count()
    from rastercube_spark.sources.tables import load

    per_in = {
        r["source"]: r["n"]
        for r in load(spark, "/root/testdata/sf0.001", "documents")
        .groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for s, n_out in rep["per_source"].items():
        if spec[s] == 0.5:
            assert 0 < n_out < per_in[s]
        else:  # 2.5x: between 2x and 3x of the source
            assert 2 * per_in[s] <= n_out <= 3 * per_in[s]
    # deterministic: a second run emits the identical multiset
    out2 = str(tmp_path / "sampled2")
    assert main([
        "sample-corpus", "--sf-dir", "/root/testdata/sf0.001",
        "--spec", spec_path, "--out", out2,
    ]) == 0
    capsys.readouterr()
    a = sorted(map(tuple, spark.read.parquet(out).select("doc_id", "copy").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2).select("doc_id", "copy").collect()))
    assert a == b


def test_cli_corpus_overlap_anchor_modes(spark, tmp_path, capsys):
    """corpus-overlap verb exposes qd8's anchor scale policy (VERDICT
    r10 "Next round" #4): full replays the exact anchor, sampled
    records the effective rate + CI, none NULLs the anchor columns —
    all from the shipped CLI, no Python."""
    import json

    from rastercube_spark.sources.tables import load

    other = str(tmp_path / "snapshot_b")
    load(spark, "/root/testdata/sf0.001", "documents").where(
        "doc_id % 2 = 0"
    ).select("doc_id", "text").write.parquet(other)

    def run(*extra):
        assert main([
            "corpus-overlap", "--sf-dir", "/root/testdata/sf0.001",
            "--other", other, *extra,
        ]) == 0
        return json.loads(capsys.readouterr().out)

    full = run("--anchor", "full")
    assert full["n_perms"] == 16
    assert full["anchor_rate"] == 1.0 and full["anchor_ci95"] == 0.0
    assert 0.0 < full["exact_jaccard"] <= 1.0

    samp = run("--anchor", "sampled", "--anchor-rate", "0.25")
    assert samp["anchor_rate"] == pytest.approx(0.25, abs=1e-5)
    assert samp["anchor_ci95"] > 0.0
    # same sketch estimate; sampled anchor is a consistent estimator
    assert samp["est_jaccard"] == full["est_jaccard"]

    none = run("--anchor", "none")
    assert none["exact_jaccard"] is None
    assert none["anchor_rate"] is None
    assert none["within_03"] is None
    assert none["est_jaccard"] == full["est_jaccard"]

    # invalid rate surfaces as a clean CLI error, not a traceback
    assert main([
        "corpus-overlap", "--sf-dir", "/root/testdata/sf0.001",
        "--other", other, "--anchor", "sampled", "--anchor-rate", "0",
    ]) == 2
    assert "anchor_rate" in capsys.readouterr().err


def test_cli_sample_corpus_bad_spec(tmp_path, capsys):
    bad = str(tmp_path / "nope.json")
    assert main([
        "sample-corpus", "--sf-dir", "/root/testdata/sf0.001",
        "--spec", bad, "--out", str(tmp_path / "x"),
    ]) == 2
    assert "bad spec" in capsys.readouterr().err


def test_cli_source_overlap(spark, capsys):
    """source-overlap verb prints one JSON pair-row per overlapping
    source pair, with containment in (0, 1]."""
    import json

    assert main(["source-overlap", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert lines, "expected at least one overlapping source pair"
    for r in lines:
        assert r["src_a"] < r["src_b"]
        assert 0 < r["overlap"] <= 1.0
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])


def test_cli_search(spark, capsys):
    """search verb prints BM25 top-k JSON lines, scores descending."""
    import json

    assert main([
        "search", "--sf-dir", "/root/testdata/sf0.001",
        "--terms", "DUP", "dup", "query",
        "--k", "5",
    ]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert 0 < len(lines) <= 5
    scores = [r["score"] for r in lines]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms"] <= 2 for r in lines)  # terms deduped


def test_cli_knn_methods_agree_on_exact_neighbors(spark, capsys):
    """knn verb: all four methods emit JSON rows keyed (q_id, vec_id,
    rank); ivfpq's top-1 for a self-excluded query matches brute's
    top-1 when that neighbor survives the probe (smoke of the composed
    path through the CLI, not a recall re-measurement — that gate
    lives in test_similarity)."""
    import json

    def run(method):
        assert main([
            "knn", "--sf-dir", "/root/testdata/sf0.001",
            "--query-ids", "0", "--k", "3", "--method", method,
        ]) == 0
        rows = [json.loads(line)
                for line in capsys.readouterr().out.strip().splitlines()]
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert all(r["q_id"] == 0 and r["vec_id"] != 0 for r in rows)
        return rows

    brute = run("brute")
    ivfpq = run("ivfpq")
    # deterministic corpora + deterministic training: the composed
    # path's neighbor SET overlaps brute's top-3 (>=1 common id)
    assert {r["vec_id"] for r in brute} & {r["vec_id"] for r in ivfpq}
    run("ivf")
    run("pq")


def test_cli_dup_rate(spark, capsys):
    """dup-rate verb prints one JSON line per threshold with a shared
    n_pairs and a rate in [0, 1]."""
    import json

    assert main([
        "dup-rate", "--sf-dir", "/root/testdata/sf0.001",
        "--threshold", "0.8", "--threshold", "0.5",
    ]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert [r["threshold"] for r in lines] == [0.5, 0.8]
    assert len({r["n_pairs"] for r in lines}) == 1
    assert all(0.0 <= r["dup_rate"] <= 1.0 for r in lines)


def test_cli_repeated_spans(spark, capsys):
    """repeated-spans verb prints worst offenders first with consistent
    span arithmetic (dup_tokens ≤ dl, n_spans ≥ 1)."""
    import json

    assert main([
        "repeated-spans", "--sf-dir", "/root/testdata/sf0.001",
        "--k", "5", "--top", "10",
    ]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert 0 < len(lines) <= 10
    fracs = [r["dup_frac"] for r in lines]
    assert fracs == sorted(fracs, reverse=True)
    assert all(r["n_spans"] >= 1 and r["dup_tokens"] <= r["dl"] for r in lines)


def test_cli_budget_select(spark, capsys):
    """budget-select verb prints a per-source summary honoring the
    budget; unknown lang refuses with exit 2."""
    import json

    assert main([
        "budget-select", "--sf-dir", "/root/testdata/sf0.001",
        "--budget", "300",
    ]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) > 0
    assert all(r["tok_sel"] <= 300 for r in lines)
    assert main(["budget-select", "--lang", "xx"]) == 2
    assert "unknown lang" in capsys.readouterr().err


def test_cli_semantic_decontaminate(spark, capsys):
    """semantic-decontaminate verb prints the top-k closest training
    vectors, max_sim descending."""
    import json

    assert main([
        "semantic-decontaminate", "--sf-dir", "/root/testdata/sf0.001",
        "--top", "5",
    ]) == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert 0 < len(lines) <= 5
    sims = [r["max_sim"] for r in lines]
    assert sims == sorted(sims, reverse=True)
    assert all(isinstance(r["contaminated"], bool) for r in lines)


def test_cli_build_ann_index_and_probe(spark, tmp_path, capsys):
    """build-ann-index materializes the cid-partitioned codes parquet +
    quantizer JSON (VERDICT r12 #3), and `knn --method ivfpq-index`
    probes it, matching the inline ivfpq path row-for-row."""
    import json
    import os

    idx = str(tmp_path / "idx")
    assert main([
        "build-ann-index", "--sf-dir", "/root/testdata/sf0.001",
        "--out", idx,
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_vectors"] == 500 and rep["n_coarse"] == 16
    assert os.path.exists(os.path.join(idx, "index.json"))
    # cid partitioning is real on disk (cid=NN directories)
    parts = [d for d in os.listdir(os.path.join(idx, "codes"))
             if d.startswith("cid=")]
    assert len(parts) > 1

    assert main([
        "knn", "--sf-dir", "/root/testdata/sf0.001", "--query-ids", "0",
        "1", "--method", "ivfpq-index", "--index", idx,
    ]) == 0
    persisted = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()]
    assert main([
        "knn", "--sf-dir", "/root/testdata/sf0.001", "--query-ids", "0",
        "1", "--method", "ivfpq",
    ]) == 0
    inline = [json.loads(ln) for ln in
              capsys.readouterr().out.strip().splitlines()]
    assert persisted == inline and len(persisted) == 20

    # missing --index refuses loudly
    assert main([
        "knn", "--sf-dir", "/root/testdata/sf0.001", "--query-ids", "0",
        "--method", "ivfpq-index",
    ]) == 2


def test_cli_r13_audit_verbs(spark, capsys):
    """The r13 audits are user-reachable: langid-confusion prints
    confusion cells summing to the corpus size, template-prefixes
    honors min-docs, dup-matrix prints source-pair cells."""
    import json

    assert main([
        "langid-confusion", "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    cells = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert sum(c["n_docs"] for c in cells) == 500
    assert all(set(c) == {"lang", "pred", "n_docs"} for c in cells)

    assert main([
        "template-prefixes", "--sf-dir", "/root/testdata/sf0.001",
        "--k-tokens", "2",
    ]) == 0
    rows = [json.loads(ln) for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["n_docs"] >= 2 for r in rows)

    assert main([
        "dup-matrix", "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    cells = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert cells and all(c["src_a"] <= c["src_b"] for c in cells)


def test_cli_clean_corpus_chunked(spark, tmp_path, capsys):
    """clean-corpus --chunk-tokens writes training sequences and the
    report carries chunk totals consistent with the parquet."""
    import json

    out = str(tmp_path / "seqs")
    assert main([
        "clean-corpus", "--sf-dir", "/root/testdata/sf0.001",
        "--out", out, "--chunk-tokens", "32",
    ]) == 0
    rep = json.loads(capsys.readouterr().out)
    got = spark.read.parquet(out)
    assert rep["chunks"] == got.count() > 0
    assert {"doc_id", "chunk_idx", "n_tokens", "chunk"} <= set(got.columns)
