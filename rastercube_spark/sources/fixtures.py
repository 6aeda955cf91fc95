"""Deterministic raster-cube fixture generator (FIXTURES.md).

Materializes the long/relational form of the reference's jGrid data model
(reference: rastercube/jgrid/jgrid3.py:1-34) as seeded parquet under
``fixtures/`` so that Spark and the DuckDB oracle read identical bytes.

Grid geometry (FIXTURES.md §1): 160×120 px, fraction 20×20 → 8×6 = 48
fractions, row-major frac numbering (reference jgrid3.py:278-296);
11 timestamps at 16-day cadence from 2000-02-18, frac_ndates = 5 →
time_chunk = t // 5 with a ragged last chunk (reference jgrid3.py:151-164).
NDVI nodata sentinel −3000 (reference datasources/modis.py:208), QA nodata
65535 (modis.py:209). ~3 whole fractions absent (sparse grid,
jgrid3.py:22-23).

Run once: ``python -m rastercube_spark.sources.fixtures``
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
WIDTH, HEIGHT = 160, 120
FRAC_W = FRAC_H = 20
FRACS_X = WIDTH // FRAC_W  # 8
NDATES = 11
FRAC_NDATES = 5
NODATA_NDVI = -3000
NODATA_QA = 65535
T0 = _dt.datetime(2000, 2, 18)
CADENCE_DAYS = 16

# Whole fractions absent from each grid (sparse). qa additionally misses one
# fraction ndvi has, so availability joins (J3/J4) are non-trivial.
MISSING_FRACS_NDVI = (7, 21, 40)
MISSING_FRACS_QA = (7, 21, 40, 13)
# 'out' grid in chunk_catalog misses a subset → incremental anti-join (J4).
OUT_MISSING = {(3, 0), (3, 1), (3, 2), (17, 1), (29, 0), (44, 2)}


def _timestamps() -> list[_dt.datetime]:
    return [T0 + _dt.timedelta(days=CADENCE_DAYS * t) for t in range(NDATES)]


def _qa_values(rng: np.random.RandomState, n: int) -> np.ndarray:
    """16-bit MODIS QA words covering every gate of modis_qa.pyx:22-103."""
    modland = rng.choice([0, 1, 2, 3], size=n, p=[0.55, 0.25, 0.1, 0.1])
    usefulness = rng.choice(16, size=n)
    aerosol = rng.choice([0, 1, 2, 3], size=n, p=[0.3, 0.3, 0.25, 0.15])
    adj_cloud = rng.choice([0, 1], size=n, p=[0.8, 0.2])
    brdf = rng.choice([0, 1], size=n)
    mixed_cloud = rng.choice([0, 1], size=n, p=[0.85, 0.15])
    land_water = rng.choice(8, size=n, p=[0.05, 0.6, 0.1, 0.05, 0.05, 0.05, 0.05, 0.05])
    snow = rng.choice([0, 1], size=n, p=[0.9, 0.1])
    shadow = rng.choice([0, 1], size=n, p=[0.9, 0.1])
    qa = (
        modland
        | (usefulness << 2)
        | (aerosol << 6)
        | (adj_cloud << 8)
        | (brdf << 9)
        | (mixed_cloud << 10)
        | (land_water << 11)
        | (snow << 14)
        | (shadow << 15)
    ).astype(np.int64)
    # sprinkle the nodata word
    qa[rng.rand(n) < 0.01] = NODATA_QA
    return qa.astype(np.int32)


def _pixel_frame(missing_fracs: tuple[int, ...], rng: np.random.RandomState):
    x = np.repeat(np.arange(WIDTH, dtype=np.int32), HEIGHT * NDATES)
    y = np.tile(np.repeat(np.arange(HEIGHT, dtype=np.int32), NDATES), WIDTH)
    t = np.tile(np.arange(NDATES, dtype=np.int32), WIDTH * HEIGHT)
    frac = (y // FRAC_H) * FRACS_X + (x // FRAC_W)
    keep = ~np.isin(frac, missing_fracs)
    return x[keep], y[keep], t[keep], frac[keep].astype(np.int32)


def build(out_dir: str = "/root/repo/fixtures") -> None:
    rng = np.random.RandomState(SEED)
    ts_list = _timestamps()
    ts_arr = np.array([np.datetime64(d, "us") for d in ts_list])

    # --- ndvi_pixels ---------------------------------------------------
    x, y, t, frac = _pixel_frame(MISSING_FRACS_NDVI, rng)
    n = len(x)
    ndvi = rng.randint(-2000, 10001, size=n).astype(np.int16)
    ndvi[rng.rand(n) < 0.05] = NODATA_NDVI
    qa = _qa_values(rng, n)
    tbl = pa.table(
        {
            "frac_num": frac,
            "time_chunk": (t // FRAC_NDATES).astype(np.int32),
            "x": x,
            "y": y,
            "t": t,
            "ts": ts_arr[t],
            "ndvi": ndvi,
            "qa": qa,
        }
    )
    pq.write_table(tbl, f"{out_dir}/ndvi_pixels.parquet")

    # --- qa_pixels (separate grid, own sparsity, for the J1 zip Q18) ---
    xq, yq, tq, fq = _pixel_frame(MISSING_FRACS_QA, rng)
    qa2 = _qa_values(rng, len(xq))
    tbl = pa.table(
        {
            "frac_num": fq,
            "time_chunk": (tq // FRAC_NDATES).astype(np.int32),
            "x": xq,
            "y": yq,
            "t": tq,
            "qa": qa2,
        }
    )
    pq.write_table(tbl, f"{out_dir}/qa_pixels.parquet")

    # --- glcf_pixels (single-date zones, co-partitioned geometry) ------
    xg = np.repeat(np.arange(WIDTH, dtype=np.int32), HEIGHT)
    yg = np.tile(np.arange(HEIGHT, dtype=np.int32), WIDTH)
    fg = ((yg // FRAC_H) * FRACS_X + (xg // FRAC_W)).astype(np.int32)
    classes = np.array(list(range(17)) + [254, 255], dtype=np.int32)
    w = np.array([1, 2, 8, 6, 4, 5, 3, 2, 2, 1, 4, 2, 6, 1, 1, 1, 2, 1, 1], float)
    zone = rng.choice(classes, size=len(xg), p=w / w.sum()).astype(np.int32)
    tbl = pa.table({"frac_num": fg, "x": xg, "y": yg, "zone_id": zone})
    pq.write_table(tbl, f"{out_dir}/glcf_pixels.parquet")

    # --- timestamps dimension ------------------------------------------
    tbl = pa.table(
        {
            "t": np.arange(NDATES, dtype=np.int32),
            "ts": ts_arr,
            "ts_ms": np.array(
                [int(d.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000) for d in ts_list],
                dtype=np.int64,
            ),
            "doy": np.array([d.timetuple().tm_yday for d in ts_list], dtype=np.int32),
        }
    )
    pq.write_table(tbl, f"{out_dir}/timestamps.parquet")

    # --- chunk_catalog ---------------------------------------------------
    n_tc = (NDATES + FRAC_NDATES - 1) // FRAC_NDATES
    rows_g, rows_f, rows_t = [], [], []
    all_fracs = range(FRACS_X * (HEIGHT // FRAC_H))
    for grid, missing in (
        ("ndvi", set(MISSING_FRACS_NDVI)),
        ("qa", set(MISSING_FRACS_QA)),
    ):
        for f in all_fracs:
            if f in missing:
                continue
            for tc in range(n_tc):
                rows_g.append(grid), rows_f.append(f), rows_t.append(tc)
    for f in all_fracs:
        if f in set(MISSING_FRACS_NDVI) | set(MISSING_FRACS_QA):
            continue
        for tc in range(n_tc):
            if (f, tc) in OUT_MISSING:
                continue
            rows_g.append("out"), rows_f.append(f), rows_t.append(tc)
    tbl = pa.table(
        {
            "grid_name": pa.array(rows_g, pa.string()),
            "frac_num": pa.array(rows_f, pa.int32()),
            "time_chunk": pa.array(rows_t, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/chunk_catalog.parquet")

    # --- region_polygons --------------------------------------------------
    polys = {
        # fully inside fraction 9 (x 20..39, y 20..39)
        "poly_small": [(24.5, 24.5), (36.5, 25.5), (35.5, 37.5), (23.5, 35.5), (24.5, 24.5)],
        # spans 4 fractions around (x=40, y=40) corner
        "poly_4frac": [(30.5, 30.5), (52.5, 32.5), (50.5, 52.5), (28.5, 50.5), (30.5, 30.5)],
        # partially off-grid (negative x)
        "poly_edge": [(-10.5, 60.5), (15.5, 58.5), (12.5, 80.5), (-8.5, 78.5), (-10.5, 60.5)],
        # concave polygon for ray-cast correctness
        "poly_concave": [
            (100.5, 20.5),
            (140.5, 20.5),
            (140.5, 60.5),
            (120.5, 40.5),
            (100.5, 60.5),
            (100.5, 20.5),
        ],
    }
    names, idxs, vxs, vys = [], [], [], []
    for name, verts in polys.items():
        for i, (vx, vy) in enumerate(verts):
            names.append(name), idxs.append(i), vxs.append(vx), vys.append(vy)
    tbl = pa.table(
        {
            "region_name": pa.array(names, pa.string()),
            "vertex_idx": pa.array(idxs, pa.int32()),
            "vx": pa.array(vxs, pa.float64()),
            "vy": pa.array(vys, pa.float64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/region_polygons.parquet")


if __name__ == "__main__":
    build()
    print("fixtures written")
