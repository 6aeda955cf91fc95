"""Oracle-comparison harness mirroring the driver's correctness gate:
row count + schema-insensitive, order-insensitive value comparison of a
Spark DataFrame vs DuckDB SQL over the same parquet tables.

Normalization mirrors the driver: columns sorted by name, rows sorted by
all columns, timestamps at microsecond precision (the engine truncates
nanos to µs on read; see sources/tables.py).

Floats are compared EXACTLY by default — the driver's gate is an exact
order-insensitive value hash, and a tolerance here once hid a driver-level
failure (qr07 in CORRECTNESS_r03: a 6th-decimal rounding flip is rel
~2e-10, invisible at 1e-9 tolerance, fatal to the hash). Queries whose
semantics are genuinely tolerance-bounded (e.g. libm-dependent math)
must opt in via ``float_tol``.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from rastercube_spark.sources.tables import FIXTURES_DIR, TABLES

FIXTURE_TABLE_NAMES = (
    "ndvi_pixels",
    "qa_pixels",
    "glcf_pixels",
    "timestamps",
    "chunk_catalog",
    "region_polygons",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for t in FIXTURE_TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{FIXTURES_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        # µs precision; engine-side nanos were truncated on read
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def _rows(cols: list[str], data: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in data]
    out.sort(key=_sort_key)
    return out


def _cells_equal(a, b, float_tol: float = 0.0) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        if float_tol == 0.0:
            return fa == fb  # bit-exact, like the driver's value hash
        return math.isclose(fa, fb, rel_tol=float_tol, abs_tol=float_tol)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _cells_equal(x, y, float_tol) for x, y in zip(a, b)
        )
    return a == b


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    float_tol: float = 0.0,
) -> dict:
    """Run both sides, return a comparison report dict (ok, counts, diffs)."""
    s_cols = spark_df.columns
    s_data = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_data = rel.fetchall()

    report: dict = {
        "ok": False,
        "spark_rows": len(s_data),
        "duck_rows": len(d_data),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(c.lower() for c in d_cols),
    }
    if sorted(c.lower() for c in s_cols) != report["duck_cols"]:
        report["error"] = "column-name mismatch"
        return report
    if len(s_data) != len(d_data):
        report["error"] = "row-count mismatch"
        return report
    sr = _rows(s_cols, s_data)
    dr = _rows(d_cols, d_data)
    bad = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(sr, dr))
        if not _cells_equal(a, b, float_tol)
    ]
    report["n_mismatch"] = len(bad)
    report["first_mismatches"] = bad[:5]
    report["ok"] = not bad
    return report
