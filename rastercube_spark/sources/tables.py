"""Relational test-table source (driver TESTDATA parquet).

The only scan primitive the relational layer needs: a parquet read, so
Catalyst gets predicate pushdown / column pruning / partition pruning for
free (SURVEY.md §4). Mirrors the reference's catalog-open (S1,
jgrid3.py:675-680) collapsing to `spark.read.parquet`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Raster fixtures live beside the repo (FIXTURES.md); both Spark and the
# DuckDB oracle read the same files.
FIXTURES_DIR = "/root/repo/fixtures"
FIXTURE_TABLES = (
    "ndvi_pixels",
    "qa_pixels",
    "glcf_pixels",
    "timestamps",
    "chunk_catalog",
    "region_polygons",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in FIXTURE_TABLES:
        return spark.read.parquet(f"{FIXTURES_DIR}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fixture_path(name: str) -> str:
    return f"{FIXTURES_DIR}/{name}.parquet"
