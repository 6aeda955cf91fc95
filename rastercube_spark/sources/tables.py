"""Relational test-table source (driver TESTDATA parquet).

The only scan primitive the relational layer needs: a parquet read, so
Catalyst gets predicate pushdown / column pruning / partition pruning for
free (SURVEY.md §4). Mirrors the reference's catalog-open (S1,
jgrid3.py:675-680) collapsing to `spark.read.parquet`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    if name == "events":
        # The driver's events.parquet stores ts as parquet TIMESTAMP(NANOS),
        # which Spark 4 rejects outright. Read it as raw int64 nanos and
        # truncate to microseconds — the same truncation DuckDB applies when
        # casting TIMESTAMP_NS to its microsecond TIMESTAMP, so both engines
        # see identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fixture_path(name: str) -> str:
    return f"{FIXTURES_DIR}/{name}.parquet"
