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


def rebalance_scan(df: DataFrame) -> DataFrame:
    """Repartition an under-partitioned scan to the cluster's default
    parallelism — for compute-heavy consumers (explode/hash/UDF stages).

    A single parquet row-group gives the scan ONE partition, which
    serializes every pre-shuffle stage in the consumer regardless of
    cluster size (observed: the winnowing fingerprint ran its whole
    10M-row explode+hash in one task). The repartition only fires when
    the scan has at most half the default parallelism — a no-op on
    production inputs (many files / row-groups), a ~cores× parallelism
    fix on single-file inputs; AQE cannot help here because the
    bottleneck precedes the first exchange."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
