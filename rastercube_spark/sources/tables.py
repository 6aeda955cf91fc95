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
        # The driver's events.parquet stores ts as parquet TIMESTAMP(NANOS).
        # Spark version behavior differs:
        #   - Spark 4.0 rejects NANOS outright unless
        #     spark.sql.legacy.parquet.nanosAsLong=true, in which case ts
        #     reads as raw int64 nanos → truncate to µs ourselves;
        #   - Spark 4.1+ ignores that legacy conf and reads NANOS natively
        #     as TIMESTAMP_NTZ, already truncated to µs.
        # Both paths end at a µs TimestampType, matching DuckDB's
        # TIMESTAMP_NS → TIMESTAMP truncation, so the two engines see
        # identical values on either Spark version.
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # session tz is UTC, so NTZ → TIMESTAMP keeps the wall-clock value
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
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
    the scan reads at most half the default parallelism in FILES — a
    no-op on production inputs (many files), a ~cores× parallelism fix
    on single-file inputs; AQE cannot help here because the bottleneck
    precedes the first exchange.

    The under-partitioned signal is ``len(df.inputFiles())``, NOT
    ``df.rdd.getNumPartitions()``: the ``.rdd`` conversion forces full
    plan analysis plus eager file-partition planning on the driver at
    every query build — harmless at sf0.1, measurable on a
    many-thousand-file production scan (ADVICE r04). Few files ⇒ few
    partitions unless a file exceeds maxPartitionBytes (row-group
    splitting only raises parallelism, making the fire-condition safely
    conservative); the quiet case — many tiny files packed into few
    partitions — is the production shape where rebalance was a
    deliberate no-op anyway."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    nfiles = len(df.inputFiles())
    if nfiles and nfiles * 2 <= target:
        return df.repartition(target)
    return df


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a test table from parquet FOOTER metadata — a
    driver-side file-stat, never a Spark job.

    Sizing parameters (LSH plane counts, IVF nlist) need the corpus
    cardinality before the query plan is built; running ``df.count()``
    for that schedules a separate full-scan job per query invocation,
    outside the returned plan and easy to miss in cost accounting
    (ADVICE r7). Parquet footers carry the row count per file, so the
    answer costs one metadata read per file. At production scale the
    same number comes from catalog statistics
    (``ANALYZE TABLE``/Delta stats); this is the no-catalog equivalent.
    """
    import os

    import pyarrow.parquet as pq

    if name in FIXTURE_TABLES:
        path = fixture_path(name)
    else:
        path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows
