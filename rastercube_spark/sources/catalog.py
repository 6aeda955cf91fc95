"""File-catalog operator (S7): regex-parse raster file names into a
queryable catalog relation.

The reference walks the MODIS directory tree and regex-parses names like
``MOD13Q1.A2016017.h10v08.005.2016034145345.hdf`` into (satellite, tile,
timestamp) tuples on the driver (reference
rastercube/datasources/modis.py:17-24 parse_ndvi_filename, 54-110
ndvi_list_hdf). Spark-first: the listing is a DataFrame (from
``binaryFile``'s ``path`` column or an explicit list), the parse is
``regexp_extract`` column math, and grouping/sorting per tile is plain
relational — at 100 TB of tiles the catalog build is itself distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# MOD13Q1.A{yyyy}{doy}.h{H}v{V}.{collection}.{production}.hdf
MODIS_NAME_RE = r"(\w+)\.A(\d{4})(\d{3})\.h(\d{2})v(\d{2})\.(\d{3})\.(\d+)\.hdf$"


def parse_modis_paths(paths: DataFrame, path_col: str = "path") -> DataFrame:
    """(path) → (product, year, doy, tile_h, tile_v, collection, ts_ms).

    Rows whose name doesn't match are dropped (same behavior as the
    reference's listing skipping non-HDF files).
    """
    p = F.col(path_col)
    ex = lambda i: F.regexp_extract(p, MODIS_NAME_RE, i)  # noqa: E731
    parsed = paths.select(
        p.alias("path"),
        ex(1).alias("product"),
        ex(2).cast("int").alias("year"),
        ex(3).cast("int").alias("doy"),
        ex(4).cast("int").alias("tile_h"),
        ex(5).cast("int").alias("tile_v"),
        ex(6).cast("int").alias("collection"),
    ).where(F.col("product") != "")
    # A-date → epoch ms (reference parse_date: year + day-of-year)
    date = F.date_add(
        F.make_date(F.col("year"), F.lit(1), F.lit(1)), F.col("doy") - 1
    )
    return parsed.withColumn(
        "ts_ms", F.unix_date(date).cast("bigint") * 86400000
    )


def catalog_by_tile(parsed: DataFrame) -> DataFrame:
    """Per-tile date coverage (≡ reference ndvi_list_hdf's grouping):
    (tile_h, tile_v) → n_files, first/last date, distinct dates."""
    return (
        parsed.groupBy("tile_h", "tile_v")
        .agg(
            F.count("*").alias("n_files"),
            F.min("ts_ms").alias("first_ts_ms"),
            F.max("ts_ms").alias("last_ts_ms"),
            F.count_distinct("ts_ms").alias("n_dates"),
        )
        .orderBy("tile_h", "tile_v")
    )


def list_files_df(spark: SparkSession, dir_glob: str) -> DataFrame:
    """Listing via the binaryFile source's metadata-only path column —
    content is not read (pruned away), so this scales to huge trees."""
    return (
        spark.read.format("binaryFile")
        .load(dir_glob)
        .select("path", "length", "modificationTime")
    )
