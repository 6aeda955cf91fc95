"""Declared query surface (SURVEY.md §2.9).

Importing this package registers every query in the registry. Each module
covers one block of the surface; each query has a Spark implementation
(DataFrame-first so Catalyst optimizes it) and, where SQL-expressible, a
DuckDB oracle string.
"""

from rastercube_spark.queries import (  # noqa: F401
    scans,
    joins,
    aggregations,
    windows,
    sortlimit,
    setops,
    scalars,
    raster,
    streaming,
    udfs,
    datapipe,
)
