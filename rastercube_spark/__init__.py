"""rastercube_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of terrai/rastercube.

Architecture (SURVEY.md §7): a thin, well-tested relational layer over
DataFrame/SQL; a Parquet-backed RasterCube (partitioned by frac_num /
time_chunk, JSON sidecar header) replacing the reference's jGrid
(`rastercube/jgrid/jgrid3.py` in the reference); Structured Streaming for the
events surface; plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst handles pruning,
pushdown, join selection and codegen; Python only appears in Arrow-batched
pandas UDFs where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from rastercube_spark.session import get_spark  # noqa: F401

# NOTE: the registry accessors are exported under get_* names only — a
# re-export named `queries` would collide with the `rastercube_spark.queries`
# subpackage (importing the subpackage rebinds the attribute to the module).
from rastercube_spark.registry import (  # noqa: F401
    queries as get_queries,
    oracle_sql as get_oracle_sql,
)
