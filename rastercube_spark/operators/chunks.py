"""Per-chunk pipeline operator (D1): run a user function over every
(frac_num, time_chunk) chunk of a cube as Arrow-batched grouped-map tasks.

The reference's per-chunk job runner hands each worker one fraction's
array plus its geometry (reference rastercube/hadoop/spark.py:120-177 and
scripts/complete_ndvi_worldgrid.py per-frac pipeline). Here the same unit
of work is an ``applyInPandas`` group: one chunk's rows arrive as a single
pandas frame (the same memory budget the reference targets, jgrid3.py:
31-34 one-fraction-per-task), the function returns rows, Spark handles
scheduling/retries/shuffle.

Incremental ('lazy') mode reproduces J4: chunks already present in the
sink's catalog are anti-joined away before any work is scheduled, so a
re-run only processes missing chunks — the relational form of the
reference's file-existence check (jgrid3.py fracs_exist /
hadoop/spark.py:171-177).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, functions as F

CHUNK_KEYS = ("frac_num", "time_chunk")


def map_chunks(
    cube_df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    done_catalog: DataFrame | None = None,
) -> DataFrame:
    """Apply ``fn`` once per (frac_num, time_chunk) chunk.

    ``fn``: pandas frame of one chunk's rows → pandas frame (any shape
    matching ``schema``). With ``done_catalog`` (frac_num, time_chunk of
    already-produced chunks), those chunks are skipped via a left-anti
    join — the incremental mode.
    """
    src = cube_df
    if done_catalog is not None:
        src = cube_df.join(
            done_catalog.select(*CHUNK_KEYS), list(CHUNK_KEYS), "left_anti"
        )
    return src.groupBy(*CHUNK_KEYS).applyInPandas(
        lambda pdf: fn(pdf), schema=schema
    )
