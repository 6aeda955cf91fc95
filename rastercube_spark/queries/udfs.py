"""Q80-Q82 — the pandas-UDF surface (SURVEY.md §2.9).

These exist to prove the engine's UDF machinery (Arrow-batched, the only
sanctioned Python path — SURVEY §2.7 D1) gives results identical to the
codegen'd built-in path: Q80 must hash-match Q63.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from rastercube_spark.functions.qa import QACONF_SQL, qaconf_numpy
from rastercube_spark.queries._util import davg, davg_sql
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import fixture_path, load


@F.pandas_udf(DoubleType())
def qaconf_pandas(qa: pd.Series) -> pd.Series:
    """Scalar pandas UDF: Arrow batches in, numpy bit math, Arrow out.
    Same gates as modis_qa.pyx:22-103 (see functions/qa.py)."""
    return pd.Series(qaconf_numpy(qa.to_numpy()))


@query(
    "q80_scalar_pandas_udf",
    oracle=f"""
        SELECT frac_num,
               {davg_sql(QACONF_SQL.format(qa='qa'))} AS avg_qaconf,
               count(CASE WHEN ({QACONF_SQL.format(qa='qa')}) > 0 THEN 1 END) AS n_usable
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q80(spark, sf_dir):
    px = load(spark, sf_dir, "ndvi_pixels").select(
        "frac_num", qaconf_pandas(F.col("qa")).alias("qaconf")
    )
    return (
        px.groupBy("frac_num")
        .agg(
            davg("qaconf").alias("avg_qaconf"),
            F.count(F.when(F.col("qaconf") > 0, 1)).alias("n_usable"),
        )
        .orderBy("frac_num")
    )


@query(
    "q81_grouped_map_udf",
    oracle=f"""
        SELECT frac_num, x, y, t,
               ROUND((ndvi - avg(ndvi) OVER (PARTITION BY frac_num))
                     / stddev_pop(ndvi) OVER (PARTITION BY frac_num), 6) AS ndvi_norm
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        WHERE ndvi <> -3000
        ORDER BY frac_num, x, y, t
    """,
)
def q81(spark, sf_dir):
    """Grouped-map UDF (D1 analog — the reference's per-fraction map_fn,
    hadoop/spark.py:105-256): per-chunk normalization via applyInPandas.

    Scale note: group = one fraction, the same memory unit the reference
    budgets for (≤ frac_ndates time slices, jgrid3.py:31-34); Arrow batches
    bound transfer. At 100 TB this is one task per chunk, exactly the
    reference's parallelism model but with lineage + retries.
    """
    px = (
        load(spark, sf_dir, "ndvi_pixels")
        .where(F.col("ndvi") != -3000)
        .select("frac_num", "x", "y", "t", "ndvi")
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["ndvi"].to_numpy().astype("float64")
        mean = v.mean()
        std = v.std()  # ddof=0 == stddev_pop
        out = pdf[["frac_num", "x", "y", "t"]].copy()
        out["ndvi_norm"] = ((v - mean) / std).round(6)
        return out

    return (
        px.groupBy("frac_num")
        .applyInPandas(
            normalize, "frac_num int, x int, y int, t int, ndvi_norm double"
        )
        .orderBy("frac_num", "x", "y", "t")
    )


@query(
    "q82_grouped_agg_udf",
    oracle=f"""
        SELECT zone_id, ROUND(avg(ndvi), 6) AS trimmed_mean
        FROM (
            SELECT zone_id, ndvi,
                   row_number() OVER (PARTITION BY zone_id ORDER BY ndvi) AS rn,
                   count(*) OVER (PARTITION BY zone_id) AS n
            FROM (
                SELECT g.zone_id, p.ndvi
                FROM read_parquet('{fixture_path('ndvi_pixels')}') p
                JOIN read_parquet('{fixture_path('glcf_pixels')}') g
                  ON p.frac_num = g.frac_num AND p.x = g.x AND p.y = g.y
                WHERE p.ndvi <> -3000
            )
        )
        WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1)
        GROUP BY zone_id
        ORDER BY zone_id
    """,
)
def q82(spark, sf_dir):
    """Grouped-agg pandas UDF: 10% trimmed mean of ndvi per land-cover zone.

    Scale note: a grouped-agg UDF materializes each group's column in
    memory; for very hot zones switch to the approx_percentile pre-filter
    formulation. Kept exact here because the oracle is exact.
    """
    import numpy as np

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        a = np.sort(v.to_numpy().astype("float64"))
        k = int(len(a) * 0.1)
        return float(np.round(a[k : len(a) - k].mean(), 6))

    ndvi = (
        load(spark, sf_dir, "ndvi_pixels")
        .where(F.col("ndvi") != -3000)
        .select("frac_num", "x", "y", "ndvi")
    )
    glcf = load(spark, sf_dir, "glcf_pixels")
    return (
        ndvi.join(glcf, ["frac_num", "x", "y"])
        .groupBy("zone_id")
        .agg(trimmed_mean(F.col("ndvi")).alias("trimmed_mean"))
        .orderBy("zone_id")
    )
