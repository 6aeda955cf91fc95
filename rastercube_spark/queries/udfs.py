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


@query(
    "q83_chunk_udtf",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE text IS NOT NULL
        ),
        s AS (
            SELECT doc_id, toks,
                   UNNEST(range(0, len(toks), 24)) AS st
            FROM d
        )
        SELECT doc_id,
               CAST(st / 24 AS INT) AS chunk_idx,
               array_to_string(toks[st + 1 : least(st + 32, len(toks))], ' ')
                   AS chunk_text,
               CAST(least(st + 32, len(toks)) - st AS INT) AS n_tokens
        FROM s
        ORDER BY doc_id, chunk_idx
    """,
)
def q83(spark, sf_dir):
    """Python UDTF (table function) surface: context-window chunking —
    each document becomes overlapping 32-token windows with stride 24,
    the standard chunker in a training-data / embedding pipeline (the
    lateral-join row fan-out a scalar UDF cannot express). Completes the
    UDF family next to q80 (scalar), q81 (grouped map), q82 (grouped
    agg); SURVEY §2.8 names the UDTF surface. Arrow-batched
    (useArrow=True); tokenization is literal single-space split in BOTH
    engines (python str.split(' ') ≡ DuckDB string_split), so chunk
    boundaries and reconstructed text are engine-exact.

    Scale shape: a map-side lateral fan-out — zero shuffle; the ~4/3
    row amplification is the point of the operator, and the ORDER BY is
    only for the deterministic oracle compare."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_idx int, chunk_text string, "
        "n_tokens int",
        useArrow=True,
    )
    class ChunkDoc:
        def eval(self, doc_id, text):
            # NULL text is dropped in BOTH engines (the WHERE below ≡ the
            # oracle's WHERE text IS NOT NULL); this guard is belt-and-
            # braces for direct UDTF use. Empty string is NOT special:
            # ''.split(' ') == [''] ≡ DuckDB string_split('', ' '), one
            # empty chunk — engine-exact either way (ADVICE r05).
            if text is None:
                return
            toks = text.split(" ")
            n = len(toks)
            for idx, s in enumerate(range(0, n, 24)):
                chunk = toks[s : s + 32]
                yield doc_id, idx, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_doc", ChunkDoc)
    load(spark, sf_dir, "documents").createOrReplaceTempView("q83_docs")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM (SELECT * FROM q83_docs WHERE text IS NOT NULL) d,
             LATERAL chunk_doc(d.doc_id, d.text) AS c
        ORDER BY c.doc_id, c.chunk_idx
        """
    )
