"""Q60-Q66 — scalar / elementwise functions (SURVEY.md §2.9, §2.5).

All JVM-side column expressions (whole-stage codegen); no Python UDFs.
Q63 is the engine's F1 (MODIS QA decode, reference modis_qa.pyx:22-120) as
pure bit arithmetic; Q65 is F5 (affine geotransform) as column math.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.functions.qa import (
    LANDSAT_QACONF_SQL,
    QACONF_SQL,
    landsat_qaconf_col,
    qaconf_col,
)
from rastercube_spark.queries._util import davg, davg_sql
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import fixture_path, load


@query(
    "q60_string_funcs",
    oracle=r"""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substr(p_name, 1, 5) AS name_pfx,
               length(p_name) AS name_len,
               concat(p_brand, '-', p_type) AS brand_type,
               (p_name LIKE '%or%') AS has_or,
               regexp_extract(p_name, '([a-z]+)', 1) AS first_word
        FROM part
        ORDER BY p_partkey
    """,
)
def q60(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%or%").alias("has_or"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
    ).orderBy("p_partkey")


@query(
    "q61_date_funcs",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               dayofyear(o_orderdate) AS o_doy,
               CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS ship_by,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER)
                   AS days_to_98
        FROM orders
        ORDER BY o_orderkey
    """,
)
def q61(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofyear("o_orderdate").alias("o_doy"),
        F.date_add(d, 30).alias("ship_by"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("days_to_98"),
    ).orderBy("o_orderkey")


@query(
    "q62_math_funcs",
    oracle="""
        SELECT c_custkey,
               ROUND(abs(c_acctbal), 6) AS abs_bal,
               ROUND(c_acctbal, 1) AS bal_r1,
               ROUND(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
               CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
               ROUND(log10(abs(c_acctbal) + 1.0), 6) AS log_bal,
               c_custkey // 7 AS key_div,
               c_custkey % 7 AS key_mod
        FROM customer
        ORDER BY c_custkey
    """,
)
def q62(spark, sf_dir):
    """Math scalars incl. the integer div/mod of the reference's chunk
    arithmetic (P2, jgrid3.py:459-489)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.abs(bal), 6).alias("abs_bal"),
        F.round(bal, 1).alias("bal_r1"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.floor(bal).alias("floor_bal"),
        F.round(F.log10(F.abs(bal) + F.lit(1.0)), 6).alias("log_bal"),
        F.expr("c_custkey div 7").alias("key_div"),
        (F.col("c_custkey") % 7).alias("key_mod"),
    ).orderBy("c_custkey")


@query(
    "q63_qa_bitops",
    oracle=f"""
        SELECT frac_num,
               {davg_sql(QACONF_SQL.format(qa='qa'))} AS avg_qaconf,
               count(CASE WHEN ({QACONF_SQL.format(qa='qa')}) > 0 THEN 1 END) AS n_usable
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q63(spark, sf_dir):
    """F1 as pure column expressions — the codegen'd fast path the
    pandas-UDF variant (Q80) must hash-match."""
    px = load(spark, sf_dir, "ndvi_pixels").select(
        "frac_num", qaconf_col(F.col("qa")).alias("qaconf")
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
    "q64_nodata_case",
    oracle=f"""
        SELECT frac_num,
               count(CASE WHEN ndvi = -3000 THEN 1 END) AS n_nodata,
               {davg_sql('CASE WHEN ndvi = -3000 THEN NULL ELSE ndvi END')} AS avg_valid,
               {davg_sql('coalesce(CASE WHEN ndvi = -3000 THEN NULL ELSE ndvi END, 0)')}
                   AS avg_filled
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q64(spark, sf_dir):
    """Nodata sentinel → NULL → coalesce fill (F7, reference
    jgrid3.py:335-336 nodata prefill)."""
    px = load(spark, sf_dir, "ndvi_pixels")
    valid = F.when(F.col("ndvi") == -3000, None).otherwise(F.col("ndvi"))
    return (
        px.groupBy("frac_num")
        .agg(
            F.count(F.when(F.col("ndvi") == -3000, 1)).alias("n_nodata"),
            davg(valid).alias("avg_valid"),
            davg(F.coalesce(valid, F.lit(0))).alias("avg_filled"),
        )
        .orderBy("frac_num")
    )


# test-grid geotransform for Q65 (arbitrary but fixed; exercises F5's math)
_GT = (-20015109.354, 231.65635826395825, 0.0, 10007554.677, 0.0, -231.65635826395825)


@query(
    "q65_affine_transform",
    oracle=f"""
        -- literals cast to DOUBLE up front: DuckDB otherwise types them as
        -- wide DECIMALs and the row-level arithmetic overflows its decimal
        -- inference. Spark computes in double then sums in DECIMAL(28,6);
        -- mirror that exact order of operations.
        SELECT frac_num,
               ROUND(CAST(SUM(CAST((CAST({_GT[0]} AS DOUBLE)
                   + CAST(x AS DOUBLE) * CAST({_GT[1]} AS DOUBLE)
                   + CAST(y AS DOUBLE) * CAST({_GT[2]} AS DOUBLE))
                   AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_xgeo,
               ROUND(CAST(SUM(CAST((CAST({_GT[3]} AS DOUBLE)
                   + CAST(x AS DOUBLE) * CAST({_GT[4]} AS DOUBLE)
                   + CAST(y AS DOUBLE) * CAST({_GT[5]} AS DOUBLE))
                   AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_ygeo
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        WHERE t = 0
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q65(spark, sf_dir):
    from rastercube_spark.functions.geo import affine_xy2geo

    px = load(spark, sf_dir, "ndvi_pixels").where(F.col("t") == 0)
    xg, yg = affine_xy2geo(F.col("x").cast("double"), F.col("y").cast("double"), _GT)
    return (
        px.select("frac_num", xg.alias("xg"), yg.alias("yg"))
        .groupBy("frac_num")
        .agg(
            F.round(F.sum(F.col("xg").cast("decimal(28,6)")).cast("double"), 6).alias("sum_xgeo"),
            F.round(F.sum(F.col("yg").cast("decimal(28,6)")).cast("double"), 6).alias("sum_ygeo"),
        )
        .orderBy("frac_num")
    )


@query(
    "q66_array_json",
    oracle=f"""
        SELECT x, y,
               len(list(t ORDER BY t)) AS n_ts,
               list(t ORDER BY t)[1] AS first_t,
               list(t ORDER BY t)[-1] AS last_t,
               to_json({{'x': x, 'y': y, 'n': len(list(t ORDER BY t))}}) AS js
        FROM read_parquet('{fixture_path('ndvi_pixels')}')
        WHERE frac_num = 0
        GROUP BY x, y
        ORDER BY x, y
    """,
)
def q66(spark, sf_dir):
    """Array build + JSON encode (reference's header JSON encode/decode,
    jgrid3.py:634-680, generalized)."""
    px = load(spark, sf_dir, "ndvi_pixels").where(F.col("frac_num") == 0)
    return (
        px.groupBy("x", "y")
        .agg(F.sort_array(F.collect_list("t")).alias("ts"))
        .select(
            "x",
            "y",
            F.size("ts").alias("n_ts"),
            F.element_at("ts", 1).alias("first_t"),
            F.element_at("ts", -1).alias("last_t"),
            F.to_json(
                F.struct(F.col("x"), F.col("y"), F.size("ts").alias("n"))
            ).alias("js"),
        )
        .orderBy("x", "y")
    )


# --- F3 categorical legend + F6 type reinterpret ------------------------

# GLCF-style land-cover legend (reference has the class→name/color tables
# in its GLCF datasource; values here are a fixed engine-side dimension)
_LEGEND = {
    0: ("water", "0000ff"),
    1: ("evergreen_needle", "005500"),
    2: ("evergreen_broad", "007700"),
    3: ("deciduous_needle", "009900"),
    4: ("deciduous_broad", "00bb00"),
    5: ("mixed_forest", "00dd00"),
    6: ("woodland", "33ff33"),
    7: ("wooded_grassland", "99ff66"),
    8: ("closed_shrubland", "cc9966"),
    9: ("open_shrubland", "ffcc99"),
    10: ("grassland", "ffff66"),
    11: ("cropland", "ffcc00"),
    12: ("bare_ground", "cccccc"),
    13: ("urban", "ff0000"),
    14: ("wetland", "6699ff"),
    15: ("snow_ice", "ffffff"),
    16: ("unclassified", "888888"),
}

_LEGEND_CASE = " ".join(
    f"WHEN zone_id = {k} THEN '{name}|{rgb}'" for k, (name, rgb) in _LEGEND.items()
)


@query(
    "q67_categorical_legend",
    oracle=f"""
        SELECT zone_id,
               split_part(CASE {_LEGEND_CASE} ELSE 'unknown|000000' END,
                          '|', 1) AS class_name,
               split_part(CASE {_LEGEND_CASE} ELSE 'unknown|000000' END,
                          '|', 2) AS rgb_hex,
               count(*) AS n_px
        FROM read_parquet('{fixture_path('glcf_pixels')}')
        GROUP BY zone_id
        ORDER BY zone_id
    """,
)
def q67(spark, sf_dir):
    """F3: categorical class → legend (name + color) via a broadcast map
    literal — the lookup folds into the scan, no join at all (reference
    GLCF class→color tables)."""
    lookup = F.create_map(
        *[
            x
            for k, (name, rgb) in _LEGEND.items()
            for x in (F.lit(k), F.struct(F.lit(name).alias("n"), F.lit(rgb).alias("c")))
        ]
    )
    px = load(spark, sf_dir, "glcf_pixels")
    hit = F.element_at(lookup, F.col("zone_id"))
    return (
        px.groupBy("zone_id")
        .agg(F.count("*").alias("n_px"))
        .select(
            "zone_id",
            F.coalesce(hit["n"], F.lit("unknown")).alias("class_name"),
            F.coalesce(hit["c"], F.lit("000000")).alias("rgb_hex"),
            "n_px",
        )
        .orderBy("zone_id")
    )


@query(
    "q68_type_reinterpret",
    oracle=f"""
        SELECT frac_num,
               count(CASE WHEN qa_i16 < 0 THEN 1 END) AS n_negative,
               min(qa_i16) AS min_i16,
               max(qa_i16) AS max_i16
        FROM (
            SELECT frac_num,
                   CASE WHEN qa > 32767 THEN qa - 65536 ELSE qa END AS qa_i16
            FROM read_parquet('{fixture_path('qa_pixels')}')
        )
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q68(spark, sf_dir):
    """F6: reinterpret the uint16 QA word as int16 (two's complement) —
    the reference's numpy `.view(np.int16)` (SURVEY F6) as pure column
    arithmetic, no copy, no UDF."""
    px = load(spark, sf_dir, "qa_pixels")
    i16 = F.when(F.col("qa") > 32767, F.col("qa") - 65536).otherwise(F.col("qa"))
    return (
        px.select("frac_num", i16.alias("qa_i16"))
        .groupBy("frac_num")
        .agg(
            F.count(F.when(F.col("qa_i16") < 0, 1)).alias("n_negative"),
            F.min("qa_i16").alias("min_i16"),
            F.max("qa_i16").alias("max_i16"),
        )
        .orderBy("frac_num")
    )


@query(
    "q69_landsat_qa",
    oracle=f"""
        SELECT frac_num,
               {davg_sql(LANDSAT_QACONF_SQL.format(qa='qa'))} AS avg_conf,
               count(CASE WHEN ({LANDSAT_QACONF_SQL.format(qa='qa')}) > 0
                     THEN 1 END) AS n_usable
        FROM read_parquet('{fixture_path('qa_pixels')}')
        GROUP BY frac_num
        ORDER BY frac_num
    """,
)
def q69(spark, sf_dir):
    """F2: the Landsat8 QA gate cascade (reference landsat8_qa.pyx:22-67)
    over the qa fixture words — same decode pattern as F1, different bit
    layout, proving the bit-gate machinery generalizes."""
    px = load(spark, sf_dir, "qa_pixels")
    return (
        px.select("frac_num", landsat_qaconf_col(F.col("qa")).alias("conf"))
        .groupBy("frac_num")
        .agg(
            davg("conf").alias("avg_conf"),
            F.count(F.when(F.col("conf") > 0, 1)).alias("n_usable"),
        )
        .orderBy("frac_num")
    )


@query(
    "q28_zonal_percentile",
    oracle=f"""
        SELECT g.zone_id,
               ROUND(quantile_cont(p.ndvi_v, 0.5), 6) AS median_ndvi,
               ROUND(quantile_cont(p.ndvi_v, 0.9), 6) AS p90_ndvi,
               count(p.ndvi_v) AS n
        FROM (
            SELECT frac_num, x, y,
                   CASE WHEN ndvi = -3000 THEN NULL
                        ELSE CAST(ndvi AS DOUBLE) END AS ndvi_v
            FROM read_parquet('{fixture_path('ndvi_pixels')}')
        ) p
        JOIN read_parquet('{fixture_path('glcf_pixels')}') g
          ON p.frac_num = g.frac_num AND p.x = g.x AND p.y = g.y
        GROUP BY g.zone_id
        ORDER BY g.zone_id
    """,
)
def q28(spark, sf_dir):
    """A1 percentile zonal stats: exact interpolated percentiles per
    land-cover zone (reference per-polygon percentile plots). Exact
    `percentile` shuffles the zone's values to one reducer per zone —
    bounded by zone cardinality; at 100 TB the approximate variant
    (percentile_approx, mergeable sketches) is the scale path, kept out
    of the oracle gate because sketches aren't cross-engine stable."""
    ndvi = load(spark, sf_dir, "ndvi_pixels").select(
        "frac_num",
        "x",
        "y",
        F.when(F.col("ndvi") == -3000, None)
        .otherwise(F.col("ndvi").cast("double"))
        .alias("ndvi_v"),
    )
    glcf = load(spark, sf_dir, "glcf_pixels")
    return (
        ndvi.join(glcf, ["frac_num", "x", "y"])
        .groupBy("zone_id")
        .agg(
            F.round(F.percentile("ndvi_v", 0.5), 6).alias("median_ndvi"),
            F.round(F.percentile("ndvi_v", 0.9), 6).alias("p90_ndvi"),
            F.count("ndvi_v").alias("n"),
        )
        .orderBy("zone_id")
    )
