"""Q20-Q27 — aggregations (SURVEY.md §2.9).

Covers partial/final hash aggregation, distinct, rollup/cube/grouping sets,
HAVING, and the raster analogs: zonal stats (A1, reference jgrid/utils.py:
27-43 masked stats) and per-pixel argmax gather (A5, reference
rastercube/utils.py:152-181 index_3d_with_2d).

Scale notes: every query here is a map-side-combinable hash aggregate; the
only shuffles are on the (low-cardinality) group keys. Q26/Q27 join raster
tables co-partitioned on frac geometry, so at 100 TB the join key space is
bounded by pixels, not rows, and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rastercube_spark.functions.qa import qaconf_col, QACONF_SQL
from rastercube_spark.queries._util import davg, davg_sql, dsum, dsum_sql, REVENUE, revenue_col
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import fixture_path, load, rebalance_scan


@query(
    "q20_tpch_q1_agg",
    oracle=f"""
        SELECT
            l_returnflag,
            l_linestatus,
            {dsum_sql('l_quantity')} AS sum_qty,
            {dsum_sql('l_extendedprice')} AS sum_base_price,
            {dsum_sql(REVENUE)} AS sum_disc_price,
            {davg_sql('l_quantity')} AS avg_qty,
            {davg_sql('l_extendedprice')} AS avg_price,
            {davg_sql('l_discount')} AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def q20(spark, sf_dir):
    # rebalance: six exact-decimal aggregates are the heavy pre-shuffle
    # work, and a single-file lineitem scan caps them at the scan's task
    # count (r9 measured 1.53 -> 0.95 s at sf0.1); decimal sums are
    # order-invariant so values are unchanged. No-op on many-file scans.
    li = rebalance_scan(load(spark, sf_dir, "lineitem"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(revenue_col()).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q21_count_distinct",
    oracle="""
        SELECT n_name, count(DISTINCT l_suppkey) AS supp_cnt
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
)
def q21(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("l_suppkey").alias("supp_cnt"))
        .orderBy("n_name")
    )


_ROLLUP_BASE = f"""
    SELECT n_name, o_orderpriority, {REVENUE} AS rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
"""


def _rollup_base_df(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "o_orderpriority", revenue_col().alias("rev"))
    )


@query(
    "q22_rollup",
    oracle=f"""
        SELECT n_name, o_orderpriority, {dsum_sql('rev')} AS revenue
        FROM ({_ROLLUP_BASE}) base
        GROUP BY ROLLUP (n_name, o_orderpriority)
        ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q22(spark, sf_dir):
    return (
        _rollup_base_df(spark, sf_dir)
        .rollup("n_name", "o_orderpriority")
        .agg(dsum("rev").alias("revenue"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "q23_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q23(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q24_grouping_sets",
    oracle=f"""
        SELECT n_name, o_orderpriority, {dsum_sql('rev')} AS revenue
        FROM ({_ROLLUP_BASE}) base
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q24(spark, sf_dir):
    base = _rollup_base_df(spark, sf_dir)
    base.createOrReplaceTempView("q24_base")
    return spark.sql(
        f"""
        SELECT n_name, o_orderpriority, {dsum_sql('rev')} AS revenue
        FROM q24_base
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "q25_having",
    oracle="""
        SELECT n_name, count(*) AS n_custs
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING count(*) > 5
        ORDER BY n_name
    """,
)
def q25(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_custs"))
        .where(F.col("n_custs") > 5)
        .orderBy("n_name")
    )


# pre-expand: the QA gate must be spliced into the davg_sql argument as SQL
# text (a nested literal would leave "{QACONF_SQL...}" unexpanded).
_Q26_GATED = (
    f"CASE WHEN ({QACONF_SQL.format(qa='p.qa')}) > 0.5 THEN p.ndvi_v END"
)


@query(
    "q26_zonal_stats",
    oracle=f"""
        SELECT
            g.zone_id,
            {davg_sql(_Q26_GATED)} AS avg_ndvi,
            min(p.ndvi_v) AS min_ndvi,
            max(p.ndvi_v) AS max_ndvi,
            count(p.ndvi_v) AS n
        FROM (
            SELECT frac_num, x, y, qa,
                   CASE WHEN ndvi = -3000 THEN NULL ELSE ndvi END AS ndvi_v
            FROM read_parquet('{fixture_path('ndvi_pixels')}')
        ) p
        JOIN read_parquet('{fixture_path('glcf_pixels')}') g
          ON p.frac_num = g.frac_num AND p.x = g.x AND p.y = g.y
        GROUP BY g.zone_id
        ORDER BY g.zone_id
    """,
)
def q26(spark, sf_dir):
    """Zonal stats (A1): avg ndvi gated by QA confidence, per land-cover zone.

    The zip join runs on (frac_num, x, y) — both cubes share chunk geometry
    (reference jgrid/utils.py:101-111), so a bucketed layout makes this
    shuffle-free at scale.
    """
    ndvi = load(spark, sf_dir, "ndvi_pixels").select(
        "frac_num",
        "x",
        "y",
        F.when(F.col("ndvi") == -3000, None).otherwise(F.col("ndvi")).alias("ndvi_v"),
        qaconf_col(F.col("qa")).alias("qaconf"),
    )
    glcf = load(spark, sf_dir, "glcf_pixels")
    return (
        ndvi.join(glcf, ["frac_num", "x", "y"])
        .groupBy("zone_id")
        .agg(
            davg(F.when(F.col("qaconf") > 0.5, F.col("ndvi_v"))).alias("avg_ndvi"),
            F.min("ndvi_v").alias("min_ndvi"),
            F.max("ndvi_v").alias("max_ndvi"),
            F.count("ndvi_v").alias("n"),
        )
        .orderBy("zone_id")
    )


@query(
    "q27_argmax_gather",
    oracle=f"""
        SELECT x, y, t AS best_t, ndvi AS best_ndvi
        FROM (
            SELECT x, y, t, ndvi,
                   row_number() OVER (
                       PARTITION BY x, y ORDER BY ndvi DESC, t DESC
                   ) AS rn
            FROM read_parquet('{fixture_path('ndvi_pixels')}')
            WHERE ndvi <> -3000
        )
        WHERE rn = 1
        ORDER BY x, y
    """,
)
def q27(spark, sf_dir):
    """Per-pixel argmax along time (A5, reference utils.index_3d_with_2d).

    Implemented with max_by over a (ndvi, t) struct — a single map-side-
    combinable aggregate, cheaper at scale than the window formulation the
    oracle uses (no per-pixel sort, just a hash agg on (x, y)).
    """
    px = load(spark, sf_dir, "ndvi_pixels").where(F.col("ndvi") != -3000)
    best = F.max_by(F.struct(F.col("t"), F.col("ndvi")), F.struct(F.col("ndvi"), F.col("t")))
    return (
        px.groupBy("x", "y")
        .agg(best.alias("b"))
        .select(
            "x",
            "y",
            F.col("b.t").alias("best_t"),
            F.col("b.ndvi").alias("best_ndvi"),
        )
        .orderBy("x", "y")
    )


@query(
    "q29_salted_agg",
    oracle=f"""
        SELECT l_returnflag,
               count(*) AS n,
               {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q29(spark, sf_dir):
    """Skew-mitigated aggregation by explicit salting: l_returnflag has 3
    distinct values — at 100 TB a plain groupBy lands a third of the table
    on each of 3 reducers. Salting splits every hot key across 16
    sub-keys (phase 1: map-side-combinable partial per (key, salt)),
    then merges the 16 partials per key (phase 2: trivially small).
    Same result as a plain groupBy, worst reducer 16x smaller. (AQE's
    skew handling covers joins; aggregation skew needs this pattern.)"""
    n_salt = 16
    li = load(spark, sf_dir, "lineitem").withColumn(
        "__salt", (F.crc32(F.col("l_orderkey").cast("string")) % n_salt)
    )
    partial = li.groupBy("l_returnflag", "__salt").agg(
        F.count("*").alias("n_p"),
        F.sum(F.col("l_quantity").cast("decimal(24,6)")).alias("s_p"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("n_p").alias("n"),
            F.sum("s_p").cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q2a_approx_count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_exact,
               (abs(approx_count_distinct(l_orderkey)
                    - COUNT(DISTINCT l_orderkey))
                <= 0.05 * COUNT(DISTINCT l_orderkey)) AS approx_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q2a(spark, sf_dir):
    """HyperLogLog++ distinct-count sketch — the 100 TB replacement for
    exact count-distinct (mergeable, fixed memory per group).

    Sketch ESTIMATES are engine-specific, so the raw estimate can never
    hash-match a DuckDB oracle. What IS cross-engine checkable — and is
    the actual correctness claim (SURVEY §2.9: approx ops at 5%
    tolerance) — is the tolerance bound itself: each engine computes its
    own sketch AND its own exact count, and emits whether the sketch
    landed within 5%. The exact count anchors the value hash; the
    boolean attests the sketch. tests/test_approx.py additionally bounds
    the raw estimates."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_a"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(F.col("_a") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("approx_ok"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q2b_approx_quantiles",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               (abs(approx_quantile(l_extendedprice, 0.5)
                    - quantile_cont(l_extendedprice, 0.5))
                <= 0.05 * quantile_cont(l_extendedprice, 0.5)) AS median_ok,
               (abs(approx_quantile(l_extendedprice, 0.99)
                    - quantile_cont(l_extendedprice, 0.99))
                <= 0.05 * quantile_cont(l_extendedprice, 0.99)) AS p99_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def q2b(spark, sf_dir):
    """Quantile sketch (percentile_approx) — mergeable alternative to
    q28's exact percentiles; bounded-memory per group at any scale.

    Same oracle shape as q2a: sketch estimates are engine-specific
    (Spark KLL-style vs DuckDB t-digest), so each engine checks its own
    sketch against its own exact quantile and emits the 5%-bound verdict
    plus an exact bigint anchor. The booleans hash identically when both
    sketches honor the declared tolerance; the raw estimates stay
    bounded in tests/test_approx.py."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_m"),
            F.percentile_approx("l_extendedprice", 0.99, 10000).alias("_p"),
            F.percentile("l_extendedprice", 0.5).alias("_me"),
            F.percentile("l_extendedprice", 0.99).alias("_pe"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            (F.abs(F.col("_m") - F.col("_me")) <= 0.05 * F.col("_me")).alias(
                "median_ok"
            ),
            (F.abs(F.col("_p") - F.col("_pe")) <= 0.05 * F.col("_pe")).alias(
                "p99_ok"
            ),
        )
        .orderBy("l_returnflag")
    )
