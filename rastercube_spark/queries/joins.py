"""Q10-Q18 — joins (SURVEY.md §2.9 + §2.3).

Strategy notes (the part that matters at 100 TB):
- dimension tables (nation/customer/supplier/part) are broadcast — no
  shuffle of the fact side (J5 analog, reference complete_ndvi_worldgrid.py:
  220-237 frac→tile dict lookup);
- large-large joins (lineitem⋈orders) shuffle both sides on the join key
  once and sort-merge; AQE converts to broadcast when a filtered side turns
  out small, and splits skewed keys;
- semi/anti joins never materialize right-side columns (J3/J4 analogs,
  reference hadoop/spark.py:166-177 todo-set algebra);
- the raster zip (Q18) joins on chunk geometry shared by both cubes
  (J1, reference jgrid/utils.py:54-81) — bucket both cubes by frac_num at
  write time and this is a storage-partitioned, shuffle-free join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.functions.qa import QACONF_SQL, qaconf_col
from rastercube_spark.operators.asof import asof_join
from rastercube_spark.queries._util import davg, davg_sql, dsum, dsum_sql, REVENUE, revenue_col
from rastercube_spark.registry import query
from rastercube_spark.sources.tables import fixture_path, load


@query(
    "q10_inner_equi",
    oracle="""
        SELECT n_name, count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
)
def q10(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("n_name")
    )


@query(
    "q11_broadcast_join",
    oracle=f"""
        SELECT p_brand, count(*) AS cnt, {dsum_sql(REVENUE)} AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_size < 10
        GROUP BY p_brand
        ORDER BY p_brand
    """,
)
def q11(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") < 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), dsum(revenue_col()).alias("revenue"))
        .orderBy("p_brand")
    )


@query(
    "q12_sort_merge_join",
    oracle=f"""
        SELECT o_orderpriority, {dsum_sql(REVENUE)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q12(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(dsum(revenue_col()).alias("revenue"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_left_outer_null",
    oracle="""
        SELECT count(*) AS n_custs_no_orders
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        WHERE o_orderkey IS NULL
    """,
)
def q13(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .where(F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("n_custs_no_orders"))
    )


@query(
    "q14_left_semi",
    oracle="""
        SELECT c_custkey
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
)
def q14(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q15_left_anti",
    oracle="""
        SELECT p_partkey
        FROM part
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        )
        ORDER BY p_partkey
    """,
)
def q15(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@query(
    "q16_theta_join",
    oracle="""
        SELECT count(*) AS n
        FROM supplier s
        JOIN nation n ON s.s_acctbal > n.n_nationkey * 100.0
    """,
)
def q16(spark, sf_dir):
    """Non-equi (theta) join → broadcast nested loop; only sane when one
    side is small (nation, 25 rows) — which Catalyst detects."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(
        F.broadcast(n), s.s_acctbal > n.n_nationkey * F.lit(100.0)
    ).agg(F.count("*").alias("n"))


_BANDS = [(i, 800.0 * i, 800.0 * i + 1200.0) for i in range(0, 700)]
_BAND_VALUES = ", ".join(f"({i}, {lo!r}, {hi!r})" for i, lo, hi in _BANDS)


@query(
    "q19_range_join",
    oracle=f"""
        WITH bands(band_id, lo, hi) AS (VALUES {_BAND_VALUES})
        SELECT band_id, count(*) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        JOIN bands ON o_totalprice BETWEEN lo AND hi
        GROUP BY band_id
        ORDER BY band_id
    """,
)
def q19(spark, sf_dir):
    """Interval (range) join via the bucketed operator: overlapping price
    bands against orders WITHOUT a nested loop — intervals explode to the
    buckets they overlap, the join is a broadcast HASH equi-join on the
    bucket id, and the exact BETWEEN re-check runs post-join. Contrast
    with q16 (theta join = broadcast nested loop, the shape this operator
    replaces at scale). See operators/rangejoin.py."""
    from rastercube_spark.operators.rangejoin import range_join

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.createDataFrame(_BANDS, "band_id int, lo double, hi double")
    return (
        range_join(o, bands, "o_totalprice", "lo", "hi", bucket_width=400.0)
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("band_id")
    )


@query(
    "q17_asof_join",
    oracle="""
        SELECT o_orderkey, last_event_ts
        FROM (
            SELECT o.o_orderkey,
                   (SELECT max(e.ts)
                    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts)
                          FROM events) e
                    WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
                   ) AS last_event_ts
            FROM orders o
        )
        ORDER BY o_orderkey
    """,
)
def q17(spark, sf_dir):
    """As-of join: latest event per customer at or before each order date.

    Uses the distributed union+carry-forward operator (operators/asof.py) —
    one shuffle, no correlated subquery, scales to both sides large.
    """
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    joined = asof_join(
        o,
        e,
        on="o_custkey",
        right_on="user_id",
        left_time="o_orderdate",
        right_time="ts",
    )
    return joined.select(
        "o_orderkey", F.col("ts_asof").alias("last_event_ts")
    ).orderBy("o_orderkey")


@query(
    "q18_copartitioned_zip",
    oracle=f"""
        SELECT n.frac_num,
               count(*) AS n_valid,
               {davg_sql('n.ndvi')} AS avg_ndvi
        FROM read_parquet('{fixture_path('ndvi_pixels')}') n
        JOIN read_parquet('{fixture_path('qa_pixels')}') q
          ON n.frac_num = q.frac_num AND n.x = q.x AND n.y = q.y AND n.t = q.t
        WHERE n.ndvi <> -3000
          AND ({QACONF_SQL.format(qa='q.qa')}) > 0.5
        GROUP BY n.frac_num
        ORDER BY n.frac_num
    """,
)
def q18(spark, sf_dir):
    """Multi-grid co-located zip (J1, reference jgrid/utils.py:54-81):
    qa-mask ndvi with the *other* grid's QA confidence, aggregate per chunk.
    Joining on (frac_num, x, y, t) keeps the shuffle key aligned with the
    storage partitioning — bucket both cubes by frac_num and this needs no
    shuffle at all."""
    ndvi = load(spark, sf_dir, "ndvi_pixels").select("frac_num", "x", "y", "t", "ndvi")
    qa = load(spark, sf_dir, "qa_pixels").select(
        "frac_num", "x", "y", "t", qaconf_col(F.col("qa")).alias("qaconf")
    )
    return (
        ndvi.join(qa, ["frac_num", "x", "y", "t"])
        .where((F.col("ndvi") != -3000) & (F.col("qaconf") > 0.5))
        .groupBy("frac_num")
        .agg(F.count("*").alias("n_valid"), davg("ndvi").alias("avg_ndvi"))
        .orderBy("frac_num")
    )
