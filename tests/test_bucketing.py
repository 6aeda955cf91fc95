"""Bucketed-layout demonstration (SURVEY §6 scale lever): writing both
raster relations bucketed+sorted on the join key removes the exchange from
the co-located zip join — the executable form of the 'bucketed layout
makes this shuffle-free at scale' claims on q18/q26."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rastercube_spark.sources.tables import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # default warehouse dir (spark-warehouse/, gitignored) — the
    # warehouse conf is static and cannot move per-test; clear leftovers
    # from interrupted runs (metastore forgets, the directory doesn't)
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_ndvi", "b_qa"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    ndvi = load(spark, sf_dir, "ndvi_pixels").select("frac_num", "x", "y", "t", "ndvi")
    qa = load(spark, sf_dir, "qa_pixels").select("frac_num", "x", "y", "t", "qa")
    for df, name in [(ndvi, "b_ndvi"), (qa, "b_qa")]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "frac_num", "x", "y", "t")
            .sortBy("frac_num", "x", "y", "t")
            .format("parquet")
            .saveAsTable(name)
        )
    yield "b_ndvi", "b_qa"
    spark.sql("DROP TABLE IF EXISTS b_ndvi")
    spark.sql("DROP TABLE IF EXISTS b_qa")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    n_name, q_name = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(n_name)
            .join(spark.table(q_name), ["frac_num", "x", "y", "t"])
            .groupBy("frac_num")
            .count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed+sorted layout feeds the sort-merge join directly: the
        # ONLY shuffle in the plan is the final aggregation's (keyed on a
        # prefix of the bucket key, which bucketing-by-4-cols can't serve)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        assert "Bucketed: true" in plan

        # the identical unbucketed join shuffles BOTH inputs + the agg
        plain = (
            load(spark, sf_dir, "ndvi_pixels")
            .select("frac_num", "x", "y", "t", "ndvi")
            .join(
                load(spark, sf_dir, "qa_pixels").select(
                    "frac_num", "x", "y", "t", "qa"
                ),
                ["frac_num", "x", "y", "t"],
            )
            .groupBy("frac_num")
            .count()
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") == 3

        got = {r["frac_num"]: r["count"] for r in joined.collect()}
        want = {r["frac_num"]: r["count"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_incremental_dedup_bucketed_store_never_shuffles(spark, sf_dir):
    """qd1's 100 TB claim made executable (r8): with the standing
    corpus's fingerprint store written bucketed on `fingerprint`, the
    incremental-dedup anti-join AND the store-side distinct both run
    exchange-free on the store — the ONLY shuffle in the whole plan is
    the (small) ingest batch aligning to the store's bucketing, and the
    final keeper groupBy rides that same partitioning. The corpus is
    never re-shuffled, which is the property that lets the store grow
    to corpus scale while per-batch cost stays proportional to the
    batch."""
    import shutil

    from rastercube_spark.operators.dedup import exact_dedup, incremental_dedup
    from pyspark.sql import functions as F

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS b_fps")
    shutil.rmtree(f"{wh}/b_fps", ignore_errors=True)
    d = load(spark, sf_dir, "documents")
    (
        exact_dedup(d, "doc_id", "text")
        .select("fingerprint")
        .write.mode("overwrite")
        .bucketBy(8, "fingerprint")
        .sortBy("fingerprint")
        .format("parquet")
        .saveAsTable("b_fps")
    )
    batch = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_dedup(batch, spark.table("b_fps"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "Bucketed: true" in plan
        # one exchange total: the batch aligning to the store bucketing;
        # store distinct + anti-join + keeper agg all reuse partitionings
        assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
        # and the result is still correct: every batch fingerprint that
        # already exists in the store is dropped
        assert out.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_fps")
