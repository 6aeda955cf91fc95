"""End-to-end corpus cleaning: stage arithmetic, keeper invariants, and
that the pipeline actually removes planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.pipeline import clean_corpus
from rastercube_spark.sources.tables import load


def test_clean_corpus_stages(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    cleaned, report = clean_corpus(docs)
    assert report["input"] == docs.count()
    assert (
        report["kept"]
        == report["input"]
        - report["dropped_exact_dup"]
        - report["dropped_near_dup"]
        - report["dropped_low_quality"]
    )
    assert report["dropped_near_dup"] > 0  # the corpus has near-dups
    assert 0 < report["kept"] <= report["input"]
    # cleaned ids are unique and a subset of the input
    assert cleaned.count() == cleaned.select("doc_id").distinct().count()


def test_clean_corpus_removes_planted_dups(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(50)
    # plant an exact dup (new id) and a whitespace variant
    base = docs.where(F.col("doc_id") == docs.first()["doc_id"])
    dup = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("  "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    planted = docs.unionByName(dup)
    cleaned, report = clean_corpus(planted)
    assert report["dropped_exact_dup"] >= 1
    kept_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert base.first()["doc_id"] in kept_ids or report["dropped_low_quality"] > 0
    assert base.first()["doc_id"] + 100000 not in kept_ids
