"""Multimodal stage plumbing: schema, batch fan-out, no-shuffle
partition preservation, and composition with the similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from rastercube_spark.operators.multimodal import (
    attach_payload,
    decode_metrics,
    extract_features,
    resize_media,
    sample_frames,
)
from rastercube_spark.sources.tables import load


def _media(spark, sf_dir):
    return attach_payload(load(spark, sf_dir, "documents"))


def test_frame_sample_fanout_matches_decode(spark, sf_dir):
    """Every doc emits ceil(n_frames / stride) frames, and frame byte
    counts sum back to the payload size for fully-sampled docs."""
    media = _media(spark, sf_dir)
    frames = sample_frames(media, stride=1).cache()
    meta = decode_metrics(media)
    per_doc = frames.groupBy("doc_id").agg(
        F.count("*").alias("k"),
        F.first("n_frames").alias("nf"),
        F.sum(F.length("frame")).alias("total"),
    )
    joined = per_doc.join(
        meta.select("doc_id", "n_frames", "n_bytes"), "doc_id"
    )
    bad = joined.where(
        (F.col("k") != F.col("n_frames"))
        | (F.col("nf") != F.col("n_frames"))
        | (F.col("total") != F.col("n_bytes"))  # stride=1 → lossless split
    ).count()
    assert bad == 0
    frames.unpersist()


def test_stages_preserve_partitioning(spark, sf_dir):
    """mapInPandas stages are map-only: no exchange in the plan."""
    media = _media(spark, sf_dir).repartition(4)
    for stage in (
        sample_frames(media),
        extract_features(media),
        resize_media(media),
    ):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        # the only exchange is the explicit repartition of the input
        assert plan.count("Exchange") == 1, plan[:500]


def test_resize_shrinks_and_is_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    r = resize_media(media, max_dim=64)
    rows = r.join(
        media.select("doc_id", F.length("payload").alias("orig")), "doc_id"
    )
    bad = rows.where(
        (F.col("width") > 64) & (F.col("height") > 64)
        | (F.length("payload") > F.col("orig"))
        | (F.col("scale") > 1.0)
    ).count()
    assert bad == 0
    a = sorted(map(str, r.collect()))
    b = sorted(map(str, resize_media(media, max_dim=64).collect()))
    assert a == b


def test_features_feed_similarity(spark, sf_dir):
    """The featurizer's array<float> output drives the ANN operators."""
    from rastercube_spark.operators.similarity import brute_force_knn

    feats = extract_features(_media(spark, sf_dir), dim=16)
    qs = feats.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("q_id"), F.col("feature").alias("q_vec")
    )
    out = brute_force_knn(qs, feats, k=3, c_id="doc_id", c_vec="feature")
    rows = out.collect()
    assert len(rows) == 9
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in rows)
