"""Iterative connected components over candidate-pair edges (the 'act'
stage of near-dup detection: candidate pairs → duplicate clusters →
keeper selection).

Min-label propagation as a driver-side loop of DataFrame joins: every
vertex repeatedly adopts the minimum label among itself, its neighbors,
AND its current label's label (pointer-doubling shortcut) until a
fixpoint. The neighbor step alone needs diameter-many iterations; the
shortcut halves remaining pointer depth each round, so convergence is
O(log diameter) — 20 iterations cover diameters up to ~2^20. Each
iteration is two joins + one aggregate, all shuffling on the vertex id
(O(E) per round). If the loop still hasn't converged at ``max_iter`` it
RAISES rather than returning silently wrong labels.

lineage: each iteration localCheckpoints the label relation — without
it the plan doubles per iteration and the driver dies on analysis cost
long before the cluster does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def min_label_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, cluster_id) where
    cluster_id = min vertex id reachable. Only vertices appearing in
    ``pairs`` are returned."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        # pointer-doubling shortcut: adopt your label's label, halving
        # the remaining pointer depth every iteration (O(log diameter))
        shortcut = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.label") == F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_id"), F.col("b.label").alias("label"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .unionByName(shortcut)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min_label_clusters did not converge within {max_iter} "
            "iterations — component diameter exceeds 2^max_iter; raise "
            "max_iter (labels would otherwise be silently wrong)"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
