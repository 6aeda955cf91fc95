"""Iterative connected components over candidate-pair edges (the 'act'
stage of near-dup detection: candidate pairs → duplicate clusters →
keeper selection).

Min-label propagation as a driver-side loop of DataFrame joins: every
vertex repeatedly adopts the minimum label among itself and its
neighbors until a fixpoint. Each iteration is one join + one aggregate
— both shuffle on the vertex id, so an iteration costs O(E) shuffle and
the loop runs diameter-many times. Duplicate clusters are shallow (near-
dup graphs are mostly small cliques), so convergence is fast in
practice; for adversarial diameters the standard accelerations
(large-star/small-star contraction) slot into the same loop shape.

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
        new_labels = (
            labels.unionByName(msgs)
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
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
