"""Iterative connected components over candidate-pair edges (the 'act'
stage of near-dup detection: candidate pairs → duplicate clusters →
keeper selection).

Min-label propagation as a driver-side loop of DataFrame joins: every
vertex repeatedly adopts the minimum label among itself, its neighbors,
AND its current label's label (pointer-doubling shortcut) until a
fixpoint. The neighbor step alone needs diameter-many iterations; the
shortcut halves remaining pointer depth each round, so convergence is
O(log diameter) — 20 iterations cover diameters up to ~2^20. Each
iteration is ONE join + one aggregate shuffling on the vertex id (O(E)
per round): the shortcut rides the same join as the neighbor messages
(as pointer edges label→vertex), and the previous label rides the
aggregate, so the convergence check is a scan, not a join. If the loop
still hasn't converged at ``max_iter`` it RAISES rather than returning
silently wrong labels.

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
    for i in range(max_iter):
        # ONE join per round: the pointer-doubling shortcut ("adopt your
        # label's label", halving remaining pointer depth — O(log
        # diameter) convergence) is expressed as extra message edges
        # (src = my label, dst = me) unioned onto the graph edges before
        # the single labels join, instead of a second labels⋈labels join.
        # Round 0 skips the pointer edges: labels are identity, so the
        # shortcut is a no-op there. (This halved the measured per-round
        # latency on the bench fixture — the loop's cost is per-round
        # fixed overhead whenever components are small.)
        relay = edges
        if i > 0:
            pointer_edges = labels.select(
                F.col("label").alias("src"), F.col("doc_id").alias("dst")
            )
            relay = edges.unionByName(pointer_edges)
        # the NULL "old" placeholder must carry the label column's OWN
        # type — ids may be strings (content hashes), and a hardcoded
        # numeric NULL would coerce the whole union's label column
        msgs = (
            relay.join(labels, relay.src == labels.doc_id)
            .select(
                F.col("dst").alias("doc_id"),
                "label",
                F.lit(None).cast(labels.schema["label"].dataType).alias("old"),
            )
        )
        # carry each vertex's previous label through the aggregate (it
        # is the row's unique non-null "old"), so the convergence check
        # below is a scan of the checkpointed result — no join job.
        new_labels = (
            labels.select("doc_id", "label", F.col("label").alias("old"))
            .unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("label") != F.col("old")).count()
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min_label_clusters did not converge within {max_iter} "
            "iterations — component diameter exceeds 2^max_iter; raise "
            "max_iter (labels would otherwise be silently wrong)"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))
