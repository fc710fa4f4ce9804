"""Iterative graph operators on DataFrames.

Connected components by min-label propagation: every vertex starts
labeled with itself; each round, a vertex takes the minimum label
among itself and its neighbors; fixpoint = components labeled by
their minimum member.  Rounds = graph diameter; each round is one
shuffle (join + min-aggregate).

This is the dedup endgame — near-dup PAIRS become dedup CLUSTERS by
transitive closure.  At 100 TB scale, diameter-bound propagation on
a skewed graph is improved by the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature); plain propagation is kept
here because near-dup graphs are shallow (chains of similar docs),
so the loop runs 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 25) -> DataFrame:
    """``(id, cluster_id)`` for every vertex of the edge list;
    cluster_id = the component's minimum vertex id.

    The loop is driver-coordinated but all data stays distributed;
    per round: one equi-join on the vertex id + one min-aggregate.
    Caching each round's labels stops lineage growth (the iterative
    equivalent of checkpointing).
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v"))))
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("label", F.col("id"))).cache()
    labels.count()
    changed = -1
    for _ in range(max_iter):
        neigh = (sym.join(labels, sym.v == labels.id)
                 .select(F.col("u").alias("id"), "label"))
        new_labels = (
            labels.select("id", "label").union(neigh)
            .groupBy("id").agg(F.min("label").alias("label"))).cache()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # partially-propagated labels are silently WRONG clusterings;
        # refuse to return them (diameter > max_iter — raise the cap
        # or switch to large-star/small-star for deep graphs)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"iterations ({changed} labels still changing)")
    return labels.select("id", F.col("label").alias("cluster_id"))
