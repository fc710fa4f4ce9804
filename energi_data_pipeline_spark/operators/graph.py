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
    # materialize the symmetrized edge list ONCE (r13): every
    # propagation round's action lineage otherwise re-executes the
    # whole upstream pair pipeline (labels is cached, sym is not).
    # Interleaved A/Bs at sf0.1 measure the checkpoint NEUTRAL on
    # both the bare LSH pair graph (2.71 vs 2.73s min-of-3) and the
    # composed curation_cluster_representatives (3.8-4.2 vs
    # 3.6-4.1s) — at test scale Spark's exchange reuse already
    # absorbs most of the recompute.  Kept for 100 TB, where the
    # pair pipeline dominates the query and a cache miss or reuse
    # failure would charge it once per round; the materialization
    # is bounded at 2x the edge count.  (A pair of same-day bench
    # captures read 6.7-9.5s vs 2.4-3.3s across this change — that
    # delta does NOT survive the interleaved A/B; it was the box's
    # burst weather, which on this host can triple walls while
    # passing every loadavg idle gate.)
    sym = sym.localCheckpoint(eager=True)
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


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (hi, lo), deduped."""
    return (e.select(F.greatest("a", "b").alias("a"),
                     F.least("a", "b").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's minimum
    neighborhood label (Kiveris et al. SoCC'14, public literature)."""
    mins = (sym.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b")))


def _small_star(sym: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    the minimum of that neighborhood."""
    le = sym.filter(F.col("v") < F.col("u"))
    mins = le.groupBy("u").agg(F.min("v").alias("mn"))
    out1 = (le.join(mins, "u")
            .select(F.col("v").alias("a"), F.col("mn").alias("b")))
    out2 = mins.select(F.col("u").alias("a"), F.col("mn").alias("b"))
    return out1.union(out2)


def connected_components_star(edges: DataFrame, src: str, dst: str,
                              max_iter: int = 50) -> DataFrame:
    """``(id, cluster_id)`` by ALTERNATING LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log^2 n) rounds regardless of diameter,
    where min-label propagation needs diameter rounds — this is the
    scale path for deep or skewed graphs (long similarity chains),
    while :func:`connected_components` stays the cheaper choice for
    the shallow near-dup graphs dedup usually produces.

    Both star steps are one groupBy + one self-join per round —
    shuffle keyed on the vertex id; high-degree vertices flatten
    INTO stars instead of becoming stragglers (that is the point of
    the algorithm).  Returns the same labeling as
    :func:`connected_components` (property-tested equal).

    Each round is lineage-truncated with ``localCheckpoint``:
    ``cache()`` caps recompute but NOT the analyzed plan, and this
    loop references the previous round four times (two star sides +
    the convergence diff), so the plan tree doubles per round — AQE's
    plan-string rendering alone OOMs the driver by round ~8 without
    the checkpoint (measured).  On a real cluster use reliable
    ``checkpoint()`` to survive executor loss on long runs."""
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .filter(F.col(src).isNotNull() & F.col(dst).isNotNull()))
    # vertices seen only in self-loops survive as singleton clusters
    verts = (e0.select(F.col("a").alias("id"))
             .union(e0.select(F.col("b").alias("id"))).distinct()
             .localCheckpoint())
    cur = _canon(e0).localCheckpoint()
    if cur.isEmpty():
        return verts.withColumn("cluster_id", F.col("id"))
    for _ in range(max_iter):
        sym = (cur.select(F.col("a").alias("u"), F.col("b").alias("v"))
               .union(cur.select(F.col("b").alias("u"),
                                 F.col("a").alias("v"))))
        after_large = _canon(_large_star(sym))
        sym2 = (after_large
                .select(F.col("a").alias("u"), F.col("b").alias("v"))
                .union(after_large.select(F.col("a").alias("v"),
                                          F.col("b").alias("u"))
                       .select("u", "v")))
        nxt = _canon(_small_star(sym2)).localCheckpoint()
        changed = (nxt.exceptAll(cur).limit(1).count()
                   + cur.exceptAll(nxt).limit(1).count())
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iter} rounds")
    # fixpoint: every edge is (member, root); every other original
    # vertex (roots, self-loop-only singletons) labels itself
    children = cur.select(F.col("a").alias("id"),
                          F.col("b").alias("cluster_id"))
    selves = (verts.join(children.select("id"), "id", "left_anti")
              .withColumn("cluster_id", F.col("id")))
    return children.union(selves)
