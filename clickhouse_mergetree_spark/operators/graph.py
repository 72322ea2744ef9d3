"""Distributed connected components — the graph kernel behind duplicate
clustering (and any entity-resolution / link-grouping pipeline).

Iterative min-label propagation: every vertex starts labeled with itself;
each round every vertex takes the min of its own and its neighbors'
labels; fixpoint when no label changes. Each round is one join + one
aggregate on the edge list — the standard large-graph CC shape on Spark —
and the number of rounds is bounded by the largest component's diameter
(near-dup clusters: tiny). The convergence check is a driver-side count
per round, the one legitimate driver loop (iterative algorithms); every
round's labels are persisted and the previous round's dropped.

At 100 TB: edges shuffle once per round on the vertex id. Min-label
propagation needs rounds ≈ component diameter — right for near-dup
clusters (tiny diameter), wrong for high-diameter graphs (paths, chains
of entity matches). connected_components_star below is the O(log n)-round
alternative (alternating large-star/small-star contraction, Kiveris et
al., "Connected Components in MapReduce and Beyond", 2014) behind the
same (node, label) API; both are property-tested equal in
tests/test_graph.py, including a path graph where label propagation
would need 100 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame,
                         src: str = "u", dst: str = "v") -> DataFrame:
    """Min-label connected components over an undirected edge list.

    ``edges`` holds one row per undirected edge (any orientation, dupes
    allowed). Returns (node, label) with label = min node id reachable,
    one row per node that appears in an edge.
    """
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"),
                                  F.col(src).alias("v")))
        .persist()
    )
    # Lineage discipline: each round references the previous round's frame
    # more than once, so plan size would grow EXPONENTIALLY with rounds —
    # persist() caches data but does not truncate the logical plan, and
    # Catalyst analysis of the doubling tree OOMs the driver (observed on
    # the star kernel below at ~8 rounds). localCheckpoint(eager=True)
    # materializes AND cuts lineage each round. On a multi-node cluster
    # prefer reliable checkpointing (sc.setCheckpointDir + .checkpoint())
    # so executor loss cannot drop checkpointed partitions.
    labels = bidir.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")).localCheckpoint(eager=True)
    while True:
        neighbor_min = (
            bidir.join(labels, F.col("v") == F.col("node"))
            .groupBy(F.col("u").alias("w"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, F.col("node") == F.col("w"), "left")
            .select("node",
                    F.least("label", "nmin").alias("new_label"),
                    "label")
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(
            F.col("new_label") != F.col("label")).count()
        labels = new_labels.select(
            "node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    bidir.unpersist()
    return labels


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every neighbor v > u re-points to min(Γ(u) ∪ {u})."""
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        bidir.groupBy("u").agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        bidir.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient max→min; u and its smaller neighbors re-point
    to the smallest of them."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(edges: DataFrame,
                              src: str = "u", dst: str = "v") -> DataFrame:
    """O(log n)-round connected components via alternating large-star /
    small-star contraction (Kiveris et al. 2014) — same contract as
    connected_components: (node, label), label = min reachable node id,
    one row per node appearing in an edge.

    Each round is two join+aggregate passes over the edge list; the edge
    set contracts toward stars centered at each component's min node, and
    the round count is logarithmic in component size rather than linear
    in diameter — the right kernel for entity-resolution graphs with long
    chains. Convergence = the (distinct) edge set reaches a fixpoint.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    # localCheckpoint per round: _large_star/_small_star each reference
    # their input several times, so without lineage truncation the plan
    # quadruples per round and Catalyst analysis OOMs the driver (see the
    # lineage note in connected_components).
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_count = e.count()
    while prev_count:
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_count = new_e.count()
        converged = (
            new_count == prev_count
            and new_e.exceptAll(e).limit(1).count() == 0
        )
        e, prev_count = new_e, new_count
        if converged:
            break
    # fixpoint edges form stars (node → component min); centers and
    # isolated nodes (self-loop-only inputs) label themselves
    labels = (
        nodes.join(e.select(F.col("u").alias("node"),
                            F.col("v").alias("lbl")), "node", "left")
        .select("node", F.coalesce("lbl", "node").alias("label"))
    )
    nodes.unpersist()
    return labels
