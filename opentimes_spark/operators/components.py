"""Connected components over a pair/edge list — the clustering step that
turns near-duplicate PAIRS (minhash/jaccard output) into dedup GROUPS
with a canonical representative (min doc id) per group.

Algorithm: iterative min-label propagation. Each node starts labelled
with itself; every round each node takes the min label among itself and
its neighbors; converged when no label changes. Rounds = graph diameter
(near-dup graphs are shallow — big components are dense clusters, so a
handful of rounds suffices). This driver-coordinated loop is the
standard Spark shape for iterative algorithms (GraphFrames' own
connectedComponents does the same with alternating optimizations);
``localCheckpoint`` truncates lineage each round so plans don't grow
exponentially.

Scale: each round is one shuffle (join on node) + one aggregation, both
keyed by node id — uniformly distributed. State is one row per node,
never materialized on the driver; only the 1-row convergence count is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``;
    component_id = min node id in the component. Raises if not converged
    within ``max_iter`` rounds (near-dup graphs converge in a few)."""
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    und = und.distinct().localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node"), F.col("lbl").alias("component_id"))
    raise RuntimeError(f"did not converge in {max_iter} rounds")


def dedup_groups(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(node, component_id, n_members): components plus their sizes —
    the keep-one-per-group frame a dedup pipeline anti-joins against."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(sizes, "component_id").select("node", "component_id", "n_members")
