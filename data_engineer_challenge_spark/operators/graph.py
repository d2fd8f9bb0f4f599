"""Connected components over a pair list (iterative label propagation)
— the canonical iterative-algorithm operator (dedup pairs → dedup
*clusters* with one canonical representative each).

Algorithm: every node starts labeled with its own id; each round, a
node adopts the minimum label among itself and its neighbors; stop when
no label changes. Rounds needed ≈ graph diameter (near-dup clusters are
tiny, so 2-4 rounds in practice). Each round is two hash joins + one
aggregation — all distributed, no driver-side graph. For planet-scale
graphs swap in the large-star/small-star variant; the interface stays.

Lineage discipline: each round's labels reference the previous round's
plan TWICE (the neighbor join and the convergence diff), so without
truncation the logical plan grows exponentially with rounds and OOMs
the driver around round ~10 regardless of data size. Every round
therefore ends in an eager ``localCheckpoint`` — the iterative-Spark
standard — keeping plan depth constant; orphaned checkpoint RDDs are
freed by the ContextCleaner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component =
    minimum node id in the cluster.

    Raises if labels still change after ``max_iterations`` rounds —
    min-label propagation advances one hop per round, so a cluster of
    diameter > max_iterations would otherwise return silently WRONG
    components (two "canonical" survivors inside one true cluster).
    Near-dup clusters are shallow; a legitimate deeper graph should
    raise ``max_iterations`` or switch to a large-star/small-star
    variant, not swallow the truncation."""
    # symmetric edge list from ONE scan of `pairs` (explode, not a
    # two-branch union: the pair source is often an expensive
    # candidate-generation pipeline, and each union branch would
    # recompute it in full before the cache materializes)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(left_col).alias("src"), F.col(right_col).alias("dst")
                    ),
                    F.struct(
                        F.col(right_col).alias("src"), F.col(left_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .cache()
    )
    # round 1 fused into initialization: a node's label after one
    # propagation round is min(self, neighbors) — one aggregation,
    # no join against an all-self-labels frame
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__nbr_min"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "__nbr_min").alias("component"),
        )
        .localCheckpoint()  # constant plan depth from round 1
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                # carried so convergence is a scan of THIS checkpoint,
                # not another join against the previous labels
                F.col("component").alias("__prev"),
            )
            # eager: materializes AND truncates lineage — the plan
            # would otherwise double in size every round (see module
            # docstring) since `labels` is referenced twice
            .localCheckpoint()
        )
        changed = (
            updated.filter(F.col("component") != F.col("__prev")).limit(1).count()
        )
        labels = updated.drop("__prev")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations (cluster diameter exceeds "
            "the round budget); raise max_iterations"
        )
    edges.unpersist()
    return labels.select("node", "component")


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup pairs → (node, canonical) keep/drop assignment: the
    cluster minimum is the canonical survivor."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        "node",
        F.col("component").alias("canonical"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
