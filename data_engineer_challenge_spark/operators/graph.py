"""Connected components over a pair list (iterative label propagation)
— the canonical iterative-algorithm operator (dedup pairs → dedup
*clusters* with one canonical representative each).

Algorithm: every node starts labeled with its own id; each round, a
node adopts the minimum label among itself and its neighbors; stop when
no label changes. Rounds needed ≈ graph diameter (near-dup clusters are
tiny, so 2-4 rounds in practice). Each round is two hash joins + one
aggregation — all distributed, no driver-side graph. For planet-scale
graphs swap in the large-star/small-star variant; the interface stays.
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
    minimum node id in the cluster."""
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
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
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), F.col("u.node") == F.col("l.node"))
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        # the convergence check above materialized `updated`, so the
        # previous round's cache is dead weight from here on
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
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
