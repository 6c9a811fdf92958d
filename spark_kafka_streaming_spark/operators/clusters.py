"""Duplicate-cluster resolution: pairs → connected components →
canonical survivors.

The dedup operators (:mod:`.dedup`) emit near-duplicate *pairs*; an
actual training-data pipeline must then pick one survivor per
duplicate *cluster* (pairs are not transitive-closed: A~B, B~C often
arrives without A~C).  Connected components over the pair graph, with
``cluster_id = min(doc_id in component)``, gives a deterministic
canonical choice.

Algorithm: min-label propagation — every node repeatedly takes the
minimum label among itself and its neighbors; converges in
O(graph diameter) rounds.  Near-dup graphs are unions of small dense
clusters (diameter 2-4), so a handful of rounds suffices; each round
is one shuffle-bounded join + map-side-combining aggregate, with
``localCheckpoint`` per round so the plan stays flat instead of
nesting one join deeper per iteration.  The convergence test is an aggregate (``count`` of
changed labels), not a data collect — the loop is driver-side control
flow over distributed rounds, the standard Spark shape for iterative
graph algorithms (same structure as the large-star/small-star
algorithm you would switch to if components were web-scale chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node with the minimum id reachable through ``pairs``.

    ``pairs``: undirected edges as (id1, id2); ``nodes``: one row per
    node (singletons included).  Returns (id_col, cluster_id).
    """
    edges_fwd = pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    edges = edges_fwd.union(
        edges_fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()  # eager: computed once, lineage truncated

    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()

    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # localCheckpoint per round keeps the plan flat (persist alone
        # would nest the logical plan one join deeper per round) and
        # releases the previous round's blocks when they age out.
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(
            F.col("label") != F.col("old_label")
        ).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def dedup_survivors(
    pairs: DataFrame, nodes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, cluster_id, is_survivor): keep rows where ``is_survivor``
    to realize the deduplicated corpus."""
    cc = connected_components(pairs, nodes, id_col)
    return cc.withColumn(
        "is_survivor", (F.col(id_col) == F.col("cluster_id"))
    )
