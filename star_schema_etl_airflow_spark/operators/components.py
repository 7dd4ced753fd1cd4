"""Connected components via iterative min-label propagation — the cluster
resolution step that turns near-dup PAIRS into dedup GROUPS.

LSH/SimHash emit pairwise matches; keeping one doc per *transitive*
cluster (A~B, B~C ⇒ {A,B,C} keep one) requires connected components over
the match graph.  Min-label propagation: every node starts labeled with
itself; each round a node takes the minimum label among itself and its
neighbors; at fixpoint the label is the smallest node id in the component
— a natural canonical-document id.

Scale design (100 TB corpus): the match graph is VASTLY smaller than the
corpus (only docs with a near-dup appear), and its components are
near-dup clusters — typically tiny (2-100 nodes), so the round count ≈
component diameter ≈ a handful.  Each round is one shuffle on node id of
(labels ∪ neighbor messages).  For adversarial long-chain graphs the
published fix is large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which squares away chains in
O(log²) rounds; the propagation loop below is the diameter-bounded
simple form with an explicit ``max_iter`` guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """``(node, component)`` for every node, where ``component`` is the
    smallest node id reachable through ``edges`` (undirected).

    ``nodes`` optionally supplies isolated vertices (e.g. every corpus doc,
    so singletons appear as their own cluster); otherwise the vertex set is
    the union of edge endpoints.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()

    if nodes is None:
        vertices = sym.select(F.col("a").alias("node")).distinct()
    else:
        vertices = nodes.select(F.col(node_col).alias("node")).distinct()

    # localCheckpoint (not persist): iterative algorithms must TRUNCATE
    # lineage each round, or the logical plan doubles per iteration and
    # planning itself OOMs long before the data does.  On a cluster with
    # unreliable executors, use reliable checkpointing (checkpoint dir)
    # or persist(DISK_ONLY) + count with the same loop shape.
    labels = vertices.withColumn("component", F.col("node")).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # push my current label to every neighbor, then take the min of
        # (own label, received labels) per node
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "component")
        )
        # lazy checkpoint: materialized BY the changed-count action below —
        # one Spark job per round instead of two (eager would run its own)
        new_labels = (
            labels.select("node", "component")
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels
