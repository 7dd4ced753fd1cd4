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
Components in MapReduce and Beyond", KDD 2014), which contracts chains
in O(log² n) rounds: :func:`big_star_components` implements it with
the same ``(node, component)`` contract, result-equality-pinned
against :func:`connected_components` in ``tests/test_components.py``
and round-count-measured in ``tools/cc_rounds_curve.py`` → SCALE.md.
The simple propagation loop stays the default for near-dup clusters
(tiny diameters; one shuffle per round vs large/small-star's two).
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
    stats: dict | None = None,
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

    for it in range(max_iter):
        if stats is not None:
            stats["rounds"] = it + 1
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


def _canon(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Distinct unordered pairs as (lo, hi), self-loops dropped."""
    return (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node u connects its STRICTLY LARGER neighbors
    to m = min(Γ(u) ∪ {u}) — Kiveris et al. §3, the phase that halves
    long chains."""
    sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
        e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return _canon(
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("a"),
            F.least(F.col("mv"), F.col("u")).alias("b"),
        )
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node u connects its not-larger neighborhood
    (and itself) to its minimum — the phase that flattens the stars
    large-star built."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    leaves = (
        e.join(mins, "hi")
        .select(F.col("lo").alias("a"), F.col("m").alias("b"))
    )
    centers = mins.select(F.col("hi").alias("a"), F.col("m").alias("b"))
    return _canon(leaves.unionByName(centers))


def big_star_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """:func:`connected_components` via alternating large-star /
    small-star contractions (Kiveris et al., KDD 2014): converges in
    O(log² n) rounds regardless of component DIAMETER, where min-label
    propagation needs Θ(diameter) rounds — the robustness form for
    adversarial long-chain graphs.  Same ``(node, component)``
    contract; two shuffles per round (one per phase) on node id, edge
    set monotonically contracting toward stars centered at each
    component's minimum id.  Raises after ``max_iter`` non-converged
    rounds rather than returning partial labels."""
    e = _canon(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint()

    if nodes is None:
        vertices = e.select(F.col("lo").alias("node")).unionByName(
            e.select(F.col("hi").alias("node"))
        ).distinct()
    else:
        vertices = nodes.select(F.col(node_col).alias("node")).distinct()

    def _sig(df: DataFrame) -> tuple[int, int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            # xor: order-insensitive, overflow-free (rows are distinct,
            # and count disambiguates the all-cancelled case)
            F.coalesce(
                F.expr("bit_xor(xxhash64(lo, hi))"), F.lit(0)
            ).alias("h"),
            # second independent 64-bit aggregate (seeded differently
            # via an extra literal column): a single-hash collision
            # between consecutive DISTINCT edge sets would end the loop
            # early and return wrong components silently; requiring two
            # independent collisions makes that ~2^-128 (ADVICE r14)
            F.coalesce(
                F.expr("bit_xor(xxhash64(hi, lo, 'cc2'))"), F.lit(0)
            ).alias("h2"),
        ).first()
        return int(row["c"]), int(row["h"]), int(row["h2"])

    if not e.isEmpty():
        sig = _sig(e)
        for it in range(max_iter):
            if stats is not None:
                stats["rounds"] = it + 1
            # lazy checkpoint, materialized BY the signature action below —
            # one Spark job per round instead of two (r16; the
            # connected_components loop above already uses this shape)
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            new_sig = _sig(e)
            if new_sig == sig:
                break
            sig = new_sig
        else:
            raise ValueError(
                f"large/small-star did not converge in {max_iter} rounds"
            )

    # fixpoint: stars (root=lo, leaf=hi); groupBy-min collapses the
    # final pre-convergence edge set defensively
    labels = e.groupBy(F.col("hi").alias("node")).agg(
        F.min("lo").alias("component")
    )
    return (
        vertices.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )
