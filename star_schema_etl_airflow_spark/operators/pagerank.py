"""Weighted PageRank over an edge list — link-analysis quality scoring.

In a training-data pipeline this is the crawl-graph signal: rank pages /
domains by weighted in-link mass (the TrustRank/Common-Crawl-style
quality prior), then gate or weight documents by the score of their
source.  The operator is generic: any ``(src, dst[, weight])`` DataFrame.

Algorithm: power iteration on the row-normalized weighted adjacency,
``rank' = (1-d)/N + d * Σ_in rank * w/out_w``.  Dangling nodes keep the
teleport term only (GraphX ``staticPageRank`` behaves the same way);
redistribute-dangling-mass is a documented variant, not implemented.

Determinism: per-node contribution sums are double aggregates whose
partition order Spark does not pin, so every iteration ends with an
explicit ``round(rank, 12)`` — cross-partition (and cross-engine)
1-ulp differences are flushed each round instead of compounding.  The
differential oracle unrolls the same iterations in SQL.

Scale design (billion-node crawl graph): each iteration is one shuffle
of the edge contributions on ``dst`` plus a broadcast-or-shuffle join of
ranks to edges on ``src`` — the same join twice per round, so
pre-partitioning BOTH edges and ranks on the node key makes every round
co-located (bucketed edge tables keep it shuffle-free).  Lineage is
truncated with a lazy ``localCheckpoint`` per round (see
``operators/components.py``); round count is fixed and small (5-20), not
data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 5,
    damping: float = 0.85,
    round_digits: int = 12,
) -> DataFrame:
    """``(node, rank)`` after ``n_iter`` damped power iterations.

    ``weight`` names an edge-weight column (default: every edge weighs 1).
    Ranks sum to ≤ 1 (dangling mass decays into the teleport term).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # k-sized driver scalar (node count), like the max-sk seed
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))  # empty graph

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
    )
    # The normalized edge list is reused every round — cache it once.
    norm = norm.localCheckpoint(eager=False)

    teleport = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("mass"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport) + damping * F.coalesce("mass", F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
