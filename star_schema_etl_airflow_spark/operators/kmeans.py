"""Lloyd's k-means over an embedding column — the trained coarse
quantizer for IVF ANN (replacing the deterministic-sample centroids in
``plans/llm_similarity.py``) and a curation tool in its own right
(topic-balanced sampling, outlier pruning).

Determinism contract (what makes this differentially checkable against a
SQL oracle, and re-runnable on any cluster size):
- init is data-defined (lowest ``k`` vector ids), not random;
- assignment ties break on the lowest cluster id;
- centroid means go through exact DECIMAL sums (float summation order
  varies with partitioning; decimal addition is associative), then one
  double division — bit-identical on every engine/partitioning.

Scale design (100 TB of vectors): centroids are k rows — broadcast; the
assignment scores map-side and reduces via an aggregatable
``min(struct(d, cluster))`` — map-side combine collapses the k scored
rows per vector before the exchange, so the shuffle carries one row per
vector, never N x k; the
update shuffles (cluster, dim) partial sums — k×dim rows after map-side
combine.  Each iteration is lineage-truncated (``localCheckpoint``) so
plans stay O(1) across iterations (see ``operators/components.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.vecexpr import unrolled_sqdist


def sqdist_expr(v: str, c: str, dim: int | None = None) -> str:
    """Squared L2 distance as a left-fold in array order (deterministic
    double accumulation, reproducible in any engine with an array fold).

    When ``dim`` is known the fold unrolls into a flat codegen sum
    (higher-order functions are CodegenFallback — interpreted lambdas);
    the accumulation order and every double are identical
    (``functions/vecexpr.py``).  ``dim=None`` keeps the generic HOF form
    for callers with unknown-width vectors."""
    if dim is not None:
        return f"({unrolled_sqdist(v, c, dim)})"
    return (
        f"aggregate(zip_with({v}, {c}, (x, y) -> "
        f"(cast(x as double) - cast(y as double)) "
        f"* (cast(x as double) - cast(y as double))), "
        f"cast(0 as double), (acc, z) -> acc + z)"
    )


def assign_clusters(
    vectors: DataFrame, centroids: DataFrame, dim: int | None = None
) -> DataFrame:
    """``(vec_id, cluster)``: nearest centroid per vector (ties → lowest
    cluster id).

    The argmin is an aggregatable ``min(struct(d, cluster))`` — struct
    ordering compares ``d`` first, then ``cluster``, so it is exactly the
    window's ``orderBy(d, cluster)`` tie-break, but with map-side combine:
    the shuffle carries one partially-reduced row per (vec_id, partition),
    not the N x k scored relation a per-vector window would ship."""
    scored = (
        vectors.alias("v")
        .crossJoin(F.broadcast(centroids.alias("c")))
        .select(
            "v.vec_id",
            "c.cluster",
            F.expr(sqdist_expr("v.embedding", "c.embedding", dim)).alias("d"),
        )
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cluster")).alias("best"))
        .select("vec_id", F.col("best.cluster").alias("cluster"))
    )


def update_centroids(vectors: DataFrame, assign: DataFrame) -> DataFrame:
    """New per-cluster mean vectors: explode dims, exact-decimal partial
    sums per (cluster, dim), reassemble arrays in dim order."""
    return _update_from_assigned(vectors.join(assign, "vec_id"))


def _update_from_assigned(assigned: DataFrame) -> DataFrame:
    """Centroid update from a relation already carrying
    ``(cluster, embedding)`` per vector — the fused-loop path skips the
    ``vectors ⋈ assign`` shuffle entirely (identical row multiset, so
    the associative decimal sums are bit-identical)."""
    ex = assigned.select(
        "cluster", F.posexplode("embedding").alias("dim", "val")
    )
    means = ex.groupBy("cluster", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return means.groupBy("cluster").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
        ).alias("embedding")
    )


def _assign_with_embedding(
    vectors: DataFrame, centroids: DataFrame, dim: int | None
) -> DataFrame:
    """``(vec_id, embedding, cluster)`` — ``assign_clusters`` with the
    vector carried through the argmin aggregation (every grouped row
    holds the same embedding, so ``first`` is deterministic), feeding
    ``_update_from_assigned`` without a join.  Shuffle volume is the
    same one-row-per-vector the update join would ship anyway."""
    scored = (
        vectors.alias("v")
        .crossJoin(F.broadcast(centroids.alias("c")))
        .select(
            "v.vec_id",
            "v.embedding",
            "c.cluster",
            F.expr(sqdist_expr("v.embedding", "c.embedding", dim)).alias("d"),
        )
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min(F.struct("d", "cluster")).alias("best"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", F.col("best.cluster").alias("cluster"))
    )


def kmeans_fit(
    vectors: DataFrame, k: int, n_iter: int = 2, dim: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns ``(assignment, centroids)``.

    ``vectors`` must have columns ``vec_id`` (orderable id) and
    ``embedding`` (numeric array).  Init: the ``k`` lowest vec_ids.
    ``dim``, when known, unrolls the distance into codegen
    (``sqdist_expr``).

    The returned centroids are a LAZY plan wrapped in ``persist_once``:
    no job runs until a caller acts on them (assignment-only callers
    pay nothing), but the 2-shuffle update aggregation materializes at
    most once across repeated consumption (the IVF coarse quantizer and
    the SemDeDup codebook both read them more than once — ADVICE r10).
    """
    if n_iter < 1:
        raise ValueError(f"kmeans_fit needs n_iter >= 1, got {n_iter}")
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cluster"), "embedding")
        .localCheckpoint()
    )
    assigned = None
    for i in range(n_iter):
        # fused iteration: the embedding rides the argmin shuffle, so
        # the centroid update needs no vectors ⋈ assign join; the LAST
        # update stays lazy (checkpointing it would eagerly run a
        # 2-shuffle job even for callers that only want the assignment)
        assigned = _assign_with_embedding(
            vectors, centroids, dim).localCheckpoint()
        cents = _update_from_assigned(assigned)
        centroids = cents if i == n_iter - 1 else cents.localCheckpoint()
    from star_schema_etl_airflow_spark.functions.caching import persist_once

    return assigned.select("vec_id", "cluster"), persist_once(centroids)
