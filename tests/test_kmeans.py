"""K-means invariants: total assignment, and Lloyd's monotone inertia."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    sqdist_expr,
    update_centroids,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 4


def _inertia(vectors, assign, centroids) -> float:
    return (
        vectors.join(assign, "vec_id")
        .join(centroids.withColumnRenamed("embedding", "cent"), "cluster")
        .select(F.expr(sqdist_expr("embedding", "cent")).alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )


def test_every_vector_assigned_to_one_of_k_clusters(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    assign, centroids = kmeans_fit(emb, K, n_iter=2)
    assert assign.count() == emb.count()
    assert assign.select("vec_id").distinct().count() == emb.count()
    assert centroids.count() <= K


def test_lloyd_iterations_never_increase_inertia(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).localCheckpoint()
    init = (
        emb.orderBy("vec_id").limit(K)
        .select(F.col("vec_id").alias("cluster"), "embedding")
    )
    a1 = assign_clusters(emb, init)
    c1 = update_centroids(emb, a1).localCheckpoint()
    a2 = assign_clusters(emb, c1)
    c2 = update_centroids(emb, a2).localCheckpoint()
    # inertia vs the centroids each assignment was made against
    i1 = _inertia(emb, a1, c1)   # after first update (≤ vs init by def)
    i2 = _inertia(emb, a2, c2)
    assert i2 <= i1 + 1e-9


def test_n_iter_zero_rejected_and_centroids_single_materialization(spark):
    """ADVICE r10: n_iter=0 used to die with AttributeError deep in the
    return expression; now it's a clear ValueError.  And the returned
    centroids are persist_once-wrapped so repeated consumers (IVF
    coarse quantizer, SemDeDup codebook) don't re-run the 2-shuffle
    update aggregation per action."""
    import pytest

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="n_iter >= 1"):
        kmeans_fit(emb, K, n_iter=0)

    _, cents = kmeans_fit(emb, K, n_iter=1)
    cents.count()  # materialize once
    assert cents.storageLevel.useMemory, (
        "final centroids should be cached after first action"
    )
