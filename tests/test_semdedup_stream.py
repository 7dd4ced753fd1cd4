"""Streaming semantic-dedup probe (streaming/semdedup_stream.py): the
folded match state must equal the batch probe (semdedup_incremental)
row-for-row under any batching, and re-delivery must be a no-op."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.functions.vecexpr import unrolled_dot
from star_schema_etl_airflow_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
)
from star_schema_etl_airflow_spark.plans.clustering_queries import N_ITER
from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
    _EMB_DIM,
    _PERTURB2_S,
    _PERTURB_S,
    SEM_DUP_OFFSET,
    SEM_FRESH_OFFSET,
    SEM_RECRAWL_OFFSET,
    sem_k,
    semdedup_incremental,
)
from star_schema_etl_airflow_spark.streaming.semdedup_stream import (
    merge_matches,
    probe_batch,
    run_semdedup_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SRC_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _frozen(spark):
    """The standing artifacts the batch probe derives: codebook and
    the at-rest member table (vec_id, embedding, cluster, __norm)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, codebook = kmeans_fit(emb, sem_k(emb.count()), N_ITER, dim=_EMB_DIM)
    codebook = codebook.localCheckpoint()
    at = emb.unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + SEM_DUP_OFFSET).alias("vec_id"),
            F.expr(_PERTURB_S).alias("embedding"),
        )
    )
    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"
    at_rest = (
        at.join(assign_clusters(at, codebook, dim=_EMB_DIM), "vec_id")
        .withColumn("__norm", F.expr(norm))
        .localCheckpoint()
    )
    return emb, codebook, at_rest


def _delta(spark, emb):
    return (
        emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + SEM_RECRAWL_OFFSET).alias("vec_id"),
            F.expr(_PERTURB2_S).alias("embedding"),
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 11 == 0).select(
                (F.col("vec_id") + SEM_FRESH_OFFSET).alias("vec_id"),
                F.expr("reverse(embedding)").alias("embedding"),
            )
        )
    )


def _stage_landing(spark, delta, landing: str, n_files: int = 4) -> None:
    os.makedirs(landing)
    for b in range(n_files):
        stage = landing + f"_stage_{b}"
        delta.filter(F.col("vec_id") % n_files == b).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        os.rename(part, f"{landing}/batch_{b}.parquet")


def test_stream_fold_equals_batch_probe(spark, tmp_path):
    emb, codebook, at_rest = _frozen(spark)
    landing = str(tmp_path / "landing")
    _stage_landing(spark, _delta(spark, emb), landing)
    state = run_semdedup_stream(
        spark, landing, str(tmp_path / "state"), SRC_SCHEMA,
        codebook, at_rest,
    )
    got = {tuple(r) for r in state.collect()}
    want = {tuple(r) for r in semdedup_incremental(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0


def test_redelivery_is_a_noop(spark):
    emb, codebook, at_rest = _frozen(spark)
    batch = _delta(spark, emb).limit(20).localCheckpoint()
    m1 = probe_batch(batch, codebook, at_rest)
    s1 = merge_matches(None, m1).localCheckpoint()
    s2 = merge_matches(s1, probe_batch(batch, codebook, at_rest))
    assert s2.count() == s1.count()
    assert {tuple(r) for r in s2.collect()} == {tuple(r) for r in s1.collect()}


def test_empty_landing_yields_empty_state(spark, tmp_path):
    _emb, codebook, at_rest = _frozen(spark)
    landing = str(tmp_path / "landing_empty")
    os.makedirs(landing)
    state = run_semdedup_stream(
        spark, landing, str(tmp_path / "state_empty"), SRC_SCHEMA,
        codebook, at_rest,
    )
    assert state.count() == 0
    assert [f.name for f in state.schema.fields] == [
        "delta_id", "corpus_id", "cluster", "cosine"
    ]
