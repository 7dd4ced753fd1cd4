"""Streaming video near-dup probe (streaming/video_stream.py): the
folded match state must equal the batch probe
(video_dedup_incremental) row-for-row under any batching, and
re-delivery must be a no-op."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.plans.video_dedup import (
    _shingles_of,
    video_dedup_incremental,
    video_frame_hashes,
    vseq_bases,
)
from star_schema_etl_airflow_spark.streaming.video_stream import (
    merge_matches,
    probe_batch,
    run_video_stream,
)

SF_DIR = "/root/testdata/sf0.001"
SRC_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


def _frozen(spark):
    """The standing artifacts: the at-rest shingle index and per-video
    shingle counts (at deployment: a stored inverted index)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id"
    )
    base_mod = vseq_bases(docs.count())
    at_rest = _shingles_of(
        video_frame_hashes(docs, base_mod)
    ).localCheckpoint()
    sizes = at_rest.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nc")
    ).localCheckpoint()
    return docs, base_mod, at_rest, sizes


def _stage_landing(spark, docs, landing: str, n_files: int = 4) -> None:
    os.makedirs(landing)
    for b in range(n_files):
        stage = landing + f"_stage_{b}"
        docs.filter((F.col("doc_id") / 2) % n_files == b).coalesce(1) \
            .write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        os.rename(part, f"{landing}/batch_{b}.parquet")


def test_stream_fold_equals_batch_probe(spark, tmp_path):
    docs, base_mod, at_rest, sizes = _frozen(spark)
    landing = str(tmp_path / "landing")
    _stage_landing(spark, docs, landing)
    state = run_video_stream(
        spark, landing, str(tmp_path / "state"), SRC_SCHEMA,
        at_rest, sizes, base_mod,
    )
    got = {tuple(r) for r in state.collect()}
    want = {
        tuple(r) for r in video_dedup_incremental(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_redelivery_is_a_noop(spark):
    docs, base_mod, at_rest, sizes = _frozen(spark)
    batch = docs.limit(40).localCheckpoint()
    m1 = probe_batch(batch, at_rest, sizes, base_mod)
    s1 = merge_matches(None, m1).localCheckpoint()
    s2 = merge_matches(s1, probe_batch(batch, at_rest, sizes, base_mod))
    assert s2.count() == s1.count()
    assert ({tuple(r) for r in s2.collect()}
            == {tuple(r) for r in s1.collect()})


def test_empty_landing_yields_empty_state(spark, tmp_path):
    _docs, base_mod, at_rest, sizes = _frozen(spark)
    landing = str(tmp_path / "landing_empty")
    os.makedirs(landing)
    state = run_video_stream(
        spark, landing, str(tmp_path / "state_empty"), SRC_SCHEMA,
        at_rest, sizes, base_mod,
    )
    assert state.count() == 0
