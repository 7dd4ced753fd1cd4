"""Streaming incremental dedup must equal (a) the batch-by-batch fold of
``dedup_batch_against`` and (b) global exact dedup with min-id canonical
pick, when batches arrive in ascending id order."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.streaming.dedup_stream import (
    dedup_batch_against,
    run_dedup_stream,
)

SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

BATCHES = [
    [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "zeta eta")],
    # 4 re-crawls batch-1 content; 6 duplicates 5 inside the batch
    [(4, "alpha beta gamma"), (5, "theta iota"), (6, "theta iota")],
    # 7 re-crawls 5's content; 8 is new
    [(7, "theta iota"), (8, "kappa lambda")],
]
EXPECT_IDS = {1, 2, 3, 5, 8}


def _stage_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(BATCHES):
        staging = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, SRC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.rename(
            os.path.join(staging, part),
            os.path.join(landing, f"batch_{i}.parquet"),
        )
    return landing


def test_stream_fold_matches_batch_fold_and_global_dedup(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    corpus_path = str(tmp_path / "corpus")
    final = run_dedup_stream(
        spark, landing, corpus_path, SRC_SCHEMA
    )
    got = {
        (r["doc_id"], r["text"]) for r in final.collect()
    }
    assert {i for i, _ in got} == EXPECT_IDS

    # batch twin: sequential fold of the same per-batch function
    corpus = None
    for rows in BATCHES:
        batch = spark.createDataFrame(rows, SRC_SCHEMA)
        surv = dedup_batch_against(corpus, batch)
        corpus = surv if corpus is None else corpus.unionByName(surv)
    batch_got = {(r["doc_id"], r["text"]) for r in corpus.collect()}
    assert batch_got == got

    # global twin: exact dedup with min-id pick over the concatenation
    all_rows = [r for b in BATCHES for r in b]
    all_df = spark.createDataFrame(all_rows, SRC_SCHEMA)
    glob = (
        all_df.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    assert {(r["doc_id"], r["text"]) for r in glob} == got


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    corpus_path = str(tmp_path / "corpus")
    run_dedup_stream(spark, landing, corpus_path, SRC_SCHEMA)
    # simulate an at-least-once redelivery of batch 1 OUTSIDE the
    # checkpointed stream (worst case): the index probe still rejects it
    redelivered = spark.createDataFrame(BATCHES[1], SRC_SCHEMA)
    surv = dedup_batch_against(
        spark.read.parquet(corpus_path), redelivered
    )
    assert surv.count() == 0
