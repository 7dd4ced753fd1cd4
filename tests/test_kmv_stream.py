"""Streaming KMV sketch maintenance (streaming/kmv_stream.py): the
stream fold must equal the batch operator's sketch of everything ever
ingested, regardless of batching, and re-delivery must be a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from star_schema_etl_airflow_spark.plans.kmv_overlap import kmv_sketches
from star_schema_etl_airflow_spark.streaming.kmv_stream import (
    merge_sketches,
    run_kmv_stream,
)

SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("source", T.StringType()),
    T.StructField("text", T.StringType()),
])

BATCHES = [
    [(1, "a", "w1 w2 w3 w4 w5"), (2, "b", "w3 w4 w5 w6 w7")],
    [(3, "a", "w8 w9 w10 w11"), (4, "c", "w1 w2 w3 x1 x2")],
    # re-crawl of batch-1 content plus fresh rows
    [(5, "b", "w3 w4 w5 w6 w7"), (6, "c", "y1 y2 y3 y4 y5")],
]


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


def _same(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_stream_fold_equals_batch_sketch_of_all_rows(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    sketch_path = str(tmp_path / "sketch")
    got = run_kmv_stream(spark, landing, sketch_path, SRC_SCHEMA)
    all_rows = [r for b in BATCHES for r in b]
    want = kmv_sketches(
        spark,
        spark.createDataFrame(all_rows, SRC_SCHEMA).select("source", "text"),
    )
    assert _same(got, want)


def test_redelivery_is_a_noop(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    sketch_path = str(tmp_path / "sketch")
    run_kmv_stream(spark, landing, sketch_path, SRC_SCHEMA)
    before = spark.read.parquet(sketch_path).collect()
    # simulate at-least-once: fold batch 0 again manually
    batch0 = spark.createDataFrame(BATCHES[0], SRC_SCHEMA)
    existing = spark.read.parquet(sketch_path)
    merged = merge_sketches(
        existing, kmv_sketches(spark, batch0.select("source", "text"))
    )
    after = merged.collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_batching_independence(spark, tmp_path):
    """One landing file with everything vs three files — same sketch."""
    landing_all = str(tmp_path / "landing_all")
    os.makedirs(landing_all)
    staging = str(tmp_path / "stage_all")
    all_rows = [r for b in BATCHES for r in b]
    spark.createDataFrame(all_rows, SRC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.rename(os.path.join(staging, part),
              os.path.join(landing_all, "all.parquet"))
    one = run_kmv_stream(
        spark, landing_all, str(tmp_path / "sketch_one"), SRC_SCHEMA
    )
    landing = _stage_batches(spark, tmp_path)
    three = run_kmv_stream(
        spark, landing, str(tmp_path / "sketch_three"), SRC_SCHEMA
    )
    assert _same(one, three)
