"""Streaming exact-substring dedup must equal the sequential
batch-by-batch fold of ``excise_batch_against``, and redelivered
batches must excise to nothing (idempotent corpus)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.streaming.substring_stream import (
    excise_batch_against,
    run_substring_stream,
)
from star_schema_etl_airflow_spark.operators.decontaminate import (
    positional_gram_hashes,
)

N = 4

SRC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _words(prefix, count):
    return " ".join(f"{prefix}{i}" for i in range(count))


_SHARED = _words("s", 6)

BATCHES = [
    # batch 0: establishes the shared block
    [(1, f"{_words('a', 3)} {_SHARED}"), (2, _words("b", 8))],
    # batch 1: 3 repeats the block (span excised), 4 is fresh,
    # 5 duplicates 4's text within the batch
    [(3, f"{_SHARED} {_words('c', 4)}"), (4, _words("d", 9)),
     (5, _words("d", 9))],
    # batch 2: 6 repeats batch-1 fresh content
    [(6, f"{_words('d', 9)} {_words('e', 2)}")],
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


def _sequential_fold(spark):
    """The eager twin: fold the same batches through
    excise_batch_against, accumulating the cleaned-gram index."""
    grams = None
    out = []
    for rows in BATCHES:
        batch = spark.createDataFrame(rows, SRC_SCHEMA)
        cleaned = excise_batch_against(grams, batch, n=N).filter(
            F.col("kept_tokens") > 0
        )
        out.extend(
            (r["doc_id"], r["clean_text"]) for r in cleaned.collect()
        )
        new = cleaned.select(
            F.explode(
                F.expr(positional_gram_hashes("clean_text", N))
            ).alias("g")
        ).distinct()
        grams = new if grams is None else grams.unionByName(new).distinct()
    return set(out)


def test_stream_fold_matches_sequential_fold(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    final = run_substring_stream(
        spark, landing, str(tmp_path / "corpus"),
        str(tmp_path / "grams"), SRC_SCHEMA, n=N,
    )
    got = {(r["doc_id"], r["clean_text"]) for r in final.collect()}
    assert got == _sequential_fold(spark)
    by_id = dict(got)
    # 1 keeps everything; 3's shared block is excised; 5 (full dup of 4
    # within its batch) is dropped entirely; 6 keeps only the fresh tail
    assert by_id[1] == f"{_words('a', 3)} {_SHARED}"
    assert by_id[3] == _words("c", 4)
    assert 5 not in by_id
    assert by_id[6] == _words("e", 2)


def test_redelivered_batch_excises_to_nothing(spark, tmp_path):
    landing = _stage_batches(spark, tmp_path)
    run_substring_stream(
        spark, landing, str(tmp_path / "corpus"),
        str(tmp_path / "grams"), SRC_SCHEMA, n=N,
    )
    redelivered = spark.createDataFrame(BATCHES[0], SRC_SCHEMA)
    grams = spark.read.parquet(str(tmp_path / "grams"))
    surv = excise_batch_against(grams, redelivered, n=N).filter(
        F.col("kept_tokens") > 0
    )
    assert surv.count() == 0


def test_short_doc_replay_does_not_duplicate(spark, tmp_path):
    """ADVICE r6: a document shorter than n tokens carries zero grams,
    so gram-probing alone cannot protect a redelivered batch — the
    doc_id anti-join must keep the corpus duplicate-free."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    rows = [(10, "tiny doc"), (11, _words("z", 8))]   # 2 tokens < n=4
    staging = str(tmp_path / "stage_short")
    spark.createDataFrame(rows, SRC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(f for f in os.listdir(staging)
                if f.startswith("part-") and f.endswith(".parquet"))
    import shutil

    # deliver the SAME file twice (two distinct micro-batches)
    shutil.copy(os.path.join(staging, part),
                os.path.join(landing, "batch_0.parquet"))
    shutil.copy(os.path.join(staging, part),
                os.path.join(landing, "batch_0_redelivered.parquet"))

    final = run_substring_stream(
        spark, landing, str(tmp_path / "corpus"),
        str(tmp_path / "grams"), SRC_SCHEMA, n=N,
    )
    got = [(r["doc_id"], r["clean_text"]) for r in final.collect()]
    assert sorted(got) == [(10, "tiny doc"), (11, _words("z", 8))]
