"""Streaming SCD2 maintenance must equal the batch day-by-day fold: three
daily delta files arrive (one per micro-batch, in mtime order), and the
final persisted dimension matches applying ``apply_scd2`` sequentially.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import types as T

from star_schema_etl_airflow_spark.operators.scd2 import apply_scd2
from star_schema_etl_airflow_spark.streaming.scd2_stream import (
    empty_dim,
    run_scd2_stream,
)

SRC_SCHEMA = T.StructType([
    T.StructField("customer_id", T.LongType()),
    T.StructField("email", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("run_date", T.StringType()),
])

DAYS = {
    "2024-01-01": [(1, "a@x.com", "nyc"), (2, "b@x.com", "sf")],
    "2024-01-02": [(1, "a@y.com", "nyc"), (3, "c@x.com", "la")],
    "2024-01-03": [(2, "b@x.com", "austin"), (3, "c@x.com", "la")],
}
TRACKED = ["email", "city"]


def test_streaming_scd2_matches_batch_fold(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, (d, rows) in enumerate(sorted(DAYS.items())):
        df = spark.createDataFrame(
            [(*r, d) for r in rows], SRC_SCHEMA
        )
        # the streaming file source lists FILES, not spark output dirs —
        # stage the single part-file into the landing dir
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        fpath = os.path.join(landing, f"delta_{d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        # file-source ordering is by modification time — pin it
        t = time.time() - 100 + i
        os.utime(fpath, (t, t))

    streamed = run_scd2_stream(
        spark, landing, str(tmp_path / "dim"), SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )

    expected = empty_dim(spark, SRC_SCHEMA, "customer_id", TRACKED)
    for d, rows in sorted(DAYS.items()):
        day = spark.createDataFrame(rows, SRC_SCHEMA[:3])
        expected = apply_scd2(expected, day, "customer_id", TRACKED, d, "sk")

    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in expected.collect())
    assert s == b
    # invariants: exactly one current row per key; versioned history exists
    cur = streamed.filter("is_current").groupBy("customer_id").count().collect()
    assert all(r["count"] == 1 for r in cur)
    assert streamed.count() > streamed.filter("is_current").count()


def test_replayed_batch_refolds_idempotently(spark, tmp_path):
    """Exactly-once audit (r9 verdict task 8): foreachBatch offers
    at-least-once — if the process dies AFTER write_swap commits but
    BEFORE the checkpoint records the batch, restart re-delivers the
    same batch against the already-folded dimension.  The fold must be
    idempotent: re-applying a day whose changes are already in the
    dimension detects zero changes (null-safe tracked-attr comparison),
    assigns zero new surrogate keys, and leaves the persisted dimension
    byte-identical — the same invariant the batch SCD2 pins."""
    import glob

    from pyspark.sql import functions as F
    from star_schema_etl_airflow_spark.sources.io import write_swap

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, (d, rows) in enumerate(sorted(DAYS.items())):
        df = spark.createDataFrame([(*r, d) for r in rows], SRC_SCHEMA)
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging)
                    if f.startswith("part-") and f.endswith(".parquet"))
        fpath = os.path.join(landing, f"delta_{d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        t = time.time() - 100 + i
        os.utime(fpath, (t, t))

    dim_path = str(tmp_path / "dim")
    first = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    folded = sorted(tuple(r) for r in first.collect())

    # Simulate the crash-window replay: the LAST batch (the 01-03 delta)
    # is re-delivered against the committed dimension — exactly what a
    # restart does when the swap landed but the checkpoint write didn't.
    replay_day = sorted(DAYS)[-1]
    batch_df = spark.read.schema(SRC_SCHEMA).parquet(
        os.path.join(landing, f"delta_{replay_day}.parquet"))
    dim = spark.read.parquet(dim_path)
    day = batch_df.filter(F.col("run_date") == replay_day).drop("run_date")
    refolded = apply_scd2(dim, day, "customer_id", TRACKED, replay_day, "sk")
    write_swap(refolded, dim_path)

    after = sorted(
        tuple(r) for r in spark.read.parquet(dim_path).collect())
    assert after == folded, "replayed batch changed the dimension"

    # and a full second replay of EVERY batch (worst-case restart with a
    # wiped checkpoint) is equally a no-op
    import shutil
    for p in glob.glob(dim_path.rstrip("/") + "__ckpt*"):
        shutil.rmtree(p, ignore_errors=True)
    second = run_scd2_stream(
        spark, landing, dim_path, SRC_SCHEMA,
        key="customer_id", tracked=TRACKED,
    )
    assert sorted(tuple(r) for r in second.collect()) == folded
