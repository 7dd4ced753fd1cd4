#!/usr/bin/env python
"""Measured multi-batch cost curve for the streaming KMV fold
(r12 verdict task 8 — the kmv_stream twin of ``rebuild_curve.py``).

``streaming/kmv_stream.py`` folds each micro-batch's sketch into the
persisted per-source sketch table (union → re-take bottom-K).  The
100 TB claim: the persisted state is bottom-K-bounded (sources × K rows
FOREVER), so per-batch cost is the batch's own scan plus a
sketch-sized merge — flat in how much has already been ingested.  This
tool measures that directly: a landing dir of B batch files over S
sources, drained by ``run_kmv_stream`` (availableNow, one file per
micro-batch), at a grid of (batches × sources) cells.

Reading the table: within a sources row, per-batch cost must stay ≈
flat as batches (and hence cumulative corpus) grow ×4 — the folded
sketch the B-th batch merges against is the same sources×K rows the
1st merged against.  Across sources rows, per-batch cost may grow
mildly (the merge window is per-source bottom-K over sources×K rows).

Usage: python tools/kmv_stream_curve.py >> SCALE.md
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/kmv_stream_curve"
DOCS_PER_BATCH = 500
TOKENS_PER_DOC = 40
VOCAB = 50_000

BATCHES = [8, 16, 32]
SOURCES = [20, 80]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def build_landing(spark, batches: int, sources: int) -> str:
    """One parquet file per micro-batch, mtime-ordered; deterministic
    synthetic docs (hash-derived token ids, disjoint per batch so the
    cumulative distinct-hash corpus really grows with every batch)."""
    from pyspark.sql import functions as F

    out = f"{WORK}/landing_b{batches}_s{sources}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for b in range(batches):
        df = (
            spark.range(DOCS_PER_BATCH)
            .select(
                (F.col("id") + b * DOCS_PER_BATCH).alias("doc_id"),
                F.concat(
                    F.lit("s"), (F.col("id") % sources).cast("string")
                ).alias("source"),
                F.expr(
                    f"concat_ws(' ', transform(sequence(1, "
                    f"{TOKENS_PER_DOC}), i -> concat('b{b}w', "
                    f"pmod(hash(id * 9973 + i * 131), {VOCAB}))))"
                ).alias("text"),
            )
        )
        staging = f"{WORK}/stage"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging)
                    if f.startswith("part-") and f.endswith(".parquet"))
        fpath = os.path.join(out, f"batch_{b:03d}.parquet")
        os.rename(os.path.join(staging, part), fpath)
        t = 1_700_000_000 + b  # fixed, strictly increasing mtimes
        os.utime(fpath, (t, t))
    return out


def main() -> None:
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.streaming.kmv_stream import (
        run_kmv_stream,
    )

    spark = get_spark("kmv-stream-curve")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    cal = [pyloop()]

    rows = []
    for s in SOURCES:
        for b in BATCHES:
            landing = build_landing(spark, b, s)
            run_dir = f"{WORK}/run_b{b}_s{s}"
            if os.path.isdir(run_dir):
                shutil.rmtree(run_dir)
            os.makedirs(run_dir)
            sketch = os.path.join(run_dir, "sketch")
            t0 = time.perf_counter()
            final = run_kmv_stream(spark, landing, sketch, schema)
            wall = time.perf_counter() - t0
            n_state = final.count()
            rows.append((s, b, round(wall, 2), round(wall / b, 3),
                         n_state))
            print(f"  sources={s} batches={b}: total {wall:.1f}s, "
                  f"per-batch {wall / b:.2f}s, state {n_state} rows",
                  file=sys.stderr)
        cal.append(pyloop())

    print()
    print("## Streaming KMV fold: batches × sources cost curve "
          "(r12 verdict task 8)")
    print()
    print("`run_kmv_stream` drains B one-file micro-batches; per-batch")
    print("cost = total drain wall / B.  The persisted state is bounded")
    print("at sources × K rows regardless of batches ingested, so")
    print("per-batch cost must stay flat as the cumulative corpus grows")
    print("with B (each batch carries disjoint new hashes).")
    print()
    print(f"Host pyloop stamps: {cal}.  {DOCS_PER_BATCH} docs × "
          f"{TOKENS_PER_DOC} tokens per batch.")
    print()
    print("| sources | batches | total | per-batch | state rows |")
    print("|---|---|---|---|---|")
    for s, b, wall, per, n in rows:
        print(f"| {s} | {b} | {wall:.1f}s | {per:.2f}s | {n} |")


if __name__ == "__main__":
    main()
