#!/usr/bin/env python
"""Streaming semantic-dedup probe: fold cost vs at-rest corpus size.

The claim to verify is the one the module docstring makes: per-batch
probe cost is governed by CELL OCCUPANCY, so growing the at-rest
corpus with the cluster count held fixed inflates every micro-batch
(occupancy ∝ n), while growing the cluster count with the corpus (the
SemDeDup operating point) keeps the per-batch fold flat.

Protocol: fixed 4-file delta landing; at-rest corpus scaled ×1..×8
(dim-rotated copies, the semdedup_curve recipe); one full
availableNow drain timed per cell, fresh state/checkpoint per trial,
min of 2 trials, K = K0 (fixed) vs K = K0·f (proportional).

Timing-sensitive: run on a quiet host.

Usage: python tools/semdedup_stream_curve.py   # markdown section
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/embeddings.parquet"
WORK = "/tmp/semdedup_stream_curve"
FACTORS = [1, 2, 4, 8]
K0 = 8
DIM = 64


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.functions.vecexpr import unrolled_dot
    from star_schema_etl_airflow_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import _EMB_DIM
    from star_schema_etl_airflow_spark.session import get_spark
    from star_schema_etl_airflow_spark.streaming.semdedup_stream import (
        run_semdedup_stream,
    )

    spark = get_spark("semdedup-stream-curve")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE).select("vec_id", "embedding")
    shutil.rmtree(WORK, ignore_errors=True)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    # fixed delta: 500 perturbed copies of base vectors, 4 files
    delta = base.filter(F.col("vec_id") % 4 == 0).limit(500).select(
        (F.col("vec_id") + 7_000_000).alias("vec_id"),
        F.expr(
            "concat(array(cast(embedding[0] + cast(0.0625 as float) as "
            "float)), slice(embedding, 2, size(embedding) - 1))"
        ).alias("embedding"),
    ).localCheckpoint()
    landing = f"{WORK}/landing"
    os.makedirs(landing)
    for b in range(4):
        stage = f"{WORK}/stage_{b}"
        # split on (vec_id div 4) % 4 — the delta ids are all ≡ 0 mod 4
        # by construction (base %4 filter + a 4-divisible offset), so a
        # plain %4 split would land EVERYTHING in batch 0 and the
        # "4-batch drain" would time one real fold (review finding r15)
        delta.filter(F.expr(f"(vec_id div 4) % 4 = {b}")) \
            .coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        os.rename(part, f"{landing}/batch_{b}.parquet")

    def scaled(f: int):
        parts = []
        for c in range(f):
            rot = F.expr(
                f"concat(slice(embedding, {c % DIM} + 1, {DIM} - {c % DIM}),"
                f" slice(embedding, 1, {c % DIM}))"
            )
            parts.append(base.select(
                (F.col("vec_id") + c * 10_000_000).alias("vec_id"),
                (rot if c else F.col("embedding")).alias("embedding"),
            ))
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        return d.localCheckpoint()

    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"

    def fold_time(at, k: int, tag: str) -> float:
        _, cb = kmeans_fit(at, k, 2, dim=_EMB_DIM)
        cb = cb.localCheckpoint()
        members = (
            at.join(assign_clusters(at, cb, dim=_EMB_DIM), "vec_id")
            .withColumn("__norm", F.expr(norm)).localCheckpoint()
        )
        best = None
        for t in range(2):
            run = f"{WORK}/run_{tag}_{t}"
            shutil.rmtree(run, ignore_errors=True)
            t0 = time.perf_counter()
            run_semdedup_stream(
                spark, landing, f"{run}/state", schema, cb, members,
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    rows = []
    for f in FACTORS:
        at = scaled(f)
        n = at.count()
        t_prop = fold_time(at, K0 * f, f"p{f}")
        t_fixed = fold_time(at, K0, f"f{f}")
        rows.append((f, n, t_prop, t_fixed))
        print(f"  x{f}: n={n} K∝n {t_prop}s / K fixed {t_fixed}s",
              file=sys.stderr)
        at.unpersist()

    print("### Streaming semantic-dedup probe: fold cost vs at-rest size "
          "(r15)")
    print()
    print("Fixed 4-batch delta drain; at-rest corpus scaled; min-of-2, "
          "fresh state per trial.")
    print()
    print("| at-rest | vectors | drain, K∝n | drain, K=8 fixed |")
    print("|---|---|---|---|")
    for f, n, tp, tf in rows:
        print(f"| ×{f} | {n} | {tp}s | {tf}s |")


if __name__ == "__main__":
    main()
