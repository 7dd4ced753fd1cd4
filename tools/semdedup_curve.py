#!/usr/bin/env python
"""SemDeDup candidate-volume curve with K ∝ n (r14 verdict task 2's
scale evidence, done against a corpus that actually grows).

The committed `tools/scale_curve.py` row for `semdedup` symlinks the
STATIC embeddings table into every scaled directory, so its cells all
read the same 2 000 vectors — it measures overhead, not shape.  This
tool scales the embeddings themselves (copy c: vec_id + c·10⁷, which
preserves the %5 dup-injection sites, and a cyclic dim-rotation by c
so copies occupy distinct directions), and measures the within-cell
candidate-pair volume Σ_cells C(m_c, 2) two ways:

- **K ∝ n** (the SemDeDup paper's operating point — 50k clusters for
  LAION): pairs should grow ~linearly in n;
- **K fixed** (the naive composition): pairs grow ~n²/K — the
  quadratic trap the paper exists to avoid.

The pair volume is computed from assignment counts (one aggregation),
not by materializing the join — the number IS the candidate-join's
output cardinality, measured exactly.

Timing-sensitive only for the wall column; the pair counts are exact
regardless of host noise.

Usage: python tools/semdedup_curve.py   # prints a markdown section
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/embeddings.parquet"
FACTORS = [4, 8, 16, 32]
K0 = 8
DIM = 64


def main() -> None:
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("semdedup-curve")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(BASE).select("vec_id", "embedding")

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

    def pair_volume(emb, k: int) -> tuple[int, int]:
        _, cents = kmeans_fit(emb, k, 2, dim=DIM)
        sizes = (
            assign_clusters(emb, cents, dim=DIM)
            .groupBy("cluster").agg(F.count(F.lit(1)).alias("m"))
        )
        row = sizes.agg(
            F.sum(F.expr("m * (m - 1) div 2")).alias("pairs"),
            F.max("m").alias("mmax"),
        ).first()
        return int(row["pairs"]), int(row["mmax"])

    rows = []
    for f in FACTORS:
        emb = scaled(f)
        n = emb.count()
        t0 = time.perf_counter()
        p_scaled, mmax = pair_volume(emb, K0 * f)
        wall = round(time.perf_counter() - t0, 2)
        p_fixed, _ = pair_volume(emb, K0)
        rows.append((f, n, K0 * f, p_scaled, mmax, wall, p_fixed))
        print(f"  x{f}: n={n} K={K0 * f} pairs={p_scaled} "
              f"fixedK_pairs={p_fixed}", file=sys.stderr)
        emb.unpersist()

    lo, hi = rows[0], rows[-1]
    e_scaled = math.log(hi[3] / lo[3]) / math.log(hi[1] / lo[1])
    e_fixed = math.log(hi[6] / lo[6]) / math.log(hi[1] / lo[1])
    print("### SemDeDup candidate volume ×4→×32, K∝n vs K fixed (r15)")
    print()
    print("Scaled embeddings (dim-rotated copies, dup sites preserved);")
    print("pair volume = Σ_cells C(m_c, 2) from assignment counts —")
    print("exactly the candidate join's output cardinality.")
    print()
    print("| factor | vectors | K | pairs (K∝n) | max cell | wall "
          "| pairs (K=8 fixed) |")
    print("|---|---|---|---|---|---|---|")
    for f, n, k, p, mmax, wall, pf in rows:
        print(f"| ×{f} | {n} | {k} | {p} | {mmax} | {wall}s | {pf} |")
    print()
    print(f"Exponent in n: **{e_scaled:+.2f} with K∝n** vs "
          f"**{e_fixed:+.2f} with K fixed** — cluster-count scaling is "
          "what keeps SemDeDup subquadratic; the repo's fixture query "
          "pins correctness at K=8 while this curve pins the scale "
          "path.")


if __name__ == "__main__":
    main()
