#!/usr/bin/env python
"""×4→×32 scale cells for the round-13 embedding operators:
``embed_ivfpq_topk``, ``embed_ivfpq_rerank``, ``hard_negatives``.

IVFADC's whole scale claim is that the scored set is the PROBED-CELL
fraction of the corpus (≈ NPROBE/NCELLS per query), so the ADC join's
input must grow LINEARLY in corpus size with slope queries×nprobe/
ncells — never corpus×queries.  The count axis measures that relation
directly (the r11 lesson: a wall-clock exponent alone can hide a
quadratic under a small constant); the wall axis covers the whole
pipeline (encode is the linear ``add()`` pass, search is the bounded
scoring).  ``hard_negatives`` rides along: it is the broadcast-anchor
scan family (same shape as ``embed_topk_cosine``) and must be flat-
slope linear.

Corpora: deterministic md5-derived 64-dim vectors in [-0.5, 0.5]
(inside the fixed-point headroom contract of ``plans/pq.py``), labels
``vec_id % 10`` — written once per factor to
``/tmp/ivfpq_curve/x{f}/embeddings.parquet`` so the operators load them
through the normal ``(spark, sf_dir)`` contract.

Usage: python tools/ivfpq_curve.py >> SCALE_CURVE.md
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/ivfpq_curve"
BASE_N = 500          # fixture-sized at ×1
FACTORS = [4, 8, 16, 32]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def build_corpus(spark, factor: int) -> str:
    out = f"{WORK}/x{factor}"
    path = f"{out}/embeddings.parquet"
    if os.path.isdir(path):
        return out
    from pyspark.sql import functions as F

    n = BASE_N * factor
    coord = (
        "transform(sequence(0, 63), i -> "
        "cast(cast(conv(substring(md5(concat('v', cast(id as string), ':', "
        "cast(i as string))), 1, 15), 16, 10) as bigint) % 1000001 "
        "as double) / 1000000.0d - 0.5d)"
    )
    (
        spark.range(n)
        .select(
            F.col("id").cast("long").alias("vec_id"),
            F.expr(coord).alias("embedding"),
            (F.col("id") % 10).cast("int").alias("label"),
        )
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    )
    return out


def main() -> None:
    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("ivfpq-curve")
    spark.sparkContext.setLogLevel("ERROR")
    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    qmap = registry.queries()
    names = ["embed_ivfpq_topk", "embed_ivfpq_rerank", "hard_negatives"]
    dirs = {f: build_corpus(spark, f) for f in FACTORS}

    for name in names:  # JIT warmup at the smallest factor
        materialize(qmap[name](spark, dirs[4]))

    times: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for f in FACTORS:
        for name in names:
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(qmap[name](spark, dirs[f]))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times.setdefault(name, {})[f] = round(best, 3)
            print(f"  x{f} {name}: {best:.3f}s", file=sys.stderr)
        # count axis: the ADC join's output (scored candidate rows) —
        # must be ≈ corpus × queries × NPROBE/NCELLS, slope-linear
        from star_schema_etl_airflow_spark.plans.ivfpq import _adc_scores

        spark.catalog.clearCache()
        counts.setdefault("adc_scored_rows", {})[f] = \
            _adc_scores(spark, dirs[f])[0].count()
        print(f"  x{f} adc rows: {counts['adc_scored_rows'][f]}",
              file=sys.stderr)
        cal.append(pyloop())

    lo, hi = FACTORS[0], FACTORS[-1]
    print()
    print("## IVFADC + contrastive-mining curves (round 13)")
    print()
    print(f"Host pyloop stamps around the cells: {cal}.  Protocol: COLD "
          "cells, min-of-3 with clearCache per trial.")
    print()
    header = "| operator | " + " | ".join(f"×{f}" for f in FACTORS) \
        + f" | exponent ×{lo}→×{hi} |"
    print(header)
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for name in names:
        row = times[name]
        ex = math.log(row[hi] / row[lo]) / math.log(hi / lo)
        cells = " | ".join(f"{row[f]:.2f}s" for f in FACTORS)
        print(f"| {name} | {cells} | {ex:.2f} |")
    for name, row in counts.items():
        ex = math.log(max(row[hi], 1) / max(row[lo], 1)) / math.log(hi / lo)
        cells = " | ".join(f"{row[f]}" for f in FACTORS)
        print(f"| {name} (count) | {cells} | {ex:.2f} |")


if __name__ == "__main__":
    main()
