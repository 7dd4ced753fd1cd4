#!/usr/bin/env python
"""×4→×32 scale curve for the round-14 mixing/selection family
(r14 verdict task 7): DoReMi multiplicative-weights mixture,
RHO-LOSS reducible-holdout selection, SoftDeDup duplication-aware
reweighting.

All three are aggregate-shaped — domain- or doc-grain state, no
candidate-generating joins — so their cost should be linear in the
corpus axis; this tool measures it rather than asserting it, the same
way the candidate-join families earned their rows in SCALE_CURVE.md.
Measuring also locks in the round-14 eager-checkpoint fix for the
DoReMi rounds loop (the lazy variant re-derived each union branch —
24 s → 3.9 s at sf0.001; a regression would bend this curve, and the
plan-shape pin in tests/test_doremi.py would catch it first).

Docs-only scaled corpora with DISJOINT per-copy vocabularies (the
tools/scale_curve.py recipe — verbatim replication would hand
SoftDeDup's LSH stage artificial cross-copy duplicate clusters and
say nothing about real corpora).

Timing-sensitive: run on a quiet host, nothing else on the box.

Usage: python tools/mixing_curve.py   # prints a markdown section
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/mixing_curve"
STATIC_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "events", "embeddings", "orders", "lineitem"]
FACTORS = [4, 8, 16, 32]
QUERIES = [
    ("doremi_mixture_weights", "domain-grain multiplicative rounds"),
    ("rho_loss_select", "per-doc uni/bi-gram loss gap + top-N window"),
    ("softdedup_weights", "LSH clusters -> per-doc weight fold"),
]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def build_docs_only(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{factor}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for t in STATIC_TABLES:
        os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [docs]
    for c in range(1, factor):
        parts.append(docs.select(
            (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"c{c}$1").alias("text"),
            *[col for col in docs.columns
              if col not in ("doc_id", "text")],
        ))
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("mixing-curve")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    dirs = {f: build_docs_only(spark, f) for f in FACTORS}
    for name, _why in QUERIES:   # JIT warmup at the smallest factor
        materialize(qmap[name](spark, dirs[FACTORS[0]]))

    # Every trial is COLD-cache: these queries persist_once their
    # corpus-scan relations, so clearing only once per cell would make
    # min-of-2 cells measure a warm second run while 1-trial cells pay
    # the cold scan — a protocol cliff that fakes a superlinear jump
    # (observed: doremi 1.3s@x8-warm vs 16s@x16-cold before this fix).
    times: dict[str, dict[int, float]] = {}
    for f in FACTORS:
        for name, _why in QUERIES:
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(qmap[name](spark, dirs[f]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.setdefault(name, {})[f] = round(best, 3)
            print(f"  x{f} {name}: {best:.3f}s", file=sys.stderr)
        cal.append(pyloop())

    lo, hi = FACTORS[0], FACTORS[-1]
    print("### Mixing/selection family ×4→×32 (r14 verdict task 7)")
    print()
    print("Docs-only scaled corpora (disjoint per-copy vocabularies);")
    print("min-of-trials per cell; exponents over the work-dominated")
    print("×4→×32 regime.  Host pyloop stamps around the cells: "
          f"{cal}.")
    print()
    print("| operator | " + " | ".join(f"×{f}" for f in FACTORS)
          + " | exponent ×4→×32 | shape |")
    print("|---|" + "---|" * (len(FACTORS) + 2))
    for name, why in QUERIES:
        row = times[name]
        expo = math.log(row[hi] / row[lo]) / math.log(hi / lo)
        cells = " | ".join(f"{row[f]:.2f}s" for f in FACTORS)
        print(f"| {name} | {cells} | {expo:+.2f} | {why} |")


if __name__ == "__main__":
    main()
