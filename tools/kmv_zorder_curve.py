#!/usr/bin/env python
"""×4→×32 scale cells for the round-12 additions: the KMV overlap
sketch (both of its growth axes) and the Z-order skipping audit.

KMV has TWO independent axes, and they fail differently:

- **corpus axis** (docs grow, source count fixed): the sketch build is
  the only corpus-sized stage, so wall should track the scan (~1.0);
  the pairwise stage reads 20·K sketch rows at every factor — flat.
- **source axis** (docs AND sources grow ×f): the pair stage's OUTPUT
  is Θ(S²·K) by definition (every pair gets a row) — the thing to
  verify is that cost tracks that unavoidable output width and the
  candidate row count stays exactly 2·pairs·K-ish, i.e. no hidden
  blowup beyond the answer size.  (At 10k+ sources a deployment caps
  pairs by pre-filtering on sketch-minimum overlap; the census below
  is what makes that decision measurable.)

Z-order audit: one scan + a 128-group aggregate — included to pin the
"obviously linear" claim with a number rather than an adjective.

Usage: python tools/kmv_zorder_curve.py >> SCALE_CURVE.md
(stderr shows progress; stdout is the markdown block)
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = "/tmp/scale_curve"
BASE = "/root/testdata/sf0.1"
FACTORS = [4, 8, 16, 32]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def build_srcgrow(spark, factor: int) -> str:
    """Documents ×factor with PER-COPY sources (src<j>_c<c>) and
    disjoint per-copy vocabularies: the source axis — S = 20·factor."""
    from pyspark.sql import functions as F

    out = f"{WORK}/kmv_src_x{factor}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for c in range(factor):
        p = docs.select(
            (F.col("doc_id") + c * 10_000_000).alias("doc_id"),
            (F.regexp_replace("text", r"(\S+)", f"c{c}$1") if c else
             F.col("text")).alias("text"),
            F.concat(F.col("source"), F.lit(f"_c{c}")).alias("source"),
            *[col for col in docs.columns
              if col not in ("doc_id", "text", "source")],
        )
        parts.append(p)
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.parquet(f"{out}/documents.parquet")
    return out


def build_lineitem(spark, factor: int) -> str:
    """lineitem ×factor (rows replicated verbatim — the audit's stats
    and pruning are distribution-level, so identical copies are the
    honest pure-volume axis)."""
    out = f"{WORK}/zli_x{factor}"
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    d = li
    for _ in range(factor - 1):
        d = d.unionByName(li)
    d.write.parquet(f"{out}/lineitem.parquet")
    return out


def main() -> None:
    from incremental_curve import build_docs_only

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("kmv-zorder-curve")
    spark.sparkContext.setLogLevel("ERROR")
    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    qmap = registry.queries()
    kmv = qmap["kmv_source_overlap"]
    zorder = qmap["zorder_skip_stats"]

    corpus_dirs = {f: build_docs_only(spark, f) for f in FACTORS}
    src_dirs = {f: build_srcgrow(spark, f) for f in FACTORS}
    li_dirs = {f: build_lineitem(spark, f) for f in FACTORS}

    # warmup at the smallest factor
    materialize(kmv(spark, corpus_dirs[4]))
    materialize(zorder(spark, li_dirs[4]))

    cells: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for f in FACTORS:
        # COLD min-of-3 (clearCache each trial) — kmv persists its
        # sketch, so warm cells would measure only the tiny pair stage
        for label, fn, d in (
            ("kmv corpus axis", kmv, corpus_dirs[f]),
            ("kmv source axis", kmv, src_dirs[f]),
            ("zorder audit", zorder, li_dirs[f]),
        ):
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(fn(spark, d))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            cells.setdefault(label, {})[f] = round(best, 3)
            print(f"  x{f} {label}: {best:.3f}s", file=sys.stderr)
        # candidate-width axis for the source case (untimed)
        spark.catalog.clearCache()
        from star_schema_etl_airflow_spark.plans.kmv_overlap import (
            kmv_sketches, persist_once,
        )
        from pyspark.sql import functions as F
        docs = spark.read.parquet(
            f"{src_dirs[f]}/documents.parquet").select("source", "text")
        sig = persist_once(kmv_sketches(spark, docs))
        n_src = sig.select("source").distinct().count()
        n_pairs = n_src * (n_src - 1) // 2
        counts.setdefault("sources", {})[f] = n_src
        counts.setdefault("pairs (output rows)", {})[f] = n_pairs
        counts.setdefault("sketch rows", {})[f] = sig.count()
        print(f"  x{f} sources={n_src} pairs={n_pairs}", file=sys.stderr)
        cal.append(pyloop())

    lo, hi = FACTORS[0], FACTORS[-1]
    print()
    print("## KMV overlap + Z-order audit curves (round 12)")
    print()
    print(f"Host pyloop stamps around the cells: {cal}.  Protocol: "
          "COLD cells, min-of-3 with clearCache per trial (the sketch "
          "is persisted in-query; see tools/kmv_zorder_curve.py).")
    print()
    header = "| measure | " + " | ".join(f"×{f}" for f in FACTORS) \
        + f" | exponent ×{lo}→×{hi} |"
    print(header)
    print("|---|" + "---|" * (len(FACTORS) + 1))
    for label, row in cells.items():
        ex = math.log(row[hi] / row[lo]) / math.log(hi / lo)
        print(f"| {label} | "
              + " | ".join(f"{row[f]:.2f}s" for f in FACTORS)
              + f" | {ex:.2f} |")
    for label, row in counts.items():
        ex = math.log(max(row[hi], 1) / max(row[lo], 1)) \
            / math.log(hi / lo)
        print(f"| {label} (count) | "
              + " | ".join(str(row[f]) for f in FACTORS)
              + f" | {ex:.2f} |")


if __name__ == "__main__":
    main()
