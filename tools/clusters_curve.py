#!/usr/bin/env python
"""×4→×32 scale cells for ``curation_multimodal_clusters`` (round 11).

Closure is the one operator class in the repo whose cost is not a
fixed pipeline of joins — it iterates label propagation until
fixpoint — so its scale evidence needs its own cells: per-round
shuffles are proportional to the MATCH GRAPH, and the round count is
the cluster diameter (bounded by the fixture's 2-hop asset links, not
the corpus).  Uses the shared docs-only deep corpora
(``/tmp/scale_curve/deep_x{f}``; disjoint per-copy vocabularies, so
text edges stay within copies while the doc_id-derived asset keys
repeat across copies — cluster sizes grow with the factor but stay
bounded by it).

Usage: python tools/clusters_curve.py >> SCALE_CURVE.md
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/scale_curve"
FACTORS = [4, 8, 16, 32]


def pyloop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from incremental_curve import build_docs_only

    from star_schema_etl_airflow_spark.plans.curation_clusters import (
        curation_multimodal_clusters,
    )
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark("clusters-curve")
    spark.sparkContext.setLogLevel("ERROR")
    cal = [pyloop()]

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    dirs = {f: build_docs_only(spark, f) for f in FACTORS}
    materialize(curation_multimodal_clusters(spark, dirs[4]))  # JIT warmup

    times: dict[int, float] = {}
    for f in FACTORS:
        trials = 2 if f <= 8 else 1
        spark.catalog.clearCache()
        best = None
        for _ in range(trials):
            t0 = time.perf_counter()
            materialize(curation_multimodal_clusters(spark, dirs[f]))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        times[f] = round(best, 3)
        cal.append(pyloop())
        print(f"  clusters x{f}: {times[f]}s", file=sys.stderr)

    lo, hi = FACTORS[0], FACTORS[-1]
    ex = math.log(times[hi] / times[lo]) / math.log(hi / lo)
    print()
    print("## Cross-modal closure curve (curation_multimodal_clusters, "
          "round 11)")
    print()
    print(f"Host pyloop stamps: {cal}.")
    print()
    print("| factor | " + " | ".join(f"×{f}" for f in FACTORS) + " |")
    print("|---|" + "---|" * len(FACTORS))
    print("| wall | " + " | ".join(f"{times[f]:.2f}s" for f in FACTORS)
          + " |")
    print()
    print(f"Exponent ×{lo}→×{hi}: {ex:.2f}.  The operator is three "
          "banded/grouped edge builders plus a label-propagation loop "
          "whose per-round shuffle carries the match graph only; the "
          "round count is the cluster diameter (fixture: ≤ ~4 via the "
          "2-hop asset links), independent of corpus size — so the "
          "expected shape is ~linear in the corpus with a fixed round "
          "multiplier.")


if __name__ == "__main__":
    main()
