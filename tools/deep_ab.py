#!/usr/bin/env python
"""Ad-hoc A/B: one deep-curve cell under the current session config.

Usage: python tools/deep_ab.py <factor> [query ...]
Runs each query once cold (JIT) + best-of-2 against the prebuilt
/tmp/scale_curve/deep_x<factor> corpus and prints the times — used to
qualify the AQE initialPartitionNum change against the committed deep
curve cells (same measurement protocol as scale_curve.deep_main).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    factor = int(sys.argv[1])
    names = sys.argv[2:] or ["dedup_prefix_join", "curation_pipeline_v5"]
    sf_dir = f"/tmp/scale_curve/deep_x{factor}"
    spark = get_spark("deep-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    print("initialPartitionNum =", spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "unset"))

    # JIT warmup at ×4 (the deep_main protocol)
    for n in names:
        qmap[n](spark, "/tmp/scale_curve/deep_x4").write.format(
            "noop").mode("overwrite").save()

    for n in names:
        spark.catalog.clearCache()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qmap[n](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  trial x{factor} {n}: {dt:.3f}s", flush=True)
        print(f"x{factor} {n}: best {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
