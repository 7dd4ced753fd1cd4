#!/usr/bin/env python
"""Min-of-N isolated timing of named queries (bench.py protocol:
clearCache + one untimed rebuild + min of N noop-sink runs).

Usage: python tools/r16_time.py q1 [q2 ...] [--sf DIR] [--n N]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    n = 3
    if "--sf" in args:
        i = args.index("--sf"); sf_dir = args[i + 1]; del args[i:i + 2]
    if "--n" in args:
        i = args.index("--n"); n = int(args[i + 1]); del args[i:i + 2]

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark(app_name="r16-time")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    for name in args:
        def run():
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        run()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{name:34s} min {min(ts):.3f}  all {ts}", flush=True)


if __name__ == "__main__":
    main()
