#!/usr/bin/env python
"""Stage-level decomposition of one deep-curve cell.

Usage: python tools/deep_profile.py <factor> <query> [initial_partitions]

Runs the query once cold against /tmp/scale_curve/deep_x<factor> with
the Spark event log enabled, then parses SparkListenerStageCompleted
events and prints every stage's task time, GC time, spill and shuffle
volumes — the evidence base for the ×8→×16 superlinearity
investigation (SCALE_CURVE.md deep curve).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/deep_profile_events"


def main() -> None:
    factor = int(sys.argv[1])
    name = sys.argv[2]
    initial = sys.argv[3] if len(sys.argv) > 3 else None

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
    }
    if initial:
        extra["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] \
            = initial
    spark = get_spark("deep-profile", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    qmap = registry.queries()
    sf_dir = f"/tmp/scale_curve/deep_x{factor}"

    t0 = time.perf_counter()
    qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"wall {wall:.1f}s", flush=True)

    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    rows = []
    for path in glob.glob(f"{EVDIR}/*"):
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                acc = {a["Name"]: a.get("Value", 0)
                       for a in si.get("Accumulables", [])}

                def g(key):
                    v = acc.get(key, 0)
                    return int(v) if str(v).lstrip("-").isdigit() else 0

                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                rows.append((
                    si["Stage ID"],
                    (com - sub) / 1000.0 if sub and com else 0.0,
                    si.get("Number of Tasks", 0),
                    g("internal.metrics.executorRunTime") / 1000.0,
                    g("internal.metrics.jvmGCTime") / 1000.0,
                    g("internal.metrics.memoryBytesSpilled") / 2**20,
                    g("internal.metrics.diskBytesSpilled") / 2**20,
                    g("internal.metrics.shuffle.read.remoteBytesRead")
                    / 2**20
                    + g("internal.metrics.shuffle.read.localBytesRead")
                    / 2**20,
                    g("internal.metrics.shuffle.write.bytesWritten") / 2**20,
                    str(si.get("Stage Name", ""))[:60],
                ))
    rows.sort(key=lambda r: -r[3])
    print(f"{'id':>4} {'wall_s':>7} {'tasks':>5} {'run_s':>8} {'gc_s':>7} "
          f"{'memSpill':>9} {'dskSpill':>9} {'shRd':>8} {'shWr':>8}  name")
    for r in rows[:18]:
        print(f"{r[0]:>4} {r[1]:>7.1f} {r[2]:>5} {r[3]:>8.1f} {r[4]:>7.1f} "
              f"{r[5]:>8.0f}M {r[6]:>8.0f}M {r[7]:>7.0f}M {r[8]:>7.0f}M"
              f"  {r[9]}")
    tot_run = sum(r[3] for r in rows)
    tot_gc = sum(r[4] for r in rows)
    print(f"total executor run {tot_run:.0f}s, gc {tot_gc:.0f}s "
          f"({100 * tot_gc / max(tot_run, 0.001):.0f}%), "
          f"spill mem {sum(r[5] for r in rows):.0f}M "
          f"disk {sum(r[6] for r in rows):.0f}M")


if __name__ == "__main__":
    main()
