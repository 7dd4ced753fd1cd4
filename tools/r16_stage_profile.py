#!/usr/bin/env python
"""Per-stage decomposition of one query at an arbitrary sf_dir.

Usage: python tools/r16_stage_profile.py <query> [sf_dir]

Runs the query twice (warmup + timed) with the Spark event log on and
prints every stage of the timed run: task time, GC, shuffle bytes,
python boundary time — the guide-§1/§7 evidence for this round.
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

EVDIR = "/tmp/r16_profile_events"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR)
    spark = get_spark("r16-profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")

    qmap = registry.queries()

    def run():
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warmup (codegen, shared caches)
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    mark = time.time() * 1000
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"timed-run wall {wall:.3f}s  (stages below are the timed run only)")

    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    rows = []
    for path in glob.glob(f"{EVDIR}/**", recursive=True):
        if not os.path.isfile(path) or "appstatus" in path:
            continue
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                if si.get("Submission Time", 0) < mark:
                    continue
                acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}
                rows.append((
                    si["Stage ID"],
                    (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0,
                    si.get("Number of Tasks", 0),
                    float(acc.get("internal.metrics.executorRunTime", 0) or 0) / 1000.0,
                    float(acc.get("internal.metrics.jvmGCTime", 0) or 0) / 1000.0,
                    int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0),
                    int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                    + int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0),
                    si.get("Stage Name", "")[:80],
                ))
    rows.sort(key=lambda r: -r[1])
    print(f"{'stage':>5} {'wall_s':>7} {'tasks':>5} {'taskT_s':>8} {'gc_s':>6} "
          f"{'shufW_MB':>9} {'shufR_MB':>9}  name")
    for r in rows[:25]:
        print(f"{r[0]:>5} {r[1]:>7.2f} {r[2]:>5} {r[3]:>8.2f} {r[4]:>6.2f} "
              f"{r[5]/1e6:>9.1f} {r[6]/1e6:>9.1f}  {r[7]}")
    print(f"total stages in timed run: {len(rows)}; "
          f"sum stage wall {sum(r[1] for r in rows):.2f}s")


if __name__ == "__main__":
    main()
