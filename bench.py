#!/usr/bin/env python
"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed as full materialization through the ``noop`` sink:
every output column is computed and serialized (a bare ``count()`` lets
Catalyst prune aggregate expressions the count doesn't need, which
under-times wide queries).  JVM startup and parquet-footer warmup are
excluded by timing per-query after a warmup pass over table metadata.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _host_calibration() -> float:
    """Single-core Python-loop seconds — a fixed workload whose runtime
    varies ±30% with invisible host-level contention on this box (zero
    guest-visible steal).  Recorded so per-round bench numbers can be
    read against the host speed they were measured at."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _git_head() -> str | None:
    """Commit hash the bench measured (None outside a git checkout —
    the record is still valid, just unstamped)."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10, check=True,
        ).stdout.strip() or None
    except Exception:
        return None


def main() -> None:
    from star_schema_etl_airflow_spark import registry
    from star_schema_etl_airflow_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up: touch every fixture table once so parquet footer reads
    # don't land in the first query's timing.
    from star_schema_etl_airflow_spark.sources.fixtures import TABLES, load_table
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()

    headline = [s for s in registry.specs() if s.headline]

    # JIT/codegen warmup: run every headline query once at the smallest
    # fixture scale, so timings below measure steady-state execution, not
    # whole-stage-codegen compilation of whichever query happens to run
    # first.  (Cluster benchmarking practice: discard the first run.)
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for spec in headline:
        materialize(spec.fn(spark, warm_dir))

    # Best-of-4 per query: single-shot timings on this box show rare but
    # large stalls (5-9 s on a ~2 s query, ~1 pass in 6 — host-level
    # scheduling jitter invisible to /proc/stat steal).  The min of the
    # interleaved steady-state passes is the stable estimator.  Each pass
    # ROTATES the query order (pass i starts i/n of the way through the
    # list): contention windows on this host last tens of seconds, long
    # enough to cover one whole pass, so a fixed order can land the SAME
    # query inside the window on every pass (observed: a 2 s query
    # recording 4.9 s as its min-of-3) — rotation decorrelates a query's
    # position from wall-clock across passes, deterministically.
    cal = [_host_calibration()]
    timings: dict[str, float] = {}
    n_passes = 4
    for p in range(n_passes):
        off = (p * len(headline)) // n_passes
        for spec in headline[off:] + headline[:off]:
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            if spec.name not in timings or dt < timings[spec.name]:
                timings[spec.name] = dt
        # one sample per pass: contention windows on this host last tens
        # of seconds (≈ one pass), so edge-only samples can miss a
        # mid-run window entirely — tools/bench_drift.py normalizes
        # cross-round comparisons by the mean of these.
        cal.append(_host_calibration())

    # Order-independent re-measure (r9 verdict task 3): queries listed
    # here share lazily-built persisted relations (the dedup corpus /
    # span caches) with other headline queries, so their in-rotation
    # figure depends on WHICH query of the family happens to pay the
    # shared cache build first (observed 1.5-5.7s for the same code).
    # Re-measure them after the passes with the session cache cleared:
    # one untimed run rebuilds exactly the query's own caches, then
    # min-of-3 steady-state replaces the rotation figure.  This runs
    # LAST so the clearCache cannot perturb any other query's timing.
    ISOLATED = ("dedup_prefix_join",)
    # r12 verdict task 7: rotation-order contention can dominate a
    # recorded figure (dedup_prefix_join: rotation 9.57s vs isolated
    # 1.56s in BENCH_r12.json).  Rule: any rotation figure above
    # ISOLATE_CANDIDATE_SEC gets an isolated audit, and the isolated
    # figure is PROMOTED to the committed record when rotation/isolated
    # exceeds ISOLATE_RATIO — so the drift gate compares like with
    # like.  Both figures always land in isolated_protocol for audit.
    ISOLATE_CANDIDATE_SEC = 2.0
    ISOLATE_RATIO = 3.0
    by_name = {s.name: s for s in headline}

    def isolated_measure(spec) -> float:
        """Cache-isolated min-of-3 steady state: clear the session
        cache, one untimed run rebuilds exactly this query's own
        persisted relations, then time."""
        spark.catalog.clearCache()
        materialize(spec.fn(spark, SF_DIR))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None or dt < best else best
        cal.append(_host_calibration())
        return best

    # both protocols recorded (ADVICE r10): the rotation figure stays
    # visible so headline_total's protocol change (r10) is auditable in
    # the JSON itself, not only in BENCH_HISTORY.md.
    isolated_protocol: dict[str, dict[str, float]] = {}
    audit = [
        s.name for s in headline
        if s.name not in ISOLATED
        and timings[s.name] > ISOLATE_CANDIDATE_SEC
    ]
    for name in [n for n in ISOLATED if n in by_name] + audit:
        rotation = timings[name]
        iso = isolated_measure(by_name[name])
        promoted = name in ISOLATED or rotation / iso > ISOLATE_RATIO
        if promoted:
            timings[name] = iso
        isolated_protocol[name] = {
            "rotation": rotation, "isolated": iso,
            "promoted": promoted,
        }

    # NON-GATING extras (r10 verdict task 1): the multimodal dedup
    # family + the incremental MinHash probe get per-round figures with
    # the same cache-isolation protocol, but are kept OUT of the
    # headline set and its total so the drift gate's shared baseline
    # stays stable; tools/bench_drift.py prints (never gates) their
    # round-over-round movement.
    EXTRAS = (
        # r10 trio — promoted to GATING in tools/bench_drift.py (r11
        # verdict task 3: two committed quiet records exist)
        "image_dedup_dhash",
        "audio_dedup_fingerprint",
        "dedup_incremental_minhash",
        # r11 trio — non-gating until they have two quiet records
        "doc_winnow_overlap",
        "image_knn_dhash",
        "curation_multimodal_clusters",
        # r12 trio — non-gating until they have two quiet records
        "retrieval_rrf",
        "kmv_source_overlap",
        "zorder_skip_stats",
        # r13 trio — promoted to GATING in tools/bench_drift.py (r13
        # verdict task 2: two committed quiet records exist)
        "embed_ivfpq_rerank",
        "hard_negatives",
        "curriculum_order",
        # r14 pair — non-gating until they have two quiet records.
        # bpe_encode_census is deliberately NOT an extra: it re-trains
        # the tokenizer (20 driver-loop rounds at sf0.1) on every call,
        # so min-of-3 benching would spend ~2 min re-measuring training
        # rounds the 3-SF correctness record already gauges.
        "embed_ivfpq_opq",
        "dedup_clusters_bigstar",
        # r16 — non-gating until two quiet records; the OPH signature's
        # claimed speedup over the K-rehash headline entry
        # (dedup_minhash_lsh) is read off these two figures directly.
        "dedup_minhash_oph",
    )
    # One-time artifact figures (r14 verdict task 3): the trained coarse
    # quantizer is frozen per (session, sf) — plans/ivfpq.py
    # frozen_artifact — so IVFADC extras measure index+search against a
    # frozen quantizer, not train+index+search conflated.  Build it HERE,
    # timed separately, so the cost is on record as the one-time figure
    # it is in a production index lifecycle.
    from star_schema_etl_airflow_spark.plans.ivfpq import _trained_cells
    t0 = time.perf_counter()
    _trained_cells(spark, SF_DIR).count()
    one_time = {"ivfpq_train": round(time.perf_counter() - t0, 3)}

    all_specs = {s.name: s for s in registry.specs()}
    extras: dict[str, float] = {}
    for name in EXTRAS:
        spec = all_specs.get(name)
        if spec is None:
            continue
        materialize(spec.fn(spark, warm_dir))  # codegen warmup
        extras[name] = isolated_measure(spec)

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        # one sample before the run + one after each pass: observed
        # host speed varies 0.6-1.5s on this fixed workload across
        # minutes, which dominates round-to-round bench deltas —
        # tools/bench_drift.py normalizes by the mean of these.
        "host_pyloop_sec": cal,
        # the commit this record MEASURED — records are committed at
        # different points within a round, so the drift gate's
        # multi-record adjudication prints each min's provenance and
        # this stamp keeps "same code" auditable rather than assumed
        "commit": _git_head(),
        # audit trail for the r10 protocol change: queries re-measured
        # under cache isolation keep their in-rotation figure here
        "isolated_protocol": isolated_protocol,
        # non-gating: cache-isolated figures outside headline_total
        "extras": extras,
        # one-time artifact builds (train cost), excluded from every
        # per-query figure by the frozen-artifact cache
        "one_time": one_time,
    }
    print(json.dumps(record))
    # --write BENCH_QUIET_r{N}.json: commit a quiet-host companion
    # record as the round's LAST act (round-8 verdict task 7) — the
    # drift gate prefers it over the driver's end-of-round record,
    # whose host conditions three rounds of history show are not
    # controllable.
    if "--write" in sys.argv:
        out = sys.argv[sys.argv.index("--write") + 1]
        with open(out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
