#!/usr/bin/env python
"""Per-query bench drift gate (round-5 verdict task 4).

Compares a bench record against the previous round's committed
``BENCH_r*.json`` at the same sf and flags any headline query whose
time moved more than ``THRESHOLD`` (default ±30%).  Regressions are
hard failures (exit 1) unless acknowledged in ``ACKED`` with a
committed explanation; large improvements print a notice (they usually
mean a plan change worth recording in PLANS.md, or a measurement shift
that will read as a "regression" next round).

Usage:
    python tools/bench_drift.py                    # latest vs previous round
    python tools/bench_drift.py local_bench.json   # a fresh local run vs latest
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 0.30

# query -> reason; entries let an *explained* regression pass the gate.
ACKED: dict[str, str] = {}


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    parsed = data.get("parsed") or (data if "queries" in data else {})
    if not parsed.get("queries"):
        raise SystemExit(f"{path}: no parsed queries")
    return parsed


def rounds() -> list[str]:
    return sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )


def drift(base: dict, new: dict, base_name: str, new_name: str) -> int:
    if base.get("sf") != new.get("sf"):
        raise SystemExit(
            f"sf mismatch: {base_name} sf={base.get('sf')} "
            f"vs {new_name} sf={new.get('sf')}"
        )
    bad = 0
    shared = set(base["queries"]) & set(new["queries"])
    added = set(new["queries"]) - set(base["queries"])
    removed = set(base["queries"]) - set(new["queries"])
    for q in sorted(added):
        print(f"new  {q}: {new['queries'][q]:.3f} "
              "(baseline established this round)")
    for q in sorted(removed):
        print(f"gone {q}: was {base['queries'][q]:.3f} "
              "(dropped from headline set — explain in BENCH_HISTORY.md)")
    for q in sorted(shared):
        b, n = base["queries"][q], new["queries"][q]
        rel = (n - b) / b
        if rel > THRESHOLD:
            if q in ACKED:
                print(f"ACK  {q}: {b:.3f} -> {n:.3f} ({rel:+.0%}) — {ACKED[q]}")
            else:
                print(f"FAIL {q}: {b:.3f} -> {n:.3f} ({rel:+.0%}) "
                      f"regression > {THRESHOLD:.0%}")
                bad += 1
        elif rel < -THRESHOLD:
            print(f"note {q}: {b:.3f} -> {n:.3f} ({rel:+.0%}) "
                  "large improvement — record the plan change")
    if added or removed:
        # the headline SET changed: raw totals are incomparable, so the
        # total gate runs over the shared queries only (per-query gates
        # above still cover everything shared; new queries establish
        # their baseline this round)
        bt = sum(base["queries"][q] for q in shared)
        nt = sum(new["queries"][q] for q in shared)
        label = f"shared_total ({len(shared)} queries)"
    else:
        bt, nt = base["value"], new["value"]
        label = "headline_total"
    relt = (nt - bt) / bt
    tag = "FAIL" if relt > 0.15 else "ok  "
    if relt > 0.15:
        bad += 1
    print(f"{tag} {label}: {bt:.3f} -> {nt:.3f} ({relt:+.0%})")
    return bad


def main(argv: list[str]) -> int:
    rs = rounds()
    if argv:
        base, new = load(rs[-1]), load(argv[0])
        base_name, new_name = os.path.basename(rs[-1]), argv[0]
    else:
        if len(rs) < 2:
            raise SystemExit("need two BENCH_r*.json rounds")
        base, new = load(rs[-2]), load(rs[-1])
        base_name, new_name = (os.path.basename(p) for p in rs[-2:])
    print(f"drift gate: {base_name} -> {new_name} (±{THRESHOLD:.0%})")
    return 1 if drift(base, new, base_name, new_name) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
