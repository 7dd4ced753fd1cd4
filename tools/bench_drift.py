#!/usr/bin/env python
"""Per-query bench drift gate (round-5 verdict task 4; host-normalized
per round-7 verdict task 3).

Compares a bench record against the previous round's committed
``BENCH_r*.json`` at the same sf and flags any headline query whose
time moved more than ``THRESHOLD`` (default ±30%) **both raw and after
normalizing by the host-speed calibration** each record carries
(``host_pyloop_sec``: timings of a fixed pure-Python workload taken
around/between the bench passes).  History of the model: r5-r7 burned
effort re-attributing host contention by hand; r7 normalized by the
pyloop ratio alone, which overcorrected in r8 (a 24%-faster-Python host
turned +5-10% raw jitter on JVM-bound queries into fake +30-37%
normalized regressions).  The conjunction — a real regression shows up
under BOTH readings — is robust to the host being fast OR slow at
either measurement.

Regressions are hard failures (exit 1) unless acknowledged in ``ACKED``
with a committed explanation; large improvements print a notice.

A driver record measured on a provably-contended host can be superseded
for drift purposes by a committed quiet-host re-measure: add the round
to ``RECONCILED`` with the re-measure's filename and record the
attribution in ``BENCH_HISTORY.md``.  The driver's record stays on disk
for the judge; the gate reads the reconciled one.

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
# Sub-second queries swing 20-40% between equally-quiet runs (six
# isolated passes of dedup_minhash_lsh at one commit: 0.63-1.13s after
# warmup) — a pure percentage gate on them alarms on jitter.  A
# regression must breach BOTH the relative threshold AND this absolute
# normalized delta to fail; the 15% total gate still catches diffuse
# slowdowns made of small deltas.
ABS_FLOOR_SEC = 0.25

# query -> reason; entries let an *explained* regression pass the gate.
ACKED: dict[str, str] = {
    # r13 adjudication: A/B at the r12 bench commit (6d9245e) on the
    # r13 host measures 2.756s isolated — identical to HEAD's 2.45-2.76
    # — so the code is unchanged and r12's committed 1.56 was the fast
    # tail of this query's documented 1.5-5.7s same-code band
    # (bench.py ISOLATED note).  The query is output-bound (1.44M true
    # pairs at sf0.1); BENCH_QUIET_r13.json re-baselines it.
    "dedup_prefix_join": "r12 baseline was a fast outlier; A/B-pinned "
                         "same-code 2.76s at 6d9245e (BENCH_HISTORY r13)",
    # r13 adjudication: the r12-verdict-mandated pairwise census
    # (fa76bc7, one sketch-sized distinct-count job) landed AFTER
    # BENCH_r12.json was recorded; it adds ~0.15-0.2s of fixed job
    # overhead at sf0.1 — the price of no-silent-caps observability.
    "kmv_source_overlap": "census job added by fa76bc7 post-r12-record "
                          "(+~0.18s fixed; BENCH_HISTORY r13)",
    # r14 adjudications (BENCH_HISTORY r14): the r14 host never reached
    # the r13 quiet band (pyloop 0.60-0.91 vs 0.48-0.60 across three
    # full samples) and mean-pyloop normalization under-corrects its
    # bursty windows.
    "ngram_lm_score": "host drift: A/B at 45cf2c8 on the r14 host "
                      "measures OLD min 1.40 vs NEW min 1.19 — new code "
                      "is faster; r13's 0.961 was a quieter host",
    "embed_ivfpq_rerank": "one-off contention sample: the other two "
                          "same-code r14 records measure 1.461/1.578 vs "
                          "the 1.621 baseline — flat-to-better",
    "zorder_skip_stats": "one-off contention sample: the other two "
                         "same-code r14 records measure 3.881/4.021 vs "
                         "the 3.889 baseline — flat",
}

# Extras promoted to GATING (r11 verdict task 3): these have two
# committed quiet records (r11 baseline + the r12 measure), so their
# round-over-round movement gates with the same raw-AND-normalized
# conjunction as headline queries — still outside headline_total (the
# shared baseline stays stable), but a regression now fails the gate
# instead of merely printing.  Newly-added extras stay non-gating until
# they too have two committed quiet records.
GATED_EXTRAS = {
    "image_dedup_dhash",
    "audio_dedup_fingerprint",
    "dedup_incremental_minhash",
    # r11/r12 extras promoted in r13 (r12 verdict task 3): baselines are
    # the r12 driver record — a measured-slow host (pyloop 0.589-0.886
    # vs the 0.48-0.60 quiet band), so the base figures are INFLATED and
    # gating against them only fires on a real regression; the r13
    # quiet-host record re-baselines them.
    "doc_winnow_overlap",
    "image_knn_dhash",
    "curation_multimodal_clusters",
    "retrieval_rrf",
    "kmv_source_overlap",
    "zorder_skip_stats",
    # r13 extras promoted in r14 (r13 verdict task 2): two committed
    # quiet records exist (BENCH_QUIET_r13 1.621/0.832/0.351 and r13b
    # 1.503/0.781/0.273), satisfying the two-record promotion rule.
    "embed_ivfpq_rerank",
    "hard_negatives",
    "curriculum_order",
}

# round number -> committed quiet-host re-measure superseding the
# driver's BENCH_r{N}.json for drift gating (attribution in
# BENCH_HISTORY.md).  r7: driver record breached the gate on all 14
# shared queries with host_pyloop 0.821/0.634 vs r6's 0.589/0.574 and
# two queries (minhash +231%, sales_summary +102%) beyond any host
# factor; the round-8 quiet-host re-measure at the same code matched
# the r6/r7-mid baselines, attributing the breach to contention.
RECONCILED: dict[int, str] = {7: "BENCH_LOCAL_r07_requalify.json"}


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    parsed = data.get("parsed") or (data if "queries" in data else {})
    if not parsed.get("queries"):
        raise SystemExit(f"{path}: no parsed queries")
    return parsed


def round_no(path: str) -> int:
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def rounds() -> list[str]:
    """Driver records in round order, each swapped for its committed
    quiet-host companion when one exists.  Preference per round N:
    explicit RECONCILED entry > ``BENCH_QUIET_r{N}.json`` (written by
    ``bench.py --write`` as the round's last act) > the driver's
    ``BENCH_r{N}.json``."""
    out = []
    for p in sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=round_no,
    ):
        n = round_no(p)
        rec = RECONCILED.get(n)
        quiet = f"BENCH_QUIET_r{n}.json"
        if rec and os.path.exists(os.path.join(REPO, rec)):
            print(f"using {rec} for r{n} "
                  "(committed quiet-host reconciliation — see BENCH_HISTORY.md)")
            out.append(os.path.join(REPO, rec))
        elif os.path.exists(os.path.join(REPO, quiet)):
            print(f"using {quiet} for r{n} "
                  "(committed quiet-host companion record)")
            out.append(os.path.join(REPO, quiet))
        else:
            out.append(p)
    return out


def host_speed(parsed: dict) -> float | None:
    """Mean of the record's pyloop calibration samples (seconds for the
    fixed workload; larger = slower host at measurement time)."""
    cal = parsed.get("host_pyloop_sec")
    if not cal:
        return None
    return sum(cal) / len(cal)


def drift(base: dict, new: dict, base_name: str, new_name: str) -> int:
    if base.get("sf") != new.get("sf"):
        raise SystemExit(
            f"sf mismatch: {base_name} sf={base.get('sf')} "
            f"vs {new_name} sf={new.get('sf')}"
        )
    bs, ns = host_speed(base), host_speed(new)
    factor = (ns / bs) if bs and ns else 1.0
    if factor != 1.0:
        print(f"host-normalizing by pyloop ratio {factor:.3f} "
              f"(base {bs:.3f}s, new {ns:.3f}s)")
    # Isolated-protocol audit (r12 verdict task 7): bench.py promotes
    # the cache-isolated figure to the committed record for any query
    # whose rotation/isolated ratio exceeds 3× (rotation-order
    # contention dominates the rotation figure for those shapes).
    # Surface each promotion so the like-with-like comparison is
    # visible in the gate's own output, not only in the JSON.
    for q, rec in sorted((new.get("isolated_protocol") or {}).items()):
        rot, iso = rec.get("rotation"), rec.get("isolated")
        if rot and iso and rec.get("promoted", True) and rot / iso > 3.0:
            print(f"iso  {q}: committed figure is the isolated protocol "
                  f"({iso:.3f}s; rotation {rot:.3f}s, ratio "
                  f"{rot / iso:.1f}x — rotation-order contention)")
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
        b, raw = base["queries"][q], new["queries"][q]
        norm = raw / factor
        # A regression must breach the gate BOTH raw and host-normalized
        # (round-8 lesson: the r7 fix normalized by pyloop alone, but
        # pyloop measures single-core pure-Python speed while these
        # queries are JVM/shuffle-bound — a fast-Python host turned
        # +5-10% raw jitter into "+30-37% normalized regressions".
        # Raw-only gating has the mirror failure on a slow host; the
        # conjunction judges the code, not the host.)
        breach = all(
            (t - b) / b > THRESHOLD and (t - b) > ABS_FLOOR_SEC
            for t in (raw, norm)
        )
        rel = (norm - b) / b
        if breach:
            if q in ACKED:
                print(f"ACK  {q}: {b:.3f} -> {norm:.3f} ({rel:+.0%}) "
                      f"— {ACKED[q]}")
            else:
                print(f"FAIL {q}: {b:.3f} -> raw {raw:.3f} / norm {norm:.3f} "
                      f"({rel:+.0%}) regression > {THRESHOLD:.0%} "
                      "both raw and normalized")
                bad += 1
        elif rel < -THRESHOLD and (raw - b) / b < -THRESHOLD:
            print(f"note {q}: {b:.3f} -> {norm:.3f} ({rel:+.0%}) "
                  "large improvement — record the plan change")
    if not shared:
        # headline sets are disjoint (a full set swap): per-query and
        # total gates have nothing to compare — new baselines only.
        print("ok   no shared queries: all baselines established this round")
        return bad
    if added or removed:
        # the headline SET changed: raw totals are incomparable, so the
        # total gate runs over the shared queries only (per-query gates
        # above still cover everything shared; new queries establish
        # their baseline this round)
        bt = sum(base["queries"][q] for q in shared)
        nt_raw = sum(new["queries"][q] for q in shared)
        label = f"shared_total ({len(shared)} queries)"
    else:
        bt, nt_raw = base["value"], new["value"]
        label = "headline_total"
    nt = nt_raw / factor
    # same conjunction as per-query: breach both raw and normalized
    relt_raw, relt = (nt_raw - bt) / bt, (nt - bt) / bt
    breach_t = relt > 0.15 and relt_raw > 0.15
    tag = "FAIL" if breach_t else "ok  "
    if breach_t:
        bad += 1
    print(f"{tag} {label}: {bt:.3f} -> raw {nt_raw:.3f} / norm {nt:.3f} "
          f"({relt:+.0%} normalized, {relt_raw:+.0%} raw)")

    # Extras (r10 verdict task 1): cache-isolated figures for queries
    # deliberately outside the headline set and its total.  Members of
    # GATED_EXTRAS gate per-query with the same raw-AND-normalized
    # conjunction (r11 verdict task 3); the rest are printed only.
    be, ne = base.get("extras") or {}, new.get("extras") or {}
    for q in sorted(set(be) | set(ne)):
        if q in be and q in ne:
            raw, norm = ne[q], ne[q] / factor
            rel = (norm - be[q]) / be[q]
            if q in GATED_EXTRAS:
                breach = all(
                    (t - be[q]) / be[q] > THRESHOLD
                    and (t - be[q]) > ABS_FLOOR_SEC
                    for t in (raw, norm)
                )
                if breach and q in ACKED:
                    print(f"ACK  {q}: {be[q]:.3f} -> {norm:.3f} "
                          f"({rel:+.0%}) — {ACKED[q]}")
                elif breach:
                    print(f"FAIL {q}: {be[q]:.3f} -> raw {raw:.3f} / "
                          f"norm {norm:.3f} ({rel:+.0%}) extras "
                          f"regression > {THRESHOLD:.0%} both raw "
                          "and normalized")
                    bad += 1
                else:
                    print(f"xtra {q}: {be[q]:.3f} -> raw {raw:.3f} / "
                          f"norm {norm:.3f} ({rel:+.0%}, gated)")
            else:
                print(f"xtra {q}: {be[q]:.3f} -> raw {raw:.3f} / "
                      f"norm {norm:.3f} ({rel:+.0%}, non-gating)")
        elif q in ne:
            print(f"xtra {q}: {ne[q]:.3f} "
                  "(non-gating baseline established this round)")
        else:
            print(f"xtra {q}: was {be[q]:.3f} (dropped, non-gating)")
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
