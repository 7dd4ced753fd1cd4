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

Round-15 upgrade (r14 verdict task 1 — 3 manual ACK cycles in r14,
2 in r13, each costing an A/B worktree run):

* ``host_speed`` is now the **median** of the pyloop samples, not the
  mean — the calibration loop deliberately runs often enough to catch
  contention bursts, and those burst samples (e.g. 1.416s inside an
  0.58-0.66s band) dragged the mean and mis-sized the factor in both
  directions.
* Before failing, the gate consults **multi-record evidence**: every
  committed record of a round (driver + all ``BENCH_QUIET_r{N}*``)
  measures the same code, so the per-query MIN across them is the
  round's best honest figure — exactly the adjudication the r13/r14
  ACK notes performed by hand ("the other two same-code records are
  flat").  A breach on the canonical pair that is within threshold on
  min-vs-min (same raw-AND-normalized conjunction, normalized by the
  min-records' own host medians) downgrades to an automatic pass.
  This only ever *relaxes* the canonical verdict — contention can only
  slow a sample, never fake a fast one — so a regression present in
  every record of the round still fails.

Usage:
    python tools/bench_drift.py                    # latest vs previous round
    python tools/bench_drift.py local_bench.json   # a fresh local run vs latest
    python tools/bench_drift.py --history-table    # regenerate the normalized
                                                   # table in BENCH_HISTORY.md
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
    # The three r14 host-drift ACKs (ngram_lm_score, embed_ivfpq_rerank,
    # zorder_skip_stats) were REMOVED in r15: the multi-record-evidence
    # pass now reproduces each of those manual A/B adjudications
    # automatically (pinned by tests/test_bench_drift.py::
    # test_r14_host_drift_acks_pass_without_ack_entries).
    # r15: dedup_clusters_bigstar briefly carried an ACK (canonical
    # record caught a 3.446s latency window on its ~9-round driver
    # loop; same-host A/B at 7ddc948 bounded the code delta at +5.7%)
    # — REMOVED once the second committed r15 record measured 1.662
    # and multi-record evidence auto-cleared it (BENCH_HISTORY r15).
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
    # r14 extra promoted in r15: two committed quiet records exist
    # (BENCH_QUIET_r14 1.777, r14b 1.976).
    "dedup_clusters_bigstar",
    # promoted in r16 (r15 verdict task 7): two committed quiet records
    # exist AT THE FROZEN-ARTIFACT SCOPE (BENCH_QUIET_r15 3.342,
    # r15b 3.487 — index+search only, train recorded separately as
    # one_time.ivfpq_train), so the r15 −50% re-scope win is ratcheted
    # under the two-record rule (BENCH_HISTORY r16).
    "embed_ivfpq_opq",
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
    """Median of the record's pyloop calibration samples (seconds for
    the fixed workload; larger = slower host at measurement time).
    Median, not mean: the samples bracket every query, so a handful of
    contention-burst outliers (1.4s inside an 0.6s band) are expected
    and must not drag the factor (r14 verdict task 1)."""
    cal = parsed.get("host_pyloop_sec")
    if not cal:
        return None
    return _median(cal)


def _median(xs) -> float:
    """Shared even/odd median (average of the two middle samples when
    even) — host_speed and the total-evidence host factor must use the
    SAME estimator or the normalization is biased toward whichever
    middle element one of them happens to pick."""
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def round_records(n: int) -> list[str]:
    """Every committed bench record measuring round *n*'s code: the
    driver's ``BENCH_r{n}.json`` plus all quiet-host companions
    (``BENCH_QUIET_r{n}*.json``, including ones kept for the judge
    despite known contention — contention only ever slows a figure,
    so extra records can only strengthen the min)."""
    return sorted(
        p for p in glob.glob(os.path.join(REPO, "BENCH*r*.json"))
        if round_no(p) == n
    )


def round_evidence(n: int) -> dict[str, tuple]:
    """Per-query best honest figure for round *n*: the MIN over every
    committed record of the round (headline + extras), paired with the
    host median and the name (+ measured commit, when the record is
    stamped) of the record that produced it — the provenance keeps the
    auto-adjudication auditable, since records committed early in a
    round may predate later same-round code changes."""
    best: dict[str, tuple] = {}
    for p in round_records(n):
        try:
            parsed = load(p)
        except SystemExit:
            continue
        hs = host_speed(parsed)
        src = os.path.basename(p)
        if parsed.get("commit"):
            src += f"@{parsed['commit'][:9]}"
        figures = dict(parsed.get("queries") or {})
        figures.update(parsed.get("extras") or {})
        for q, t in figures.items():
            if q not in best or t < best[q][0]:
                best[q] = (t, hs, src)
    return best


def _evidence_pass(q: str, eb: dict, en: dict) -> str | None:
    """If min-vs-min across each round's committed records is within
    the gate (same raw-AND-normalized conjunction), return the pass
    message; else None.  Normalization uses the host medians of the
    two records that produced the minima."""
    if q not in eb or q not in en:
        return None
    (b, bh, bsrc), (t, nh, nsrc) = eb[q], en[q]
    f = (nh / bh) if bh and nh else 1.0
    breach = all(
        (x - b) / b > THRESHOLD and (x - b) > ABS_FLOOR_SEC
        for x in (t, t / f)
    )
    if breach:
        return None
    return (f"ok   {q}: multi-record evidence min {b:.3f} -> "
            f"{t:.3f} raw / {t / f:.3f} norm "
            f"({(t / f - b) / b:+.0%}) — canonical-pair breach "
            f"attributed to host (minima from {bsrc} -> {nsrc})")


def drift(base: dict, new: dict, base_name: str, new_name: str,
          base_round: int | None = None,
          new_round: int | None = None) -> int:
    # Multi-record evidence (r14 verdict task 1): only available when
    # both sides are committed rounds (a fresh local bench line has no
    # sibling records yet).
    eb = round_evidence(base_round) if base_round and base_round > 0 else {}
    en = round_evidence(new_round) if new_round and new_round > 0 else {}
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
            ev = _evidence_pass(q, eb, en)
            if ev:
                print(ev)
            elif q in ACKED:
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
    if breach_t and all(q in eb and q in en for q in shared):
        # multi-record evidence for the total: sum of per-query minima,
        # normalized by the median host factor over the contributing
        # record pairs
        ebt = sum(eb[q][0] for q in shared)
        ent = sum(en[q][0] for q in shared)
        fs = [en[q][1] / eb[q][1] for q in shared
              if eb[q][1] and en[q][1]]
        fe = _median(fs) if fs else 1.0
        if (ent - ebt) / ebt <= 0.15 or (ent / fe - ebt) / ebt <= 0.15:
            print(f"ok   total multi-record evidence: min-sum {ebt:.3f} -> "
                  f"{ent:.3f} raw / {ent / fe:.3f} norm — canonical-pair "
                  "breach attributed to host")
            breach_t = False
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
                ev = _evidence_pass(q, eb, en) if breach else None
                if breach and ev:
                    print(ev)
                elif breach and q in ACKED:
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


HIST_BEGIN = "<!-- bench_drift:normalized-table:begin -->"
HIST_END = "<!-- bench_drift:normalized-table:end -->"


def history_table() -> str:
    """Generated normalized round-over-round table (r14 verdict task 1:
    'BENCH_HISTORY gains a generated, not hand-written, normalized
    column').  One row per round: the canonical record's raw headline
    total, its host median, the total normalized to the FIRST round's
    host, and the round's multi-record min-sum over the canonical
    headline set."""
    rows = []
    anchor = None
    for p in rounds():
        try:
            parsed = load(p)
        except SystemExit:
            continue  # early-round records predate the parsed format
        n = round_no(p)
        hs = host_speed(parsed)
        if anchor is None and hs:
            anchor = hs
        f = (hs / anchor) if hs and anchor else 1.0
        ev = round_evidence(n)
        shared = [q for q in parsed["queries"] if q in ev]
        minsum = sum(ev[q][0] for q in shared) if shared else None
        rows.append((n, os.path.basename(p), parsed.get("sf"),
                     parsed["value"], hs, parsed["value"] / f, minsum,
                     len(round_records(n))))
    if not rows:
        return (HIST_BEGIN + "\n\n(no parsable bench records on disk)"
                + "\n\n" + HIST_END)
    lines = [
        HIST_BEGIN,
        "",
        "Generated by `python tools/bench_drift.py --history-table` — do not",
        "hand-edit between the markers.  `norm total` divides the canonical",
        "record's raw headline total by its host-median pyloop ratio vs the",
        f"r{rows[0][0]} anchor host; `min-sum` is the per-query minimum over",
        "all committed records of the round, summed over the canonical",
        "headline set (the round's best honest figure).  Headline sets grow",
        "across rounds, so compare adjacent rounds only.",
        "",
        "| round | record | sf | raw total | host median | norm total |"
        " min-sum | records |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, name, sf, raw, hs, norm, minsum, nrec in rows:
        lines.append(
            f"| r{n} | {name} | {sf} | {raw:.3f} | "
            f"{hs:.3f} | {norm:.3f} | "
            f"{minsum:.3f} | {nrec} |" if hs and minsum is not None else
            f"| r{n} | {name} | {sf} | {raw:.3f} | — | — | — | {nrec} |"
        )
    lines += ["", HIST_END]
    return "\n".join(lines)


def write_history_table() -> None:
    path = os.path.join(REPO, "BENCH_HISTORY.md")
    table = history_table()
    with open(path) as f:
        text = f.read()
    if HIST_BEGIN in text and HIST_END in text:
        pre = text[: text.index(HIST_BEGIN)]
        post = text[text.index(HIST_END) + len(HIST_END):]
        text = pre + table + post
    else:
        text = text.rstrip() + "\n\n## Normalized totals (generated)\n\n" \
            + table + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote normalized table ({len(rounds())} rounds) to {path}")


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--history-table":
        write_history_table()
        return 0
    rs = rounds()
    if argv:
        base, new = load(rs[-1]), load(argv[0])
        base_name, new_name = os.path.basename(rs[-1]), argv[0]
        base_round, new_round = round_no(rs[-1]), -1
    else:
        if len(rs) < 2:
            raise SystemExit("need two BENCH_r*.json rounds")
        base, new = load(rs[-2]), load(rs[-1])
        base_name, new_name = (os.path.basename(p) for p in rs[-2:])
        base_round, new_round = (round_no(p) for p in rs[-2:])
    print(f"drift gate: {base_name} -> {new_name} (±{THRESHOLD:.0%})")
    return 1 if drift(base, new, base_name, new_name,
                      base_round, new_round) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
