"""Bench drift gate over the committed per-round records (round-5
verdict task 4): any headline query regressing >30% vs the previous
round's ``BENCH_r*.json`` at the same sf must either be fixed or carry
a committed explanation in ``tools/bench_drift.py::ACKED``.

This is a data-only test (no Spark run) — the live gate for a fresh
local bench line is ``python tools/bench_drift.py <bench.json>``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import bench_drift  # noqa: E402


def _gate(prev: str, cur: str) -> int:
    return bench_drift.drift(
        bench_drift.load(prev), bench_drift.load(cur), prev, cur,
        bench_drift.round_no(prev), bench_drift.round_no(cur),
    )


def test_latest_round_within_drift_envelope(capsys):
    rs = bench_drift.rounds()
    if len(rs) < 2:
        pytest.skip("fewer than two bench rounds on disk")
    bad = _gate(rs[-2], rs[-1])
    out = capsys.readouterr().out
    assert bad == 0, f"unacknowledged bench drift:\n{out}"


def test_gate_model_replays_green_on_recent_rounds(capsys):
    """Regression test for the GATE itself (round-8 verdict task 1).

    The r7 raw gate flagged all 14 shared queries on a contended host;
    the r8 normalized-only gate flagged 4 untouched queries on a fast
    host.  Both rounds were later proven clean (quiet-host re-measures,
    judge-verified).  The current model — breach required BOTH raw and
    normalized — must replay green over the reconciled r6->r7 and the
    driver r7(requalify)->r8 transitions, or the model has regressed
    to judging the host again.
    """
    rs = bench_drift.rounds()
    if len(rs) < 3:
        pytest.skip("fewer than three bench rounds on disk")
    for prev, cur in [(rs[-3], rs[-2]), (rs[-2], rs[-1])]:
        bad = _gate(prev, cur)
        out = capsys.readouterr().out
        assert bad == 0, f"gate model flags a clean round {prev}->{cur}:\n{out}"


def test_r14_host_drift_acks_pass_without_ack_entries(capsys, monkeypatch):
    """r14 verdict task 1 'done' criterion: the three r14 host-drift
    adjudications (ngram_lm_score, embed_ivfpq_rerank, zorder_skip_stats
    — each manually A/B'd in r14) must reproduce as AUTOMATIC passes of
    the multi-record-evidence gate, with the ACK table emptied."""
    import glob as _glob
    import os as _os
    r13 = _os.path.join(bench_drift.REPO, "BENCH_QUIET_r13.json")
    r14 = _os.path.join(bench_drift.REPO, "BENCH_r14.json")
    if not (_os.path.exists(r13) and _os.path.exists(r14)):
        pytest.skip("r13/r14 records not on disk")
    monkeypatch.setattr(bench_drift, "ACKED", {})
    bad = bench_drift.drift(
        bench_drift.load(r13), bench_drift.load(r14), r13, r14, 13, 14)
    out = capsys.readouterr().out
    assert bad == 0, f"gate needs manual ACKs for r13->r14:\n{out}"
    assert "FAIL" not in out, out
    # ngram_lm_score clears via the median (not mean) host factor alone;
    # zorder_skip_stats clears via the multi-record minimum — both paths
    # of the r15 gate upgrade are exercised by this replay.
    assert "ok   zorder_skip_stats: multi-record evidence" in out, out


def test_evidence_does_not_mask_a_real_regression(monkeypatch):
    """A regression present in EVERY committed record of the round must
    still fail: evidence minima only relax host-noise breaches."""
    base = {"sf": 0.1, "value": 4.0, "host_pyloop_sec": [0.6],
            "queries": {"q": 4.0}}
    new = {"sf": 0.1, "value": 8.0, "host_pyloop_sec": [0.6],
           "queries": {"q": 8.0}}
    monkeypatch.setattr(
        bench_drift, "round_evidence",
        lambda n: ({"q": (4.0, 0.6, "rec98")} if n == 98
                   else {"q": (7.9, 0.6, "rec99")}))
    assert bench_drift.drift(base, new, "b", "n", 98, 99) >= 1


def test_history_table_generates_a_row_per_round():
    rs = bench_drift.rounds()
    if len(rs) < 2:
        pytest.skip("fewer than two bench rounds on disk")
    table = bench_drift.history_table()
    for p in rs:
        try:
            bench_drift.load(p)
        except SystemExit:
            continue  # pre-format record, skipped by the generator too
        assert f"r{bench_drift.round_no(p)} " in table
    # idempotent: regenerating yields the same text
    assert table == bench_drift.history_table()


def test_gate_still_catches_a_real_regression():
    """The conjunction must not have neutered the gate: a genuine 2x
    slowdown on a like host (pyloop ratio ~1) must still fail."""
    base = {"sf": 0.1, "value": 4.0, "host_pyloop_sec": [0.6],
            "queries": {"q": 4.0}}
    new = {"sf": 0.1, "value": 8.0, "host_pyloop_sec": [0.6],
           "queries": {"q": 8.0}}
    assert bench_drift.drift(base, new, "base", "new") >= 1
