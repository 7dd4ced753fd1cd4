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


def test_latest_round_within_drift_envelope(capsys):
    rs = bench_drift.rounds()
    if len(rs) < 2:
        pytest.skip("fewer than two bench rounds on disk")
    base, new = bench_drift.load(rs[-2]), bench_drift.load(rs[-1])
    bad = bench_drift.drift(base, new, rs[-2], rs[-1])
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
        base, new = bench_drift.load(prev), bench_drift.load(cur)
        bad = bench_drift.drift(base, new, prev, cur)
        out = capsys.readouterr().out
        assert bad == 0, f"gate model flags a clean round {prev}->{cur}:\n{out}"


def test_gate_still_catches_a_real_regression():
    """The conjunction must not have neutered the gate: a genuine 2x
    slowdown on a like host (pyloop ratio ~1) must still fail."""
    base = {"sf": 0.1, "value": 4.0, "host_pyloop_sec": [0.6],
            "queries": {"q": 4.0}}
    new = {"sf": 0.1, "value": 8.0, "host_pyloop_sec": [0.6],
           "queries": {"q": 8.0}}
    assert bench_drift.drift(base, new, "base", "new") >= 1
