"""Bench drift gate over the committed per-round records (round-5
verdict task 4): any headline query regressing >30% vs the previous
round's ``BENCH_r*.json`` at the same sf must either be fixed or carry
a committed explanation in ``tools/bench_drift.py::ACKED``.

This is a data-only test (no Spark run) — the live gate for a fresh
local bench line is ``python tools/bench_drift.py <bench.json>``.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools import bench_drift  # noqa: E402


def test_latest_round_within_drift_envelope(capsys):
    rs = bench_drift.rounds()
    if len(rs) < 2:
        pytest.skip("fewer than two bench rounds on disk")
    base, new = bench_drift.load(rs[-2]), bench_drift.load(rs[-1])
    bad = bench_drift.drift(base, new, rs[-2], rs[-1])
    out = capsys.readouterr().out
    assert bad == 0, f"unacknowledged bench drift:\n{out}"
