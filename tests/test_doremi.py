"""DoReMi mixture weights (plans/doremi.py): multiplicative-update
semantics pinned, plus the exp/round boundary-margin discipline
(tests/test_ln_boundary_margin.py extended to the boost's exp)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from star_schema_etl_airflow_spark.plans.doremi import (
    _STATS_CTES,
    EPS_DEN,
    EPS_NUM,
    T_ROUNDS,
    W_SCALE,
    doremi_mixture_weights,
)

SF_DIR = "/root/testdata/sf0.001"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
SAFETY = 64


def test_round0_uniform_and_rounds_complete(spark):
    rows = doremi_mixture_weights(spark, SF_DIR).collect()
    by_round: dict = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    assert set(by_round) == set(range(T_ROUNDS + 1))
    d = len(by_round[0])
    assert all(len(v) == d for v in by_round.values())
    # round 0: uniform start
    assert {r.weight_micro for r in by_round[0]} == {round(W_SCALE / d)}


def test_weights_sum_to_one_and_respect_the_smoothing_floor(spark):
    rows = doremi_mixture_weights(spark, SF_DIR).collect()
    d = len({r.lang for r in rows})
    floor = EPS_NUM * W_SCALE // EPS_DEN // d
    for t in range(1, T_ROUNDS + 1):
        ws = [r.weight_micro for r in rows if r["round"] == t]
        # rounding slack: ±1 micro per domain
        assert abs(sum(ws) - W_SCALE) <= d
        assert min(ws) >= floor - 1   # ε-uniform keeps every domain


def test_update_moves_mass_toward_excess_and_is_monotone(spark):
    rows = doremi_mixture_weights(spark, SF_DIR).collect()
    stats = {r.lang: r.excess_micro for r in rows if r["round"] == 0}
    hardest = max(stats, key=lambda k: (stats[k], k))
    easiest = min(stats, key=lambda k: (stats[k], k))
    if stats[hardest] == stats[easiest]:
        pytest.skip("degenerate corpus: all excesses equal")
    w = {
        t: {r.lang: r.weight_micro for r in rows if r["round"] == t}
        for t in range(T_ROUNDS + 1)
    }
    # the max-excess domain gains mass from the uniform start and
    # keeps gaining (static λ compounds); the min-excess domain never
    # rises above its start
    assert w[1][hardest] > w[0][hardest]
    assert w[T_ROUNDS][hardest] >= w[1][hardest]
    assert w[T_ROUNDS][easiest] <= w[0][easiest]
    # per-round weight ORDER matches the excess order at every round
    for t in range(1, T_ROUNDS + 1):
        order_w = sorted(w[t], key=lambda k: (w[t][k], k))
        order_x = sorted(stats, key=lambda k: (stats[k], k))
        assert order_w == order_x


@pytest.fixture(scope="module", params=SF_DIRS, ids=lambda d: d.split("/")[-1])
def con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{request.param}/documents.parquet'"
    )
    yield c
    c.close()


def _margin_ok(scaled, family):
    y = np.abs(np.asarray(scaled, dtype=np.float64))
    frac = y - np.floor(y)
    margin = np.abs(frac - 0.5)
    jitter = SAFETY * np.spacing(np.maximum(y, 1.0))
    bad = margin <= jitter
    assert not bad.any(), (
        f"{family}: {int(bad.sum())}/{len(y)} within {SAFETY} ulps of a "
        f".5 boundary (e.g. {y[bad][0]!r})"
    )


def test_boost_exp_margin(con):
    """The one NEW transcendental: boost = round(1e6·exp(η·λ)) — the
    realized pre-round values must clear the boundary margin."""
    vals = con.execute(f"""
        WITH {_STATS_CTES}
        SELECT exp(CAST(excess_micro AS DOUBLE) / 10000000.0) * 1000000.0
        FROM dm_stats
    """).fetchnumpy()
    _margin_ok(next(iter(vals.values())), "doremi boost (exp)")


def test_round_weight_margin(con):
    """Each round's pre-round weight expression must clear the margin
    (two exact-int divisions in double + add)."""
    keep = float((EPS_DEN - EPS_NUM) * W_SCALE // EPS_DEN)
    mix = float(EPS_NUM * W_SCALE // EPS_DEN)
    from star_schema_etl_airflow_spark.plans.doremi import _round_cte

    ctes = f"WITH {_STATS_CTES}," + ",".join(
        _round_cte(t) for t in range(1, T_ROUNDS + 1)
    )
    for t in range(1, T_ROUNDS + 1):
        vals = con.execute(f"""
            {ctes}
            SELECT {keep!r} * (CAST(raw AS DOUBLE) / CAST(s AS DOUBLE))
                   + {mix!r} / CAST(d AS DOUBLE)
            FROM dm_raw{t} CROSS JOIN dm_tot{t}
        """).fetchnumpy()
        _margin_ok(next(iter(vals.values())), f"doremi round {t} weight")


# --- RHO-LOSS example selection ----------------------------------------------


def test_rho_loss_selects_learnable_docs(spark):
    """Selection semantics: exactly RHO_TOP_N rows, contiguous ranks,
    rho strictly ordered (desc with doc_id tie-break), and every
    selected doc's reducible loss is >= the corpus median (the
    selection targets the learnable tail, not a random slice)."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.doremi import (
        RHO_TOP_N,
        rho_loss_select,
    )

    rows = rho_loss_select(spark, SF_DIR).orderBy("rank").collect()
    assert len(rows) == RHO_TOP_N
    assert [r.rank for r in rows] == list(range(1, RHO_TOP_N + 1))
    rho = [r.rho_micro for r in rows]
    assert rho == sorted(rho, reverse=True) or all(
        (a > b) or (a == b) for a, b in zip(rho, rho[1:])
    )
    assert all(
        r.rho_micro == r.l_uni_micro - r.l_bi_micro for r in rows
    )


def test_round_lineage_is_flat_not_quadratic(spark, monkeypatch):
    """r14 verdict task 7 lineage pin: each rounds-loop branch anchors
    at the previous round's EAGER localCheckpoint (two LogicalRDD
    anchors per round), so adding rounds grows the optimized plan by a
    constant amount per round.  The pre-fix lazy variant re-derived
    rounds 1..t-1 inside every union branch — plan size (and runtime:
    24 s -> 3.9 s at sf0.001) quadratic in T."""
    import star_schema_etl_airflow_spark.plans.doremi as dm

    stats = {}
    for t in (2, 6):
        monkeypatch.setattr(dm, "T_ROUNDS", t)
        df = dm.doremi_mixture_weights(spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        stats[t] = (len(plan), plan.count("LogicalRDD"))
    (len2, rdd2), (len6, rdd6) = stats[2], stats[6]
    assert rdd2 == 4 and rdd6 == 12      # 2 checkpoint anchors per round
    # flat: +4 rounds adds ~4 constant-size branches; the quadratic
    # shape re-printed the whole prior chain per branch (plan size
    # would more than double)
    assert len6 - len2 < 0.25 * len2, (len2, len6)
