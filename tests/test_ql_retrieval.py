"""Dirichlet query-likelihood + RRF fusion (plans/ql_retrieval.py).

The cross-engine value contract is carried by the sweep (exact oracle
compare at 3 SFs); these tests pin the semantics that the oracle — by
construction the same arithmetic — cannot distinguish: the closed-form
decomposition against a direct per-term evaluation, RRF's score law,
and the rounding-boundary margin of the fusion reciprocals.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from star_schema_etl_airflow_spark.plans import ql_retrieval as mod


def test_rrf_reciprocal_margin():
    """Every realized fusion reciprocal 1/(RRF_K + r) (and every
    pairwise sum of two of them) sits ≥64 ulps from a 9-decimal .5
    rounding boundary, so Spark's HALF_UP and DuckDB's ROUND cannot
    disagree on any fused score."""
    recips = np.array(
        [1.0 / (mod.RRF_K + r) for r in range(1, mod.FUSE_K + 1)]
    )
    rounded = np.round(recips, mod.RRF_DECIMALS)
    sums = (rounded[:, None] + rounded[None, :]).ravel()
    for fam, vals in (("reciprocal", recips), ("pair-sum", sums)):
        y = vals * 10.0**mod.RRF_DECIMALS
        frac = y - np.floor(y)
        margin = np.abs(frac - 0.5)
        jitter = 64 * np.spacing(np.maximum(y, 1.0))
        assert (margin > jitter).all(), (
            f"rrf {fam}: value within 64 ulps of a rounding boundary"
        )


def test_ql_matches_direct_per_term_evaluation(spark):
    """The sparse decomposition (w_hit + sum_bg + |q|(ln μ − ln(dl+μ)))
    equals a direct Σ_t ln((tf + μ·ctf/C)/(dl + μ)) evaluation on a
    hand-built corpus, to within the 1e-6 ln-quantization."""
    docs = spark.createDataFrame(
        [
            (1, "vector hash merge vector"),
            (2, "hash hash stream window"),
            (3, "merge stream join filter vector"),
            (4, "customer query filter query filter"),
        ],
        "doc_id int, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_scaled"] / mod.LN_SCALE
        for r in mod.ql_scores(spark, docs).collect()
    }
    assert got, "no candidates scored"

    # direct evaluation in numpy
    corpus = {1: "vector hash merge vector", 2: "hash hash stream window",
              3: "merge stream join filter vector",
              4: "customer query filter query filter"}
    toks = {d: t.split() for d, t in corpus.items()}
    c_total = sum(len(t) for t in toks.values())
    from collections import Counter
    ctf = Counter(t for ts in toks.values() for t in ts)
    for (qid, did), score in got.items():
        terms = dict(mod.BM25_QUERIES)[qid]
        present = [t for t in terms if t in ctf]  # inner-join semantics
        assert any(toks[did].count(t) for t in present)
        dl = len(toks[did])
        direct = sum(
            math.log(
                (toks[did].count(t) + mod.MU * ctf[t] / c_total)
                / (dl + mod.MU)
            )
            for t in present
        )
        assert score == pytest.approx(direct, abs=len(present) * 3e-6)


def test_rrf_scores_obey_the_fusion_law(spark):
    """Every fused row's score equals round(1/(k+bm25_rank),9) +
    round(1/(k+ql_rank),9) with absent ranks contributing 0, and rows
    are dense-ranked by that score within each query."""
    out = mod.retrieval_rrf(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_q: dict[int, list] = {}
    for r in out:
        expect = 0.0
        for rank in (r["bm25_rank"], r["ql_rank"]):
            if rank is not None:
                expect += round(1.0 / (mod.RRF_K + rank), mod.RRF_DECIMALS)
        assert r["rrf_score"] == pytest.approx(expect, abs=1e-12)
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_retrieval_plan_shapes(spark):
    """QL top-k: partial WindowGroupLimit bounds the per-query top-k
    map-side and there is no cartesian.  RRF: both rankers' corpus
    tokenize is served by ONE shared cache entry (the tf relations are
    plan-identical by construction)."""
    ql = mod.retrieval_ql_topk(spark, "/root/testdata/sf0.01")
    p = ql._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p and "Partial" in p
    assert "CartesianProduct" not in p
    rrf = mod.retrieval_rrf(spark, "/root/testdata/sf0.01")
    p2 = rrf._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in p2
    assert "CartesianProduct" not in p2


def test_rrf_doc_in_both_lists_beats_single_list_peers(spark):
    """A document both rankers retrieve outranks any document only one
    ranker retrieved at an equal-or-worse rank — the reason fusion is
    used at all."""
    out = mod.retrieval_rrf(spark, "/root/testdata/sf0.01").collect()
    for q in {r["query_id"] for r in out}:
        rows = [r for r in out if r["query_id"] == q]
        both = [r for r in rows
                if r["bm25_rank"] is not None and r["ql_rank"] is not None]
        single = [r for r in rows
                  if (r["bm25_rank"] is None) != (r["ql_rank"] is None)]
        for b in both:
            worst_b = max(b["bm25_rank"], b["ql_rank"])
            for s in single:
                s_rank = s["bm25_rank"] or s["ql_rank"]
                if s_rank >= worst_b:
                    assert b["rrf_score"] > s["rrf_score"]


def test_int64_headroom_guard_trips_loudly(spark):
    """Past the documented BIGINT headroom, the scorer must raise (the
    double-carrier fallback is then adopted deliberately) instead of
    wrapping int64 silently where DuckDB would widen to HUGEINT.  The
    cliff is parameterized down to fixture scale to trigger it."""
    docs = spark.createDataFrame(
        [(1, "vector hash merge vector"), (2, "hash hash stream window")],
        "doc_id int, text string",
    )
    # guard passes at the real cliff…
    assert mod.ql_scores(spark, docs).count() > 0
    # …and trips when the corpus exceeds the (lowered) headroom
    with pytest.raises(Exception, match="headroom exceeded"):
        mod.ql_scores(spark, docs, int64_headroom=10).collect()


def test_eval_cutoff_never_exceeds_rrf_depth():
    """retrieval_eval grades the rrf list at CUTOFF depth but reuses
    retrieval_rrf's TOP_K-deep output — the import-time guard (and this
    pin) keep that dependency explicit (round-12 advice)."""
    from star_schema_etl_airflow_spark.plans import retrieval_eval as ev

    assert mod.TOP_K >= ev.CUTOFF
