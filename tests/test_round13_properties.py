"""Property-based test of the top-k fold-sufficiency lemma that
``streaming/retrieval_stream.py`` relies on: under FROZEN per-document
scores, folding k-deep lists batch-by-batch (with arbitrary batching
and at-least-once re-delivery) equals the one-shot top-k over
everything ever ingested.  Pure-Python model — the Spark twin is pinned
end-to-end in ``tests/test_retrieval_stream.py``; this covers the
combinatorics (ties, duplicates, adversarial batch splits) that a
fixture cannot enumerate."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

K = 3


def _topk(rows: set[tuple[int, int, int]]) -> set[tuple[int, int, int]]:
    """Exact per-query top-K by (score desc, doc asc) — the model of
    ``merge_topk``'s window."""
    out: set[tuple[int, int, int]] = set()
    queries = {q for q, _, _ in rows}
    for q in queries:
        ranked = sorted(
            ((d, s) for qq, d, s in rows if qq == q),
            key=lambda ds: (-ds[1], ds[0]),
        )
        out |= {(q, d, s) for d, s in ranked[:K]}
    return out


@given(
    st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(0, 15)),   # (query, doc)
        st.integers(0, 5),                                   # frozen score
        min_size=1, max_size=24,
    ),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_fold_of_k_deep_lists_equals_one_shot_topk(scores, data):
    rows = [(q, d, s) for (q, d), s in scores.items()]
    # adversarial batching: random assignment, plus re-delivery of a
    # random subset (at-least-once semantics)
    n_batches = data.draw(st.integers(1, 4), label="n_batches")
    batches: list[set] = [set() for _ in range(n_batches)]
    for r in rows:
        batches[data.draw(st.integers(0, n_batches - 1))].add(r)
    redelivered = data.draw(
        st.sets(st.sampled_from(rows)) if rows else st.just(set()),
        label="redelivered",
    )
    batches.append(set(redelivered))

    state: set = set()
    for b in batches:
        state = _topk(state | b)          # merge_topk: union → distinct → cut
    assert state == _topk(set(rows))


@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_holt_weight_expansion_equals_direct_recursion(series):
    """The Aʲc lag-weight expansion used by ``events_holt_forecast``
    must equal running the Holt recursion directly with zero cold-start
    state — for every prefix (so level AND trend agree at every t
    within the truncation horizon)."""
    from star_schema_etl_airflow_spark.plans.anomaly import (
        _HOLT_LW,
        _HOLT_TW,
        HOLT_ALPHA,
        HOLT_BETA,
    )
    import math

    a, b = HOLT_ALPHA, HOLT_BETA
    l = bb = 0.0
    for t, y in enumerate(series):
        prev_l = l
        l = a * y + (1 - a) * (l + bb)
        bb = b * (l - prev_l) + (1 - b) * bb
        lw = sum(
            w * series[t - j] for j, w in enumerate(_HOLT_LW) if t - j >= 0
        )
        tw = sum(
            w * series[t - j] for j, w in enumerate(_HOLT_TW) if t - j >= 0
        )
        # exact within float noise while the truncated tail is zero
        # (t < HOLT_LAGS ⇒ every nonzero lag is inside the window)
        if t < len(_HOLT_LW):
            assert math.isclose(l, lw, rel_tol=1e-12, abs_tol=1e-9), (t, l, lw)
            assert math.isclose(bb, tw, rel_tol=1e-12, abs_tol=1e-9), (t, bb, tw)
