"""Property-based tests for the pure sampling math (no SparkSession):
threshold edges partition the bucket space, and mixture fractions always
realize the target weights up to the binding stratum."""

from __future__ import annotations

from hypothesis import given, strategies as st

from star_schema_etl_airflow_spark.operators.sampling import (
    BUCKETS,
    mixture_fractions,
    threshold,
)


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_bounds_and_monotonicity(f):
    t = threshold(f)
    assert 0 <= t <= BUCKETS
    assert threshold(0.0) == 0
    assert threshold(1.0) == BUCKETS
    assert t <= threshold(min(f + 0.01, 1.0))


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=0.5, allow_nan=False),
        min_size=2, max_size=6,
    )
)
def test_split_ranges_partition_bucket_space(fracs):
    """The half-open threshold ranges of cumulative cuts are disjoint and
    cover [0, threshold(total)) exactly — no bucket is ever assigned to
    two splits and none inside the covered mass is dropped."""
    total = sum(fracs)
    if total > 1.0:
        fracs = [f / total for f in fracs]
    edges, hi = [], 0.0
    for f in fracs:
        lo_t, hi = threshold(hi), hi + f
        edges.append((lo_t, threshold(hi)))
    for (_, hi_a), (lo_b, _) in zip(edges, edges[1:]):
        assert hi_a == lo_b  # adjacent: no gap, no overlap
    assert edges[0][0] == 0
    assert edges[-1][1] == threshold(min(sum(fracs), 1.0))


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=2, max_size=4,
    ),
    st.data(),
)
def test_mixture_fractions_realize_weights(counts, data):
    weights = {
        s: data.draw(
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
            label=f"w[{s}]",
        )
        for s in counts
    }
    fracs = mixture_fractions(counts, weights)
    assert set(fracs) == set(weights)
    assert all(0.0 < f <= 1.0 for f in fracs.values())
    # the binding stratum (min count/weight) keeps everything
    binding = min(counts, key=lambda s: counts[s] / weights[s])
    assert abs(fracs[binding] - 1.0) < 1e-9
    # expected kept sizes are proportional to the weights
    factor = counts[binding] / weights[binding]
    for s in counts:
        expected = fracs[s] * counts[s]
        assert abs(expected - weights[s] * factor) < 1e-6 * max(1.0, expected)
