"""Property-based SCD2 invariants (SURVEY §5.4): for ANY sequence of
daily slices — arbitrary keys, changes, re-appearances, nulls, same-day
duplicates — the dimension must keep exactly one current row per key,
gap-free half-open version chains, and unique surrogate keys.

Hypothesis drives the slice generator; Spark work per example is bounded
(≤ 4 days × ≤ 8 keys) and examples are capped to keep the suite fast."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.operators.scd2 import apply_scd2

KEYS = [f"k{i}" for i in range(8)]
VALUES = ["a", "b", "c", None]
DATES = ["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"]

# one day's slice: a dict key → list of (value, seq) rows (dup keys allowed)
slice_strategy = st.dictionaries(
    st.sampled_from(KEYS),
    st.lists(
        st.tuples(st.sampled_from(VALUES), st.integers(0, 3)),
        min_size=1, max_size=2,
    ),
    max_size=4,
)

DIM_SCHEMA = T.StructType([
    T.StructField("sk", T.LongType()),
    T.StructField("bk", T.StringType()),
    T.StructField("attr", T.StringType()),
    T.StructField("effective_date", T.DateType()),
    T.StructField("expiration_date", T.DateType()),
    T.StructField("is_current", T.BooleanType()),
])


def _apply_days(spark, days):
    dim = spark.createDataFrame([], DIM_SCHEMA)
    for run_date, day in zip(DATES, days):
        rows = [(k, v, seq) for k, vs in day.items() for v, seq in vs]
        if not rows:
            continue
        src = spark.createDataFrame(rows, "bk string, attr string, seq int")
        dim = apply_scd2(
            dim, src, key="bk", tracked=["attr"], run_date=run_date,
            sk_col="sk", order_col="seq",
        )
        # materialize: each day must see the previous day's committed state
        dim = spark.createDataFrame(dim.collect(), DIM_SCHEMA)
    return dim


@settings(max_examples=12, deadline=None)
@given(days=st.lists(slice_strategy, min_size=1, max_size=4))
def test_scd2_invariants_hold_for_any_history(spark_global, days):
    spark = spark_global
    dim = _apply_days(spark, days)
    rows = dim.collect()
    if not rows:
        return

    # unique surrogate keys
    sks = [r.sk for r in rows]
    assert len(sks) == len(set(sks))

    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.bk, []).append(r)

    for bk, versions in by_key.items():
        current = [r for r in versions if r.is_current]
        # exactly one current, open-ended version per key ever seen
        assert len(current) == 1, (bk, versions)
        assert current[0].expiration_date is None

        # gap-free half-open chain: sorted versions abut exactly
        chain = sorted(versions, key=lambda r: r.effective_date)
        for prev, nxt in zip(chain, chain[1:]):
            assert prev.expiration_date == nxt.effective_date, (bk, chain)


# session-scoped alias so hypothesis examples reuse one SparkSession
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
