"""Property-based soundness of the zone-map pruning math (pure Python,
no SparkSession): a file containing any value inside the predicate
interval is NEVER pruned, under arbitrary file contents including nulls,
and under the date→timestamp bound coercion."""

from __future__ import annotations

import datetime

from hypothesis import given, strategies as st

from star_schema_etl_airflow_spark.operators.skipping import (
    FileRange,
    prune_files,
)


def _ranges_from(files):
    out = []
    for i, vals in enumerate(files):
        non_null = [v for v in vals if v is not None]
        out.append(
            FileRange(
                path=f"f{i}",
                lo=min(non_null) if non_null else None,
                hi=max(non_null) if non_null else None,
                has_null=any(v is None for v in vals),
            )
        )
    return out


@given(
    st.lists(
        st.lists(st.one_of(st.none(), st.integers(-1000, 1000)),
                 min_size=1, max_size=20),
        min_size=1, max_size=10,
    ),
    st.integers(-1000, 1000),
    st.integers(0, 500),
)
def test_no_qualifying_value_is_ever_pruned(files, lo, span):
    hi = lo + span
    manifest = _ranges_from(files)
    kept = set(prune_files(manifest, lo, hi))
    for i, vals in enumerate(files):
        if any(v is not None and lo <= v <= hi for v in vals):
            assert f"f{i}" in kept
    # and all-null files are always pruned (cannot satisfy a range pred)
    for i, vals in enumerate(files):
        if all(v is None for v in vals):
            assert f"f{i}" not in kept


@given(
    st.lists(
        st.lists(
            st.datetimes(
                min_value=datetime.datetime(2020, 1, 1),
                max_value=datetime.datetime(2025, 12, 31),
            ),
            min_size=1, max_size=10,
        ),
        min_size=1, max_size=8,
    ),
    st.dates(
        min_value=datetime.date(2020, 1, 1),
        max_value=datetime.date(2025, 12, 31),
    ),
    st.integers(0, 365),
)
def test_date_bounds_against_timestamp_stats_are_sound(files, lo_date, span):
    """Bounds arrive as plain dates, stats are datetimes — the SQL cast
    semantics (date → midnight timestamp) must keep every file holding a
    timestamp within [lo 00:00, hi 00:00]."""
    hi_date = lo_date + datetime.timedelta(days=span)
    lo_ts = datetime.datetime.combine(lo_date, datetime.time.min)
    hi_ts = datetime.datetime.combine(hi_date, datetime.time.min)
    manifest = _ranges_from(files)
    kept = set(prune_files(manifest, lo_date, hi_date))
    for i, vals in enumerate(files):
        if any(lo_ts <= v <= hi_ts for v in vals):
            assert f"f{i}" in kept
