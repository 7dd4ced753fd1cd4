"""Invariant tests for the curation/analytics wave: Gopher-style
repetition filters, PII scrubbing, cohort retention, ordered funnel, and
the classic TPC-H query shapes (Q7/Q18/Q22-adapted).

Exact-value parity with DuckDB is pinned by the oracle harness
(tools/check_correctness.py); these tests pin the semantic invariants the
oracle can't express (e.g. "the scrubbed text contains no residual PII").
"""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.events_queries import (
    events_funnel,
    events_retention,
)
from star_schema_etl_airflow_spark.plans.llm_text import (
    _EMAIL_RE,
    _PHONE_RE,
    pii_scrub,
    repetition_stats,
)
from star_schema_etl_airflow_spark.operators.pit import as_of_backward
from star_schema_etl_airflow_spark.plans.tpch_queries import (
    q7_volume_shipping,
    q18_large_orders,
    q22_idle_rich_customers,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_repetition_stats_bounds_and_gate(spark):
    rows = repetition_stats(spark, SF_DIR).collect()
    assert rows
    gates = {r.repetition_gate for r in rows}
    assert gates <= {"keep", "drop"}
    for r in rows:
        assert 0.0 <= r.dup_word_frac < 1.0
        assert 0.0 < r.top_word_frac <= 1.0
        # a word can't be rarer than 1/n or more common than everything
        assert r.top_word_frac >= 1.0 / r.n_tokens
        if r.top_bigram_frac is not None:
            assert 0.0 < r.top_bigram_frac <= 1.0


def test_pii_scrub_removes_all_matches(spark):
    """After scrubbing, re-running the detectors finds nothing."""
    docs = load_table(spark, SF_DIR, "documents")
    aug = docs.select(
        F.concat(
            F.col("text"),
            F.lit(" reach me: someone"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org / 555-867-5309"),
        ).alias("t")
    )
    scrubbed = aug.select(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("t")
    )
    residual = scrubbed.filter(
        (F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)) > 0)
        | (F.regexp_count(F.col("t"), F.lit(_PHONE_RE)) > 0)
    ).count()
    assert residual == 0
    # and the counting query sees exactly the injected PII
    counts = pii_scrub(spark, SF_DIR).agg(
        F.min("n_emails").alias("mine"),
        F.min("n_phones").alias("minp"),
    ).first()
    assert counts.mine >= 1 and counts.minp >= 1


def test_funnel_is_monotone(spark):
    row = events_funnel(spark, SF_DIR).first()
    assert row.n_signup >= row.n_view >= row.n_purchase >= 0


def test_retention_day0_is_full_cohort(spark):
    rows = events_retention(spark, SF_DIR).collect()
    day0 = [r for r in rows if r.day_offset == 0]
    assert day0
    for r in day0:
        # every cohort member is by construction active on day 0
        assert r.n_active == r.cohort_size and r.retention == 1.0
    assert all(0.0 < r.retention <= 1.0 for r in rows)


def test_q18_threshold_and_q7_pairs(spark):
    q18 = q18_large_orders(spark, SF_DIR)
    assert q18.filter(F.col("total_qty") <= 150).count() == 0
    q7 = q7_volume_shipping(spark, SF_DIR)
    assert q7.filter(F.col("supp_nation") == F.col("cust_nation")).count() == 0


def test_q22_customers_have_no_recent_orders(spark):
    res = q22_idle_rich_customers(spark, SF_DIR)
    # aggregate invariant: counts positive, balances positive
    for r in res.collect():
        assert r.n_custs > 0 and r.total_acctbal > 0


def test_as_of_backward_edges(spark):
    """No-prior-row → NULLs; equal timestamp matches (<=); latest wins."""

    left = spark.createDataFrame(
        [(1, 5, "p1"), (1, 2, "p2"), (2, 9, "p3")], "k int, t int, pid string"
    )
    right = spark.createDataFrame(
        [(1, 1, 10.0), (1, 5, 20.0), (2, 10, 30.0)], "k int, rt int, v double"
    )
    rows = {
        r.pid: (r.last_t, r.v)
        for r in as_of_backward(
            left,
            right.select("k", "rt", F.col("rt").alias("last_t"), "v"),
            on="k", left_ts="t", right_ts="rt", value_cols=["last_t", "v"],
        ).collect()
    }
    assert rows["p1"] == (5, 20.0)      # equal ts matches
    assert rows["p2"] == (1, 10.0)      # earlier row carried forward
    assert rows["p3"] == (None, None)   # nothing at-or-before


def test_as_of_backward_matches_pandas_merge_asof(spark):
    """Property: the union+window as-of equals pandas merge_asof on
    randomized inputs (one deterministic seed sweep; Spark session reuse
    keeps this fast while covering hundreds of (key, ts) shapes)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for trial in range(5):
        nl, nr = rng.integers(1, 40, 2)
        left = pd.DataFrame({
            "k": rng.integers(0, 5, nl),
            "t": rng.integers(0, 100, nl),
            "pid": np.arange(nl),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 5, nr),
            "rt": rng.integers(0, 100, nr),
            "v": rng.standard_normal(nr).round(3),
        }).drop_duplicates(["k", "rt"])  # as_of_backward precondition

        sl = spark.createDataFrame(left.astype({"k": "int64", "t": "int64"}))
        sr = spark.createDataFrame(right.astype({"k": "int64", "rt": "int64"}))
        got = (
            as_of_backward(sl, sr, on="k", left_ts="t", right_ts="rt",
                           value_cols=["v"])
            .toPandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left.sort_values("t", kind="stable"),
            right.rename(columns={"rt": "t"}).sort_values("t", kind="stable"),
            on="t", by="k", direction="backward",
        ).sort_values("pid").reset_index(drop=True)
        assert list(got["pid"]) == list(exp["pid"])
        for g, e in zip(got["v"], exp["v"]):
            assert (pd.isna(g) and pd.isna(e)) or g == e, (trial, g, e)
