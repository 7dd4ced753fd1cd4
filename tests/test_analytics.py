"""Tests for the analytics wave: runtime bloom-filter join pruning, the
data-quality gate, and plan-shape pins for the new operator families
(rollup Expand, semi/anti physical joins, parallel windows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.quality import (
    QualityError,
    Rule,
    check,
    enforce,
    unique_key,
)
from star_schema_etl_airflow_spark.operators.runtime_filter import (
    has_runtime_bloom,
    physical_plan,
    pruned_fact_join,
    semi_reduction_session,
)
from star_schema_etl_airflow_spark.plans.analytics_queries import (
    a7_rollup_revenue,
    j7_semi_anti,
    w3_running_frames,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


# --- runtime bloom filter -------------------------------------------------


def _bloom_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    pt = (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_size") == 7)
        .select("p_partkey", "p_size")
    )
    return pruned_fact_join(li, pt, "l_partkey", "p_partkey")


def test_runtime_bloom_filter_is_injected(spark):
    with semi_reduction_session(spark, force=True):
        joined = _bloom_join(spark)
        assert has_runtime_bloom(joined), physical_plan(joined)
        forced_rows = joined.count()
    # bloom is a pre-filter only: identical result without it
    plain = _bloom_join(spark)
    assert not has_runtime_bloom(plain)
    assert plain.count() == forced_rows


def test_semi_reduction_session_restores_confs(spark):
    key = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    before = spark.conf.get(key, None)
    with semi_reduction_session(spark, force=True):
        assert spark.conf.get(key) == "10GB"
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get(key, None) == before


# --- quality gate ---------------------------------------------------------


def _toy(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, None), (3, 7.0)], "id int, amount double"
    )


def test_check_counts_violations_per_rule(spark):
    rules = [
        Rule("amount_positive", F.col("amount") > 0),
        Rule("amount_not_null", F.col("amount").isNotNull()),
        Rule("id_positive", F.col("id") > 0),
    ]
    got = {r["rule"]: (r["violations"], r["total_rows"])
           for r in check(_toy(spark), rules).collect()}
    # NULL amount fails the not-null rule but is not counted by the
    # (three-valued) positivity rule — matches SQL CASE semantics
    assert got == {
        "amount_positive": (1, 4),
        "amount_not_null": (1, 4),
        "id_positive": (0, 4),
    }


def test_enforce_raises_only_over_budget(spark):
    df = _toy(spark)
    with pytest.raises(QualityError, match="amount_positive"):
        enforce(df, [Rule("amount_positive", F.col("amount") > 0)])
    # same rule with a violation budget of 1 passes through unchanged
    out = enforce(df, [Rule("amount_positive", F.col("amount") > 0,
                            max_violations=1)])
    assert out is df


def test_unique_key_reports_duplicates(spark):
    dupes = unique_key(_toy(spark), ["id"]).collect()
    assert [(r["id"], r["n"]) for r in dupes] == [(2, 2)]


def test_quality_is_single_pass(spark):
    """All row-local rules fold into ONE aggregate job (no per-rule scans)."""
    rules = [Rule(f"r{i}", F.col("l_quantity") > i) for i in range(8)]
    plan = physical_plan(check(load_table(spark, SF_DIR, "lineitem"), rules))
    assert plan.count("Scan parquet") == 1, plan


# --- plan-shape pins for the analytics families ---------------------------


def test_rollup_uses_expand_operator(spark):
    plan = physical_plan(a7_rollup_revenue(spark, SF_DIR))
    assert "Expand" in plan, plan


def test_semi_anti_use_semi_join_operators(spark):
    plan = physical_plan(j7_semi_anti(spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_windows_are_partitioned_not_global(spark):
    """The window family partitions by customer — no single-partition
    global window in the plan (the WindowExec warning antipattern)."""
    df = w3_running_frames(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Window" in plan
    assert "hashpartitioning(o_custkey" in plan, plan
