"""Bucketed co-located join: the plan-level proof that bucketing removes
the shuffle on both sides of a big⋈big equi-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.io import write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", n_buckets=8,
    )
    # disable auto-broadcast so a non-bucketed plan WOULD shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()

        # control: the same join over plain (non-bucketed) scans shuffles
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_sorted_merge_ready(spark):
    """bucketBy + sortBy persists sorted buckets (sort-merge joins skip
    the sort too when bucket sort keys match)."""
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(li, "b_li_sorted", "l_orderkey", n_buckets=4,
                   sort_by="l_orderkey")
    try:
        t = spark.table("b_li_sorted")
        assert t.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_sorted")
