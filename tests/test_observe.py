"""Observation API: pipeline-stage metrics captured in the SAME action
as the write (no second scan), matching independently recomputed
aggregates — the zero-cost runtime-audit pattern for production stages
(row counts, null counts, money totals piggyback on the sink action)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.datamart import sales_summary

SF_DIR = "/root/testdata/sf0.001"


def test_observed_metrics_match_recomputation(spark):
    obs = Observation("sales_summary_audit")
    df = sales_summary(spark, SF_DIR).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("total_sales").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_sales"),
        F.sum(F.col("total_sales").isNull().cast("int")).alias("null_sales"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    base = sales_summary(spark, SF_DIR)
    expected_rows = base.count()
    expected_sum = base.agg(
        F.sum(F.col("total_sales").cast("decimal(18,2)"))
        .cast("double")
    ).first()[0]
    assert got["n_rows"] == expected_rows
    assert got["sum_sales"] == expected_sum
    assert got["null_sales"] == 0


def test_observation_sees_post_filter_rows_only(spark):
    obs = Observation("gate")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    gated = li.filter(F.col("l_quantity") > 25).observe(
        obs, F.count(F.lit(1)).alias("kept")
    )
    total = gated.count()
    assert obs.get["kept"] == total  # metric reflects the gated stream
