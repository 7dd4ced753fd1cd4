"""Scalar-function census checks against known BigQuery ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions import (
    bq_week,
    fiscal_year,
    holiday_name,
    is_holiday,
    is_weekend,
    safe_divide,
)

# (date, BigQuery EXTRACT(WEEK) value) — Sunday-start, 0-based
WEEK_CASES = [
    ("2023-01-01", 1),   # Jan 1 on a Sunday → week 1
    ("2022-01-01", 0),   # Saturday, before first Sunday → week 0
    ("2022-01-02", 1),
    ("2000-12-31", 53),  # leap year ending on Sunday → week 53
    ("1996-02-29", 8),
    ("1995-01-01", 1),
    ("1997-01-01", 0),   # Wednesday
    ("1997-01-05", 1),   # first Sunday of 1997
    ("1997-12-31", 52),
]


def test_bq_week_known_values(spark):
    df = spark.createDataFrame(WEEK_CASES, "d string, expect int").select(
        "d", "expect", bq_week(F.to_date("d")).alias("got")
    )
    rows = df.collect()
    assert all(r.expect == r.got for r in rows), [
        (r.d, r.expect, r.got) for r in rows if r.expect != r.got
    ]


def test_fiscal_year_and_weekend_and_holidays(spark):
    df = spark.createDataFrame(
        [("2023-06-30",), ("2023-07-01",), ("2023-12-25",), ("2023-07-04",),
         ("2023-01-01",), ("2023-01-02",), ("2023-01-07",)],
        "d string",
    ).select(
        "d",
        fiscal_year(F.to_date("d")).alias("fy"),
        is_weekend(F.to_date("d")).alias("we"),
        holiday_name(F.to_date("d")).alias("hn"),
        is_holiday(F.to_date("d")).alias("ih"),
    )
    by_date = {r.d: r for r in df.collect()}
    assert by_date["2023-06-30"].fy == 2022  # June → FY labeled prior year
    assert by_date["2023-07-01"].fy == 2023  # July 1 starts the new FY
    assert by_date["2023-12-25"].hn == "Christmas Day" and by_date["2023-12-25"].ih
    assert by_date["2023-07-04"].hn == "Independence Day"
    assert by_date["2023-01-01"].hn == "New Year's Day"
    assert by_date["2023-01-02"].hn is None and not by_date["2023-01-02"].ih
    assert by_date["2023-01-01"].we is True   # Sunday
    assert by_date["2023-01-07"].we is True   # Saturday
    assert by_date["2023-01-02"].we is False  # Monday


def test_safe_divide_null_on_zero(spark):
    df = spark.createDataFrame(
        [(10.0, 2.0), (1.0, 0.0), (None, 5.0)], "a double, b double"
    ).select(safe_divide(F.col("a"), F.col("b")).alias("q"))
    assert [r.q for r in df.collect()] == [5.0, None, None]
