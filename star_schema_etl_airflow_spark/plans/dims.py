"""Dimension builders: the generated date dimension and a deterministic
SCD2 customer dimension derived from the fixtures (the substrate for the
point-in-time join and SCD2 oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions import (
    bq_week,
    day_name,
    fiscal_year,
    holiday_name,
    is_holiday,
    is_weekend,
    month_name,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def build_date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Generated date dimension (sql/core/dim/dim_dates.sql:9-52).

    One row per day in [start, end] via ``explode(sequence(...))`` — the
    Spark transposition of GENERATE_DATE_ARRAY + UNNEST (operator G1) —
    carrying the full 13-attribute census of SURVEY.md §2.8 including
    BigQuery EXTRACT(WEEK) semantics (``bq_week``).

    ``date_id`` equals ``full_date``: the reference round-trips through
    FORMAT_DATE/PARSE_DATE '%Y%m%d' (dim_dates.sql:22), a no-op producing
    DATE.  Scale note: a date dimension is tiny by construction (≤ tens of
    thousands of rows for decades); it is generated driver-free on the
    executors and always broadcast in joins.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("full_date")
    )
    d = F.col("full_date")
    return days.select(
        d.alias("date_id"),
        d.alias("full_date"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        month_name(d).alias("month_name"),
        bq_week(d).alias("week_of_year"),
        F.dayofmonth(d).alias("day_of_month"),
        F.dayofweek(d).alias("day_of_week"),
        day_name(d).alias("day_name"),
        is_weekend(d).alias("is_weekend"),
        fiscal_year(d).alias("fiscal_year"),
        holiday_name(d).alias("holiday_name"),
        is_holiday(d).alias("is_holiday"),
    )


# Deterministic SCD2 customer dimension derived from the `customer` fixture:
# every customer has a current version; even business keys additionally have
# one expired version (acctbal 500 lower) valid [1995-01-01, 1998-01-01).
# This gives the PIT join and SCD2 checks a dimension with real version
# structure while staying exactly reproducible in the DuckDB oracle.
SCD2_V1_EFF = "1995-01-01"
SCD2_V2_EFF = "1998-01-01"


def synthetic_scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    even = F.col("c_custkey") % 2 == 0

    current = c.select(
        (F.col("c_custkey") * 2).cast("long").alias("customer_sk"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_acctbal").alias("acctbal"),
        F.when(even, F.lit(SCD2_V2_EFF)).otherwise(F.lit(SCD2_V1_EFF))
        .cast("date")
        .alias("effective_date"),
        F.lit(None).cast("date").alias("expiration_date"),
        F.lit(True).alias("is_current"),
    )
    expired = c.filter(even).select(
        (F.col("c_custkey") * 2 - 1).cast("long").alias("customer_sk"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        (F.col("c_acctbal") - 500.0).alias("acctbal"),
        F.lit(SCD2_V1_EFF).cast("date").alias("effective_date"),
        F.lit(SCD2_V2_EFF).cast("date").alias("expiration_date"),
        F.lit(False).alias("is_current"),
    )
    return current.unionByName(expired)


# The same dimension as a DuckDB CTE body (for oracle SQL reuse).
SCD2_CUSTOMER_DIM_SQL = f"""
  SELECT CAST(c_custkey * 2 AS BIGINT) AS customer_sk,
         c_custkey                     AS customer_id,
         c_name                        AS customer_name,
         c_mktsegment                  AS mktsegment,
         c_acctbal                     AS acctbal,
         CASE WHEN c_custkey % 2 = 0 THEN DATE '{SCD2_V2_EFF}'
              ELSE DATE '{SCD2_V1_EFF}' END AS effective_date,
         CAST(NULL AS DATE)            AS expiration_date,
         TRUE                          AS is_current
  FROM customer
  UNION ALL
  SELECT CAST(c_custkey * 2 - 1 AS BIGINT),
         c_custkey, c_name, c_mktsegment, c_acctbal - 500.0,
         DATE '{SCD2_V1_EFF}', DATE '{SCD2_V2_EFF}', FALSE
  FROM customer WHERE c_custkey % 2 = 0
"""
