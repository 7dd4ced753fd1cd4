"""Scalar-function layer: BigQuery-compatible expressions as Spark columns.

Implements the complete scalar-function census of the reference's SQL
(SURVEY.md §2.8) as JVM-side built-in compositions — no Python UDFs, so
everything stays inside whole-stage codegen.
"""

from star_schema_etl_airflow_spark.functions.scalars import (
    bq_week,
    day_name,
    fiscal_year,
    holiday_name,
    is_holiday,
    is_weekend,
    month_name,
    safe_divide,
    sum_money,
)

__all__ = [
    "bq_week",
    "day_name",
    "fiscal_year",
    "holiday_name",
    "is_holiday",
    "is_weekend",
    "month_name",
    "safe_divide",
    "sum_money",
]
