"""All oracle-checked query registrations over the driver fixtures.

One entry per operator family of SURVEY.md §2 (tags cite the operator ids).
This module only *registers* — the implementations live in the plans/,
operators/ and functions/ modules.
"""

from __future__ import annotations

from star_schema_etl_airflow_spark.plans import datamart
from star_schema_etl_airflow_spark.registry import QuerySpec, register

register(QuerySpec(
    name="sales_summary",
    fn=datamart.sales_summary,
    oracle=datamart.SALES_SUMMARY_ORACLE,
    headline=True,
    tags=("J1", "J4", "A1", "A2", "A3", "A6", "P1"),
))

register(QuerySpec(
    name="customer_analytics",
    fn=datamart.customer_analytics,
    oracle=datamart.CUSTOMER_ANALYTICS_ORACLE,
    headline=True,
    tags=("J1", "J4", "A1", "A3", "A4", "A6", "P6"),
))
