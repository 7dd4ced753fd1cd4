"""BigQuery-compatible scalar expressions (SURVEY.md §2.8 census).

Every function here returns a pyspark Column built purely from built-in
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs.

Reference parity notes (file:line cite the reference repo):

- ``safe_divide``    ← SAFE_DIVIDE, sql/datamart/sales/sales_summary.sql:47
- ``bq_week``        ← EXTRACT(WEEK), sql/core/dim/dim_dates.sql:28.
  BigQuery WEEK: weeks begin on Sunday; dates before the first Sunday of the
  year are week 0 (range 0..53). Spark's ``weekofyear`` is ISO-8601
  (Monday, 1-based) — NOT the same; this expression pins BigQuery semantics.
- ``fiscal_year``    ← sql/core/dim/dim_dates.sql:37-40 (month >= 7 → year,
  else year - 1; i.e. the fiscal year is labeled by its starting July).
- ``holiday_name`` / ``is_holiday`` ← sql/core/dim/dim_dates.sql:42-51
  (fixed 01-01 / 07-04 / 12-25 list).
- ``is_weekend``     ← sql/core/dim/dim_dates.sql:32-35 (DAYOFWEEK in (1,7);
  both engines use 1=Sunday..7=Saturday).
- ``month_name`` / ``day_name`` ← FORMAT_DATE('%B'/'%A'),
  sql/core/dim/dim_dates.sql:27,31 (en-US locale assumed).
- ``sum_money``: money is double in both the reference (FLOAT64) and the
  fixtures; a plain double SUM is order-dependent in its last bits, which
  breaks exact differential comparison against the DuckDB oracle.  Summing
  after a cast to DECIMAL(18,2) is exact and order-independent, and the
  final cast back to double is deterministic (IEEE round-to-nearest) — so
  Spark and the oracle produce bit-identical results.  At 100 TB this also
  means deterministic, reproducible aggregates regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "safe_divide",
    "sum_money",
    "bq_week",
    "fiscal_year",
    "holiday_name",
    "is_holiday",
    "is_weekend",
    "month_name",
    "day_name",
]


def safe_divide(numerator: Column, denominator: Column) -> Column:
    """BigQuery ``SAFE_DIVIDE``: NULL (not error) on zero/NULL divisor."""
    return F.try_divide(numerator, denominator)


def sum_money(col: Column) -> Column:
    """Order-independent (exact decimal) SUM of a money-double column.

    Returns double for schema parity with the reference's FLOAT64 money.
    """
    return F.sum(col.cast("decimal(18,2)")).cast("double")


def bq_week(d: Column) -> Column:
    """BigQuery ``EXTRACT(WEEK FROM d)``: Sunday-start, week 0 before the
    first Sunday of the year.

    Let j = day-of-week of Jan 1 (1=Sunday..7=Saturday) and
    s = day-of-year of the first Sunday = ((8 - j) mod 7) + 1.
    week = 0 when doy < s else (doy - s) / 7 + 1.
    """
    jan1 = F.trunc(d, "year")
    j = F.dayofweek(jan1)
    s = ((F.lit(8) - j) % 7) + 1
    doy = F.dayofyear(d)
    return F.when(doy < s, F.lit(0)).otherwise(
        F.floor((doy - s) / 7) + 1
    ).cast("int")


def fiscal_year(d: Column) -> Column:
    """Fiscal year starting July 1, labeled by the starting year
    (sql/core/dim/dim_dates.sql:37-40)."""
    return F.when(F.month(d) >= 7, F.year(d)).otherwise(F.year(d) - 1).cast("int")


_HOLIDAYS = [
    ("01-01", "New Year's Day"),
    ("07-04", "Independence Day"),
    ("12-25", "Christmas Day"),
]


def holiday_name(d: Column) -> Column:
    """Fixed-list US holiday name or NULL (sql/core/dim/dim_dates.sql:42-47)."""
    mmdd = F.date_format(d, "MM-dd")
    expr = F.lit(None).cast("string")
    for key, name in reversed(_HOLIDAYS):
        expr = F.when(mmdd == key, F.lit(name)).otherwise(expr)
    return expr


def is_holiday(d: Column) -> Column:
    """(sql/core/dim/dim_dates.sql:48-51)"""
    return F.date_format(d, "MM-dd").isin([k for k, _ in _HOLIDAYS])


def is_weekend(d: Column) -> Column:
    """DAYOFWEEK in (1, 7) — Sunday/Saturday (sql/core/dim/dim_dates.sql:32-35)."""
    return F.dayofweek(d).isin(1, 7)


def month_name(d: Column) -> Column:
    """FORMAT_DATE('%B') — full month name, en-US."""
    return F.date_format(d, "MMMM")


def day_name(d: Column) -> Column:
    """FORMAT_DATE('%A') — full day name, en-US."""
    return F.date_format(d, "EEEE")
