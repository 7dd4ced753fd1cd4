-- Generated date dimension — MULTI-STATEMENT SCRIPT form (MERGE).
-- Reference parity: sql/core/dim/dim_dates.sql:6-78 — the reference
-- refreshes the date dimension as a single MERGE job (matched dates
-- get their attributes re-derived, missing dates are inserted); this
-- port keeps that verbatim shape via sources/sql_script.run_sql_script.
-- The USING subquery is the same 13-attribute derivation as
-- dim_dates.sql (G1 explode(sequence(...)), BigQuery EXTRACT(WEEK)
-- semantics via the first-Sunday arithmetic, fiscal year, holidays).
-- Params: {{dim_view}}; {{dstart}}/{{dend}}.
--
-- Scale note: a date dimension is tiny by construction; generated
-- executor-side, always broadcast in joins.

MERGE INTO {{dim_view}} AS target
USING (
  WITH days AS (
    SELECT explode(sequence(DATE '{{dstart}}', DATE '{{dend}}',
                            interval 1 day)) AS full_date
  ),
  parts AS (
    SELECT full_date,
           dayofyear(full_date) AS doy,
           ((8 - dayofweek(trunc(full_date, 'YEAR'))) % 7) + 1 AS s
    FROM days
  )
  SELECT
    full_date AS date_id,
    full_date,
    year(full_date)                       AS year,
    quarter(full_date)                    AS quarter,
    month(full_date)                      AS month,
    date_format(full_date, 'MMMM')        AS month_name,
    CAST(CASE WHEN doy < s THEN 0
              ELSE floor((doy - s) / 7) + 1 END AS INT) AS week_of_year,
    dayofmonth(full_date)                 AS day_of_month,
    dayofweek(full_date)                  AS day_of_week,
    date_format(full_date, 'EEEE')        AS day_name,
    dayofweek(full_date) IN (1, 7)        AS is_weekend,
    CAST(CASE WHEN month(full_date) >= 7 THEN year(full_date)
              ELSE year(full_date) - 1 END AS INT) AS fiscal_year,
    CASE WHEN date_format(full_date, 'MM-dd') = '01-01' THEN 'New Year''s Day'
         WHEN date_format(full_date, 'MM-dd') = '07-04' THEN 'Independence Day'
         WHEN date_format(full_date, 'MM-dd') = '12-25' THEN 'Christmas Day'
         ELSE NULL END AS holiday_name,
    date_format(full_date, 'MM-dd') IN ('01-01', '07-04', '12-25') AS is_holiday
  FROM parts
) AS source
ON target.full_date = source.full_date
WHEN MATCHED THEN
  UPDATE SET
    date_id = source.date_id,
    year = source.year,
    quarter = source.quarter,
    month = source.month,
    month_name = source.month_name,
    week_of_year = source.week_of_year,
    day_of_month = source.day_of_month,
    day_of_week = source.day_of_week,
    day_name = source.day_name,
    is_weekend = source.is_weekend,
    fiscal_year = source.fiscal_year,
    holiday_name = source.holiday_name,
    is_holiday = source.is_holiday
WHEN NOT MATCHED THEN
  INSERT (date_id, full_date, year, quarter, month, month_name,
          week_of_year, day_of_month, day_of_week, day_name,
          is_weekend, fiscal_year, holiday_name, is_holiday)
  VALUES (source.date_id, source.full_date, source.year, source.quarter,
          source.month, source.month_name, source.week_of_year,
          source.day_of_month, source.day_of_week, source.day_name,
          source.is_weekend, source.fiscal_year, source.holiday_name,
          source.is_holiday);

-- Script result: post-merge dimension state.
SELECT date_id, full_date, year, quarter, month, month_name,
       week_of_year, day_of_month, day_of_week, day_name,
       is_weekend, fiscal_year, holiday_name, is_holiday
FROM {{dim_view}};
