-- Generated date dimension (core layer).
-- Reference parity: sql/core/dim/dim_dates.sql:9-52 — GENERATE_DATE_ARRAY
-- + UNNEST becomes explode(sequence(...)) (operator G1), carrying the full
-- 13-attribute census of SURVEY.md §2.8, including BigQuery EXTRACT(WEEK)
-- semantics (Sunday-start, week 0 before the first Sunday — functions
-- bq_week) which differ from Spark's ISO weekofyear.  date_id equals
-- full_date: the reference round-trips FORMAT_DATE/PARSE_DATE '%Y%m%d'
-- (dim_dates.sql:22), a no-op producing DATE.  The reference's MERGE
-- upsert sink is the disposition layer (operators/merge.py, S7).
-- Params: {{dstart}}/{{dend}} (the reference uses dstart + 3 years).
--
-- Scale note: a date dimension is tiny by construction; it is generated
-- executor-side and always broadcast in joins.
WITH days AS (
  SELECT explode(sequence(DATE '{{dstart}}', DATE '{{dend}}', interval 1 day)) AS full_date
),
parts AS (
  SELECT full_date,
         dayofyear(full_date) AS doy,
         -- day-of-year of the first Sunday of the year: j = dayofweek of
         -- Jan 1 (1=Sunday..7=Saturday), s = ((8 - j) mod 7) + 1
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
