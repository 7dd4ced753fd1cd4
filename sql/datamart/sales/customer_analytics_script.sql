-- Per-customer RFM analytics — MULTI-STATEMENT SCRIPT form (full
-- refresh).  Reference parity: sql/datamart/sales/
-- customer_analytics.sql:6-7 (DELETE WHERE TRUE) + :10-74 (INSERT
-- INTO ... SELECT) — the reference rebuilds the whole analytics table
-- every run as one two-statement script job (S9).  This port keeps
-- that verbatim shape via sources/sql_script.run_sql_script; the
-- INSERT body is the same RFM derivation as customer_analytics.sql
-- (fixture mapping per FIXTURES.md section B).  Params:
-- {{analytics_view}}; {{dstart}} (the run date for recency).

-- Statement 1: full-table DELETE (S9 full refresh).
DELETE FROM {{analytics_view}} WHERE TRUE;

-- Statement 2: recompute and append everything (S10).
INSERT INTO {{analytics_view}} (customer_id, customer_name, mktsegment,
    nation_name, first_order_date, last_order_date, total_orders,
    total_lifetime_value, days_since_last_order, average_order_value,
    customer_segment)
WITH per_customer AS (
  SELECT
    c.c_custkey                                    AS customer_id,
    c.c_name                                       AS customer_name,
    c.c_mktsegment                                 AS mktsegment,
    n.n_name                                       AS nation_name,
    MIN(CAST(o.o_orderdate AS DATE))               AS first_order_date,
    MAX(CAST(o.o_orderdate AS DATE))               AS last_order_date,
    COUNT(DISTINCT o.o_orderkey)                   AS total_orders,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_lifetime_value
  FROM lineitem l
  JOIN orders   o ON l.l_orderkey  = o.o_orderkey
  JOIN customer c ON o.o_custkey   = c.c_custkey
  JOIN nation   n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3, 4
)
SELECT
  customer_id, customer_name, mktsegment, nation_name,
  first_order_date, last_order_date, total_orders, total_lifetime_value,
  CAST(datediff(DATE '{{dstart}}', last_order_date) AS BIGINT) AS days_since_last_order,
  CASE WHEN total_orders = 0 THEN NULL
       ELSE total_lifetime_value / total_orders END AS average_order_value,
  CASE
    WHEN datediff(DATE '{{dstart}}', last_order_date) <= 90
         AND total_orders >= 8 AND total_lifetime_value >= 500000 THEN 'VIP'
    WHEN datediff(DATE '{{dstart}}', last_order_date) <= 180
         AND total_orders >= 5 THEN 'Loyal'
    WHEN datediff(DATE '{{dstart}}', last_order_date) <= 365 THEN 'Active'
    WHEN datediff(DATE '{{dstart}}', last_order_date) <= 730 THEN 'At Risk'
    ELSE 'Inactive'
  END AS customer_segment
FROM per_customer;

-- Statement 3: the script result — post-refresh analytics state.
SELECT customer_id, customer_name, mktsegment, nation_name,
       first_order_date, last_order_date, total_orders,
       total_lifetime_value, days_since_last_order, average_order_value,
       customer_segment
FROM {{analytics_view}};
