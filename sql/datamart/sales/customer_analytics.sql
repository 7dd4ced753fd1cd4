-- Per-customer RFM analytics (datamart layer, full refresh).
-- Reference parity: sql/datamart/sales/customer_analytics.sql:10-74 —
-- MIN/MAX order dates, DATE_DIFF recency against the run date
-- ({{dstart}}), COUNT(DISTINCT), SUM, SAFE_DIVIDE, CASE segmentation.
-- The reference's DELETE WHERE TRUE + INSERT full refresh is the sink
-- disposition (sources/io.py write_full_refresh, operator S9).
-- Fixture mapping per FIXTURES.md §B: customer/nation play the current
-- profile columns (the reference's first_name/city/state have no
-- fixture analog; name/segment/nation carry the same join + group-key
-- roles).  RFM thresholds rescaled to the fixture value range with the
-- exact CASE shape of customer_analytics.sql:65-71.
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
FROM per_customer
