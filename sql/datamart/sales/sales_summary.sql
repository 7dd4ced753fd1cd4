-- Daily sales by product category (datamart layer).
-- Reference parity: sql/datamart/sales/sales_summary.sql:10-60 — the
-- reference's DELETE+INSERT partition refresh is the sink disposition
-- (sources/io.py write_partition_refresh, operator S8); this file holds
-- the transform SELECT, executed via sources/sql_exec.run_sql_file.
-- Params: {{dstart}}/{{dend}} bound the processed order-date partitions
-- (dstart = dend reproduces the reference's single-date refresh).
--
-- Scale shape: the reference's verbatim form — fact join shuffles on the
-- order key, part auto-broadcasts (dimension-sized), and the mixed
-- COUNT(DISTINCT)+SUM aggregate plans a two-phase Expand.  The
-- measured-faster pre-aggregated form lives in plans/datamart.py
-- (sales_summary); both produce identical values.
SELECT
  CAST(o.o_orderdate AS DATE)            AS sale_date,
  year(o.o_orderdate)                    AS year,
  month(o.o_orderdate)                   AS month,
  date_format(o.o_orderdate, 'MMMM')     AS month_name,
  p.p_type                               AS product_category,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
  COUNT(DISTINCT l.l_orderkey)           AS total_orders,
  SUM(l.l_quantity)                      AS total_quantity,
  CASE WHEN COUNT(DISTINCT l.l_orderkey) = 0 THEN NULL
       ELSE CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(DISTINCT l.l_orderkey)
  END                                    AS avg_order_value
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part   p ON l.l_partkey  = p.p_partkey
WHERE o.o_orderdate BETWEEN DATE '{{dstart}}' AND DATE '{{dend}}'
GROUP BY 1, 2, 3, 4, 5
