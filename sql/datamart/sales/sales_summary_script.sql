-- Daily sales by product category — MULTI-STATEMENT SCRIPT form
-- (datamart layer, partition refresh).
-- Reference parity: sql/datamart/sales/sales_summary.sql:6-7 (DELETE)
-- + :10-60 (INSERT INTO ... SELECT) — the reference runs the refresh
-- as one BigQuery script job: delete the {{dstart}}..{{dend}} slice of
-- the summary table, recompute it, append.  This port keeps that
-- verbatim statement shape, executed by sources/sql_script
-- .run_sql_script (DELETE/INSERT become lazy view rewrites, the final
-- SELECT is the script result).  The single-SELECT transform with the
-- sink disposition delegated to sources/io.write_partition_refresh
-- (S8) is sales_summary.sql — same oracle, same values.
--
-- Scale shape: identical to sales_summary.sql (the DELETE+INSERT pair
-- adds a filter + union over the retained partitions; at table scale
-- the disposition layer maps this to dynamic partition overwrite, one
-- shuffle, no read-modify-write of untouched partitions).

-- Statement 1: drop the refresh window from the summary (S8 DELETE).
DELETE FROM {{summary_view}}
WHERE sale_date BETWEEN DATE '{{dstart}}' AND DATE '{{dend}}';

-- Statement 2: recompute and append the window (S10 INSERT ... SELECT).
INSERT INTO {{summary_view}} (sale_date, year, month, month_name,
    product_category, total_sales, total_orders, total_quantity,
    avg_order_value)
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
GROUP BY 1, 2, 3, 4, 5;

-- Statement 3: the script result — post-refresh summary state.
SELECT sale_date, year, month, month_name, product_category,
       total_sales, total_orders, total_quantity, avg_order_value
FROM {{summary_view}};
