-- Transaction-grain fact_orders — MULTI-STATEMENT SCRIPT form (MERGE).
-- Reference parity: sql/core/fact/fact_orders.sql:6-105 — the
-- reference upserts the fact as a single MERGE on the composite line
-- key (J6: order_id AND order_item_id): matched lines get their
-- measures re-derived, new lines are inserted.  This port keeps that
-- verbatim shape via sources/sql_script.run_sql_script; the USING
-- subquery is the same header×items + point-in-time dimension
-- resolution as fact_orders.sql (J1/J2), with reference bugs #1/#2
-- fixed (SURVEY.md section 2.11: product_sk present in the INSERT —
-- the reference declares 13 columns but lists 12 values — and
-- unit_price/item_amount derived from the raw line schema).
-- Params: {{fact_view}}, {{dim_customers}}, {{dim_products}},
-- {{dstart}}/{{dend}}.
--
-- ANSI MERGE requires at most ONE source row per matched target row;
-- the synthetic fixture's (l_orderkey, l_linenumber) is NOT unique
-- (sf0.001: 1161 duplicate pairs), so the USING subquery dedupes to
-- one row per composite key with a deterministic full-row tie-break —
-- the same section 2.11 bug-#7 fix the dim scripts apply to staging.
-- (In the reference's real data the line key is unique and the dedupe
-- is a no-op.)
--
-- Scale shape: same as fact_orders.sql; the MERGE emulation adds one
-- hash join on the composite key (target LEFT JOIN source + anti),
-- which at table scale the disposition layer maps to the same
-- read-modify-write merge_upsert (operators/merge.py) performs.

MERGE INTO {{fact_view}} AS T
USING (
  WITH lines AS (
    SELECT
      o.o_orderkey                     AS order_id,
      CAST(o.o_orderdate AS DATE)      AS order_date,
      dc.customer_sk,
      o.o_totalprice                   AS order_amount,
      l.l_quantity                     AS quantity,
      l.l_linenumber                   AS order_item_id,
      l.l_partkey                      AS product_id,
      dp.product_sk,
      l.l_extendedprice / l.l_quantity AS unit_price,
      l.l_extendedprice                AS item_amount,
      o.o_orderstatus                  AS status
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN {{dim_customers}} dc
      ON o.o_custkey = dc.customer_id
     AND CAST(o.o_orderdate AS DATE) >= dc.effective_date
     AND (dc.expiration_date IS NULL
          OR CAST(o.o_orderdate AS DATE) < dc.expiration_date)
    JOIN {{dim_products}} dp
      ON l.l_partkey = dp.product_id
     AND CAST(o.o_orderdate AS DATE) >= dp.effective_date
     AND (dp.expiration_date IS NULL
          OR CAST(o.o_orderdate AS DATE) < dp.expiration_date)
    WHERE o.o_orderdate BETWEEN DATE '{{dstart}}' AND DATE '{{dend}}'
  )
  SELECT order_id, order_date, customer_sk, order_amount, quantity,
         order_item_id, product_id, product_sk, unit_price,
         item_amount, status
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY order_id, order_item_id
      ORDER BY product_id, item_amount, quantity, unit_price,
               customer_sk, product_sk) AS rn
    FROM lines
  ) WHERE rn = 1
) AS S
ON T.order_id = S.order_id AND T.order_item_id = S.order_item_id
WHEN MATCHED THEN
  UPDATE SET
    order_date = S.order_date,
    customer_sk = S.customer_sk,
    order_amount = S.order_amount,
    quantity = S.quantity,
    product_id = S.product_id,
    product_sk = S.product_sk,
    unit_price = S.unit_price,
    item_amount = S.item_amount,
    status = S.status
WHEN NOT MATCHED THEN
  INSERT (order_id, order_date, customer_sk, order_amount, quantity,
          order_item_id, product_id, product_sk, unit_price,
          item_amount, status)
  VALUES (S.order_id, S.order_date, S.customer_sk, S.order_amount,
          S.quantity, S.order_item_id, S.product_id, S.product_sk,
          S.unit_price, S.item_amount, S.status);

-- Script result: post-merge fact state.
SELECT order_id, order_date, customer_sk, order_amount, quantity,
       order_item_id, product_id, product_sk, unit_price, item_amount,
       status
FROM {{fact_view}};
