-- Transaction-grain fact_orders with PIT-resolved dimension keys (core).
-- Reference parity: sql/core/fact/fact_orders.sql — header×items join
-- (J1) + point-in-time dimension resolution (J2: the as-of predicate
-- effective_date <= order_date < expiration_date); the reference's MERGE
-- sink (J6/S7) is the disposition layer (operators/merge.py).
-- Fixes reference bugs #1/#2 (SURVEY.md §2.11): product_sk IS in the
-- output column list, and unit_price/item_amount derive from the raw
-- line schema (extended_price / quantity) since the declared raw schema
-- has no such columns.
-- Params: {{dim_customers}}/{{dim_products}} are view identifiers (S4
-- identifier splicing); {{dstart}}/{{dend}} bound the processed
-- order-date partitions.
--
-- Scale shape: the header×lines join shuffles on the order key
-- (bucketable); the dimension joins carry an equality key plus the PIT
-- range condition, so they stay hash joins (broadcast for dim-sized
-- sides), never nested-loop.  The dedicated operator (operators/pit.py)
-- adds the version-window validation this plain join form assumes.
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
 AND (dc.expiration_date IS NULL OR CAST(o.o_orderdate AS DATE) < dc.expiration_date)
JOIN {{dim_products}} dp
  ON l.l_partkey = dp.product_id
 AND CAST(o.o_orderdate AS DATE) >= dp.effective_date
 AND (dp.expiration_date IS NULL OR CAST(o.o_orderdate AS DATE) < dp.expiration_date)
WHERE o.o_orderdate BETWEEN DATE '{{dstart}}' AND DATE '{{dend}}'
