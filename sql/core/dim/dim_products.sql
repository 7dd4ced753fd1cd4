-- SCD Type 2 product dimension apply (core layer).
-- Reference parity: sql/core/dim/dim_products.sql:1-94 — the DECLARE
-- max_product_sk + MERGE methodology as one set-based SELECT producing
-- the post-apply dimension state, per-table like the reference's files
-- (tracked columns: category, price).  Same shape as dim_customers.sql;
-- the staging slice is assumed pre-deduplicated to one row per
-- product_id (the reference's raw products carry no version column).
-- Params: {{dim_view}}/{{staging_view}} view identifiers; {{run_date}}.
--
-- Scale note: the surrogate-key ROW_NUMBER below is a global
-- single-partition window — fine at daily-delta dimension scale, the
-- reference's own semantics.  For the 100x path use the DataFrame
-- twin: operators/scd2.py::apply_scd2 auto-switches to a distributed
-- per-partition-offset key assigner above 64 MB of delta.
WITH cur AS (SELECT * FROM {{dim_view}} WHERE is_current),
cls AS (
  SELECT s.*,
         CASE WHEN t.product_id IS NULL THEN 'new'
              WHEN NOT (t.category <=> s.category)
                OR NOT (t.price    <=> s.price) THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM {{staging_view}} s LEFT JOIN cur t ON s.product_id = t.product_id
),
changed_keys AS (SELECT product_id FROM cls WHERE change_type = 'changed'),
carried AS (
  SELECT d.product_sk, d.product_id, d.category, d.price,
         d.effective_date,
         CASE WHEN d.is_current AND k.product_id IS NOT NULL
              THEN DATE '{{run_date}}' ELSE d.expiration_date END AS expiration_date,
         CASE WHEN d.is_current AND k.product_id IS NOT NULL
              THEN FALSE ELSE d.is_current END AS is_current
  FROM {{dim_view}} d LEFT JOIN changed_keys k ON d.product_id = k.product_id
),
inserted AS (
  SELECT CAST((SELECT COALESCE(MAX(product_sk), 0) FROM {{dim_view}})
              + ROW_NUMBER() OVER (ORDER BY product_id) AS BIGINT) AS product_sk,
         product_id, category, price,
         DATE '{{run_date}}' AS effective_date,
         CAST(NULL AS DATE) AS expiration_date,
         TRUE AS is_current
  FROM cls WHERE change_type <> 'unchanged'
)
SELECT * FROM carried UNION ALL SELECT * FROM inserted
