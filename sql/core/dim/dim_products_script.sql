-- SCD Type 2 product dimension apply — MULTI-STATEMENT SCRIPT form.
-- Reference parity: sql/core/dim/dim_products.sql:6,12,70 — the
-- reference's DECLARE; MERGE; INSERT script job in its verbatim
-- statement shape (sources/sql_script.run_sql_script), with the
-- SURVEY.md section 2.11 bug fixes applied as in
-- dim_customers_script.sql: ordered surrogate keys numbered over the
-- full (new UNION changed) insert set, null-safe change detection,
-- parameterized run date.  The staging slice is assumed pre-deduped
-- to one row per product_id (the reference's raw products carry no
-- version column).  The single-SELECT set-based twin is
-- dim_products.sql (same oracle).
--
-- Scale note: the surrogate-key ROW_NUMBER windows are global — fine
-- at daily-delta dimension scale; for the 100x path use
-- operators/scd2.py::apply_scd2 (distributed assigner above 64 MB).

-- Statement 1: seed the surrogate-key sequence (A5 / P7).
DECLARE max_product_sk BIGINT DEFAULT (
  SELECT COALESCE(MAX(product_sk), 0) FROM {{dim_view}}
);

-- Statement 2: expire changed current rows, insert brand-new keys.
MERGE INTO {{dim_view}} AS target
USING (
  WITH cls AS (
    SELECT s.*,
           t.product_sk,
           CASE WHEN t.product_sk IS NULL THEN FALSE
                WHEN NOT (t.category <=> s.category)
                  OR NOT (t.price    <=> s.price) THEN TRUE
                ELSE FALSE END AS has_changes
    FROM {{staging_view}} s
    LEFT JOIN {{dim_view}} t
      ON s.product_id = t.product_id AND t.is_current = TRUE
  )
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY CASE WHEN product_sk IS NULL OR has_changes
                             THEN 1 ELSE 0 END
           ORDER BY product_id) AS insert_rank
  FROM cls
) AS source
ON target.product_id = source.product_id AND target.is_current = TRUE
WHEN MATCHED AND source.has_changes THEN
  UPDATE SET
    expiration_date = DATE '{{run_date}}',
    is_current = FALSE
WHEN NOT MATCHED THEN
  INSERT (product_sk, product_id, category, price,
          effective_date, expiration_date, is_current)
  VALUES (
    max_product_sk + source.insert_rank,
    source.product_id, source.category, source.price,
    DATE '{{run_date}}', CAST(NULL AS DATE), TRUE
  );

-- Statement 3: insert new versions of the just-expired records
-- (S10 append; J5 just-expired self-join).
INSERT INTO {{dim_view}} (product_sk, product_id, category, price,
    effective_date, expiration_date, is_current)
WITH expired_now AS (
  SELECT product_id FROM {{dim_view}}
  WHERE is_current = FALSE AND expiration_date = DATE '{{run_date}}'
),
inserted_new AS (
  SELECT product_id FROM {{dim_view}}
  WHERE is_current = TRUE AND effective_date = DATE '{{run_date}}'
),
ranked AS (
  SELECT product_id, ROW_NUMBER() OVER (ORDER BY product_id) AS rk
  FROM (SELECT product_id FROM expired_now
        UNION SELECT product_id FROM inserted_new)
)
SELECT max_product_sk + r.rk, s.product_id, s.category, s.price,
       DATE '{{run_date}}', CAST(NULL AS DATE), TRUE
FROM {{staging_view}} s
JOIN expired_now e ON s.product_id = e.product_id
JOIN ranked r ON s.product_id = r.product_id;

-- Statement 4: the script result — post-apply dimension state.
SELECT product_sk, product_id, category, price,
       effective_date, expiration_date, is_current
FROM {{dim_view}};
