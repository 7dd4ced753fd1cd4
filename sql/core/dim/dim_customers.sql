-- SCD Type 2 customer dimension apply (core layer).
-- Reference parity: sql/core/dim/dim_customers.sql:1-157 — the same
-- methodology re-expressed as one set-based SELECT producing the
-- POST-APPLY dimension state: (1) dedupe the staging slice to one row
-- per business key (latest src_version wins); (2) classify each staged
-- row new/changed/unchanged against the CURRENT dim version with
-- null-safe change detection (P5: Spark's <=> ≡ IS NOT DISTINCT FROM);
-- (3) expire the current version of changed keys at the run date
-- (J3/J5); (4) insert new versions with surrogate keys continuing from
-- the dim's max (A5 scalar-subquery seed + W1 ROW_NUMBER).  The
-- reference applies the same logic as a BigQuery MERGE; here the
-- returned state feeds the MERGE/overwrite sink (operators/merge.py,
-- S7), and fixes reference bug #4 (SURVEY.md §2.11): same-key staging
-- duplicates collapse BEFORE classification, so one run never emits
-- two "current" versions of a key.
-- Params: {{dim_view}}/{{staging_view}} are view identifiers (S4);
-- {{run_date}} is the apply date.
--
-- Scale note: the ROW_NUMBER here is a global window — fine for
-- dimension-sized inputs; above ~64 MB the dedicated operator
-- (operators/scd2.py:54) auto-switches to the distributed
-- per-partition-offset surrogate-key assignment.
WITH src AS (
  SELECT customer_id, customer_name, mktsegment, acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY customer_id ORDER BY src_version DESC) AS rn
    FROM {{staging_view}}
  ) WHERE rn = 1
),
cur AS (SELECT * FROM {{dim_view}} WHERE is_current),
cls AS (
  SELECT s.*,
         CASE WHEN t.customer_id IS NULL THEN 'new'
              WHEN NOT (t.customer_name <=> s.customer_name)
                OR NOT (t.mktsegment    <=> s.mktsegment)
                OR NOT (t.acctbal       <=> s.acctbal) THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM src s LEFT JOIN cur t ON s.customer_id = t.customer_id
),
changed_keys AS (SELECT customer_id FROM cls WHERE change_type = 'changed'),
carried AS (
  SELECT d.customer_sk, d.customer_id, d.customer_name, d.mktsegment, d.acctbal,
         d.effective_date,
         CASE WHEN d.is_current AND k.customer_id IS NOT NULL
              THEN DATE '{{run_date}}' ELSE d.expiration_date END AS expiration_date,
         CASE WHEN d.is_current AND k.customer_id IS NOT NULL
              THEN FALSE ELSE d.is_current END AS is_current
  FROM {{dim_view}} d LEFT JOIN changed_keys k ON d.customer_id = k.customer_id
),
inserted AS (
  SELECT CAST((SELECT COALESCE(MAX(customer_sk), 0) FROM {{dim_view}})
              + ROW_NUMBER() OVER (ORDER BY customer_id) AS BIGINT) AS customer_sk,
         customer_id, customer_name, mktsegment, acctbal,
         DATE '{{run_date}}' AS effective_date,
         CAST(NULL AS DATE) AS expiration_date,
         TRUE AS is_current
  FROM cls WHERE change_type <> 'unchanged'
)
SELECT * FROM carried UNION ALL SELECT * FROM inserted
