-- SCD Type 2 customer dimension apply — MULTI-STATEMENT SCRIPT form.
-- Reference parity: sql/core/dim/dim_customers.sql:6,12,83,114 — the
-- reference runs this as ONE BigQuery script job of four statements
-- (DECLARE; MERGE; INSERT; INSERT).  This port keeps that verbatim
-- statement shape, executed by sources/sql_script.run_sql_script
-- (DECLARE -> Spark session variable, MERGE/INSERT -> set-based view
-- rewrites, final SELECT returned), and applies the SURVEY.md section
-- 2.11 bug fixes:
--   #3 the reference's 4th statement double-inserts changed-record
--      versions (its 3rd statement already did); here the 4th
--      statement is the script result SELECT instead,
--   #4 surrogate keys ordered by business key, not ROW_NUMBER() OVER()
--      — and numbered over the full (new UNION changed) insert set so
--      the script matches the set-based oracle exactly,
--   #5 null-safe change detection (<=>),
--   #6 expiry stamped with the {{run_date}} parameter, not
--      CURRENT_DATE(), so a re-run is deterministic,
--   #7 the staging slice is deduped to latest-per-key before the MERGE.
-- The single-SELECT set-based twin is dim_customers.sql (same oracle).
--
-- Scale note: ROW_NUMBER() OVER (ORDER BY ...) here is a global
-- single-partition window — fine at daily-delta dimension scale (the
-- window input is one day's changed keys, not the corpus).  For the
-- 100x path use the DataFrame twin: operators/scd2.py::apply_scd2
-- auto-switches to a distributed per-partition-offset surrogate-key
-- assigner above 64 MB of input.

-- Statement 1: seed the surrogate-key sequence (A5 / P7).
DECLARE max_customer_sk BIGINT DEFAULT (
  SELECT COALESCE(MAX(customer_sk), 0) FROM {{dim_view}}
);

-- Statement 2: expire changed current rows, insert brand-new keys
-- (S7 MERGE; J3/J6 predicates; P5 null-safe change detection).
MERGE INTO {{dim_view}} AS target
USING (
  WITH source_data AS (
    SELECT customer_id, customer_name, mktsegment, acctbal FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY customer_id ORDER BY src_version DESC) AS rn
      FROM {{staging_view}}
    ) WHERE rn = 1
  ),
  cls AS (
    SELECT s.*,
           t.customer_sk,
           CASE WHEN t.customer_sk IS NULL THEN FALSE
                WHEN NOT (t.customer_name <=> s.customer_name)
                  OR NOT (t.mktsegment    <=> s.mktsegment)
                  OR NOT (t.acctbal       <=> s.acctbal) THEN TRUE
                ELSE FALSE END AS has_changes
    FROM source_data s
    LEFT JOIN {{dim_view}} t
      ON s.customer_id = t.customer_id AND t.is_current = TRUE
  )
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY CASE WHEN customer_sk IS NULL OR has_changes
                             THEN 1 ELSE 0 END
           ORDER BY customer_id) AS insert_rank
  FROM cls
) AS source
ON target.customer_id = source.customer_id AND target.is_current = TRUE
WHEN MATCHED AND source.has_changes THEN
  UPDATE SET
    expiration_date = DATE '{{run_date}}',
    is_current = FALSE
WHEN NOT MATCHED THEN
  INSERT (customer_sk, customer_id, customer_name, mktsegment, acctbal,
          effective_date, expiration_date, is_current)
  VALUES (
    max_customer_sk + source.insert_rank,
    source.customer_id, source.customer_name, source.mktsegment,
    source.acctbal, DATE '{{run_date}}', CAST(NULL AS DATE), TRUE
  );

-- Statement 3: insert new versions of the records statement 2 just
-- expired (S10 append; J5 just-expired self-join, the reference's
-- shape).  Keys rank over the full insert set (expired-now UNION
-- merge-inserted-new) so numbering continues the statement-2 sequence.
INSERT INTO {{dim_view}} (customer_sk, customer_id, customer_name,
    mktsegment, acctbal, effective_date, expiration_date, is_current)
WITH source_data AS (
  SELECT customer_id, customer_name, mktsegment, acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY customer_id ORDER BY src_version DESC) AS rn
    FROM {{staging_view}}
  ) WHERE rn = 1
),
expired_now AS (
  SELECT customer_id FROM {{dim_view}}
  WHERE is_current = FALSE AND expiration_date = DATE '{{run_date}}'
),
inserted_new AS (
  SELECT customer_id FROM {{dim_view}}
  WHERE is_current = TRUE AND effective_date = DATE '{{run_date}}'
),
ranked AS (
  SELECT customer_id, ROW_NUMBER() OVER (ORDER BY customer_id) AS rk
  FROM (SELECT customer_id FROM expired_now
        UNION SELECT customer_id FROM inserted_new)
)
SELECT max_customer_sk + r.rk, s.customer_id, s.customer_name,
       s.mktsegment, s.acctbal, DATE '{{run_date}}',
       CAST(NULL AS DATE), TRUE
FROM source_data s
JOIN expired_now e ON s.customer_id = e.customer_id
JOIN ranked r ON s.customer_id = r.customer_id;

-- Statement 4: the script result — post-apply dimension state
-- (replaces the reference's duplicate INSERT, bug #3 above).
SELECT customer_sk, customer_id, customer_name, mktsegment, acctbal,
       effective_date, expiration_date, is_current
FROM {{dim_view}};
