"""Multi-statement SQL script runner (sources/sql_script.py — the
reference's DECLARE; MERGE; INSERT; INSERT script shape, S3 parity) and
the SQL-file-vs-script-vs-DataFrame SCD2 equivalence, plus the
window-partitioning guard for the distributed surrogate-key path
(round-8 verdict task 6).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.sql_script import (
    parse_merge,
    run_sql_script,
    split_statements,
    strip_comments,
)

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------


def test_strip_comments_preserves_strings():
    sql = "SELECT '--not a comment' AS a, 1 -- real comment\n/* block */ , 2"
    out = strip_comments(sql)
    assert "--not a comment" in out
    assert "real comment" not in out
    assert "block" not in out


def test_split_statements_ignores_semicolons_in_strings_and_parens():
    sql = "SELECT ';' AS x; SELECT (SELECT 1) AS y;  ; SELECT 2"
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert stmts[0] == "SELECT ';' AS x"
    assert stmts[1] == "SELECT (SELECT 1) AS y"


# --------------------------------------------------------------------------
# Statement execution over temp views
# --------------------------------------------------------------------------


def test_declare_with_subquery_default_and_final_select(spark):
    spark.range(5).createOrReplaceTempView("ssr_v1")
    out = run_sql_script(spark, """
        DECLARE ssr_max BIGINT DEFAULT (SELECT MAX(id) FROM ssr_v1);
        SELECT ssr_max + 1 AS nxt;
    """)
    assert out.collect()[0]["nxt"] == 5


def test_insert_delete_update_truncate_chain(spark):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id INT, tag STRING"
    ).createOrReplaceTempView("ssr_t")
    out = run_sql_script(spark, """
        INSERT INTO ssr_t (id, tag) VALUES (3, 'c');
        INSERT INTO ssr_t SELECT 4, 'd';
        DELETE FROM ssr_t WHERE tag = 'b';
        UPDATE ssr_t SET tag = 'Z' WHERE id >= 3;
        SELECT * FROM ssr_t;
    """)
    rows = {(r.id, r.tag) for r in out.collect()}
    assert rows == {(1, "a"), (3, "Z"), (4, "Z")}
    assert run_sql_script(spark, """
        TRUNCATE TABLE ssr_t;
        SELECT COUNT(*) AS n FROM ssr_t;
    """).collect()[0]["n"] == 0


def test_delete_where_null_condition_keeps_row(spark):
    # DELETE removes rows where cond IS TRUE; a NULL predicate keeps the
    # row (ANSI semantics — a bare NOT(cond) filter would drop it).
    spark.createDataFrame(
        [(1, None), (2, "x")], "id INT, tag STRING"
    ).createOrReplaceTempView("ssr_n")
    out = run_sql_script(spark, """
        DELETE FROM ssr_n WHERE tag = 'x';
        SELECT id FROM ssr_n;
    """)
    assert [r.id for r in out.collect()] == [1]


def test_merge_update_insert_delete(spark):
    spark.createDataFrame(
        [(1, 10, True), (2, 20, True), (3, 30, True)],
        "k INT, v INT, keep BOOLEAN",
    ).createOrReplaceTempView("ssr_m")
    out = run_sql_script(spark, """
        MERGE INTO ssr_m AS t
        USING (SELECT * FROM VALUES (2, 200), (3, -1), (4, 400) AS s(k, v)) AS s
        ON t.k = s.k
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, keep) VALUES (s.k, s.v, FALSE);
        SELECT * FROM ssr_m;
    """)
    rows = {(r.k, r.v, r.keep) for r in out.collect()}
    assert rows == {(1, 10, True), (2, 200, True), (4, 400, False)}


def test_merge_insert_arity_mismatch_raises():
    # Reference bug §2.11 #1 (fact_orders: 13 columns, 12 values) must be
    # a loud error, not silent column shifting.
    with pytest.raises(ValueError, match="arity"):
        parse_merge("""
            MERGE INTO t USING (SELECT 1 AS k) AS s ON t.k = s.k
            WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.k)
        """)


# --------------------------------------------------------------------------
# ANSI cardinality guard (round-9 verdict task 1): when several source
# rows match one target row and the MERGE has WHEN MATCHED clauses,
# BigQuery/ANSI raise "multiple rows of source match" at runtime — the
# set-based rewrite must raise too, never silently duplicate.
# --------------------------------------------------------------------------


def test_merge_multi_match_source_raises(spark):
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k INT, v INT"
    ).createOrReplaceTempView("ssr_dup")
    with pytest.raises(Exception, match="multiple rows of the source"):
        run_sql_script(spark, """
            MERGE INTO ssr_dup AS t
            USING (SELECT * FROM VALUES (1, 100), (1, 101) AS s(k, v)) AS s
            ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET v = s.v;
            SELECT * FROM ssr_dup;
        """).collect()


def test_merge_multi_match_double_delete_raises(spark):
    # Deleting the same target row via two matching source rows is the
    # same cardinality violation — the count runs before the delete
    # filter, so it must still trip.
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k INT, v INT"
    ).createOrReplaceTempView("ssr_dup2")
    with pytest.raises(Exception, match="multiple rows of the source"):
        run_sql_script(spark, """
            MERGE INTO ssr_dup2 AS t
            USING (SELECT * FROM VALUES (1, 0), (1, 1) AS s(k, v)) AS s
            ON t.k = s.k
            WHEN MATCHED THEN DELETE;
            SELECT * FROM ssr_dup2;
        """).collect()


def test_merge_insert_only_multi_match_allowed(spark):
    # With no WHEN MATCHED clause there is nothing to update twice:
    # BigQuery permits multi-match, and the insert branch (anti-join)
    # simply drops all matching source rows.
    spark.createDataFrame(
        [(1, 10)], "k INT, v INT"
    ).createOrReplaceTempView("ssr_insonly")
    out = run_sql_script(spark, """
        MERGE INTO ssr_insonly AS t
        USING (SELECT * FROM VALUES (1, 100), (1, 101), (3, 300)
               AS s(k, v)) AS s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);
        SELECT * FROM ssr_insonly;
    """)
    assert {(r.k, r.v) for r in out.collect()} == {(1, 10), (3, 300)}


def test_merge_unique_source_does_not_raise(spark):
    # The guard must be invisible on well-formed merges (every
    # sqlscript_* oracle depends on this).
    spark.createDataFrame(
        [(1, 10), (2, 20)], "k INT, v INT"
    ).createOrReplaceTempView("ssr_ok")
    out = run_sql_script(spark, """
        MERGE INTO ssr_ok AS t
        USING (SELECT * FROM VALUES (2, 200), (3, 300) AS s(k, v)) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v);
        SELECT * FROM ssr_ok;
    """)
    assert {(r.k, r.v) for r in out.collect()} == {(1, 10), (2, 200), (3, 300)}


# --------------------------------------------------------------------------
# The committed 4-statement script vs the set-based paths
# --------------------------------------------------------------------------


def test_sqlscript_matches_sqlfile_and_dataframe_scd2(spark):
    """dim_customers three ways — single-SELECT file, 4-statement script,
    DataFrame apply_scd2 — must agree row-for-row."""
    from star_schema_etl_airflow_spark.plans.core_queries import scd2_apply
    from star_schema_etl_airflow_spark.plans.sqlfiles import (
        sqlfile_dim_customers,
        sqlscript_dim_customers,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    script = rows(sqlscript_dim_customers(spark, SF_DIR))
    assert script == rows(sqlfile_dim_customers(spark, SF_DIR))
    assert script == rows(scd2_apply(spark, SF_DIR).select(
        *sqlscript_dim_customers(spark, SF_DIR).columns))


# --------------------------------------------------------------------------
# Round-8 verdict task 6: the DataFrame SCD2 path above the switch
# threshold must contain NO unpartitioned window (the SQL files' global
# ROW_NUMBER emits "WARN WindowExec: No Partition Defined"; the
# distributed assigner exists to avoid exactly that).
# --------------------------------------------------------------------------


def _window_groups(line: str) -> int:
    """Count top-level [...] argument groups in a plan-node line:
    Window [exprs], [partitionSpec], [orderSpec] → 3; a global window
    has only [exprs], [orderSpec] → 2."""
    depth, groups = 0, 0
    for ch in line:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def test_merge_rewrite_plans_hash_joins_not_nested_loop(spark):
    """The emulated MERGE must plan as equi hash/sort-merge joins on the
    merge keys — a nested-loop or cartesian here would be quadratic at
    fact scale."""
    from star_schema_etl_airflow_spark.plans.sqlfiles import (
        sqlscript_dim_customers,
    )

    plan = sqlscript_dim_customers(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_distributed_sk_path_has_no_global_window(spark, monkeypatch):
    from star_schema_etl_airflow_spark.operators import scd2 as scd2_mod
    from star_schema_etl_airflow_spark.plans.core_queries import scd2_apply

    # force the distributed assigner regardless of delta size
    monkeypatch.setattr(scd2_mod, "DISTRIBUTED_SK_BYTES", 0)
    plan = scd2_apply(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if re.search(r"\bWindow \[", ln)]
    assert windows, "expected window nodes in the SCD2 plan"
    for ln in windows:
        assert _window_groups(ln) == 3, f"unpartitioned window:\n{ln}"
