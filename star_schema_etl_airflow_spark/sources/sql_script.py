"""Multi-statement SQL script execution (the last S3 parity nuance).

The reference's core-layer jobs are *scripts*, not single statements:
``sql/core/dim/dim_customers.sql`` in the reference is
``DECLARE; MERGE; INSERT; INSERT`` (reference lines 6, 12, 83, 114)
executed as one BigQuery script job.  ``run_sql_file`` executes exactly
one statement, so a user porting such a script verbatim could not run
it as one file — this module closes that gap.

Execution model (Spark-first, everything stays a lazy Catalyst plan):

- ``DECLARE`` → Spark 4 native session variables.  Spark rejects
  subquery DEFAULTs (``INVALID_DEFAULT_VALUE.SUBQUERY_EXPRESSION``), so
  ``DECLARE v BIGINT DEFAULT (SELECT ...)`` is rewritten to
  ``DECLARE OR REPLACE v BIGINT DEFAULT NULL`` + ``SET VAR v = (SELECT
  ...)`` — the scalar subquery is evaluated once by Spark (tiny,
  one-row), exactly BigQuery's DECLARE semantics.
- ``SET VAR`` / ``CREATE [OR REPLACE] [TEMP] VIEW`` → passthrough.
- ``MERGE INTO view ...`` → plain-parquet Spark has no SQL MERGE
  target, so the statement is parsed (restricted ANSI grammar: one or
  more ``WHEN MATCHED [AND cond] THEN UPDATE SET``/``DELETE`` clauses
  plus ``WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES``) and
  rewritten to the equivalent set-based plan: target LEFT JOIN source
  for the update/delete branch, source LEFT ANTI JOIN target for the
  insert branch, UNION ALL, re-registered over the target view name.
  Same rewrite the DataFrame ``merge_upsert`` (operators/merge.py, S7)
  performs — here derived from SQL text.
- ``INSERT INTO view [(cols)] SELECT ...`` → old-state UNION ALL with
  the select (positional column mapping per the collist, absent
  columns NULL-filled), re-registered (S10 against a view).
- ``DELETE FROM view [WHERE cond]`` → ``filter((cond) IS NOT TRUE)``
  re-registered (S8/S9 against a view).
- ``UPDATE view SET ... [WHERE]`` / ``TRUNCATE TABLE view`` → CASE
  projection / empty filter, re-registered.
- A final ``SELECT``/``WITH``/``VALUES`` statement's DataFrame is
  returned to the caller (the script's "result").

View re-registration is safe against self-reference because
``spark.sql`` analyzes eagerly: the new DataFrame captures the OLD
view's resolved plan before ``createOrReplaceTempView`` swaps the name.
State mutations therefore chain as nested lazy plans — nothing is
materialized until the caller acts, and Catalyst optimizes the whole
script as one tree.

Scale note: each emulated MERGE/INSERT deepens the logical plan; for
the reference's 3-4 statement scripts this is trivially fine.  A
thousand-statement script would want checkpointing — out of scope, the
reference's longest script is 4 statements.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.sources.sql_exec import substitute_params

# --------------------------------------------------------------------------
# Lexing helpers: comment stripping, top-level splitting
# --------------------------------------------------------------------------


def strip_comments(sql: str) -> str:
    """Remove ``--`` line comments and ``/* */`` block comments, outside
    string literals."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(sql[i:j + 1])
            i = j + 1
        elif ch == '"':
            j = sql.find('"', i + 1)
            j = n - 1 if j < 0 else j
            out.append(sql[i:j + 1])
            i = j + 1
        elif ch == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j  # keep the newline
        elif ch == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            # a comment is a token separator: `(...)/**/alias` must not
            # glue into `(...)alias` (fuzz-caught)
            out.append(" ")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _scan_top_level(sql: str):
    """Yield (index, char) for positions at paren-depth 0, outside
    string literals."""
    depth = 0
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            yield i, ch
        i += 1


def split_statements(sql: str) -> list[str]:
    """Split a script on ``;`` at paren-depth 0 outside strings."""
    cuts = [i for i, ch in _scan_top_level(sql) if ch == ";"]
    stmts, prev = [], 0
    for c in cuts:
        stmts.append(sql[prev:c])
        prev = c + 1
    stmts.append(sql[prev:])
    return [s.strip() for s in stmts if s.strip()]


def _find_keyword(sql: str, word: str, start: int = 0) -> int:
    """Index of the first top-level, word-boundary, case-insensitive
    occurrence of ``word`` at or after ``start``; -1 if none."""
    w = word.upper()
    wl = len(w)
    for i, ch in _scan_top_level(sql):
        if i < start:
            continue
        if sql[i:i + wl].upper() == w:
            before_ok = i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            after = i + wl
            after_ok = after >= len(sql) or not (
                sql[after].isalnum() or sql[after] == "_")
            if before_ok and after_ok:
                return i
    return -1


def _first_word(stmt: str) -> str:
    m = re.match(r"\s*(\w+)", stmt)
    return m.group(1).upper() if m else ""


# --------------------------------------------------------------------------
# MERGE parsing and set-based rewrite
# --------------------------------------------------------------------------


class _MergeStmt:
    __slots__ = ("target", "talias", "source_sql", "salias",
                 "on_cond", "matched", "not_matched")

    def __init__(self):
        self.matched: list[tuple[str, str | None, dict[str, str]]] = []
        # each: (kind 'update'|'delete', cond or None, assignments)
        self.not_matched: list[tuple[str | None, list[str], list[str]]] = []
        # each: (cond or None, columns, value exprs)


def _split_assignments(text: str) -> dict[str, str]:
    """``a = e1, b = e2`` → {a: e1, b: e2}, comma-split at depth 0."""
    parts, prev = [], 0
    for i, ch in _scan_top_level(text):
        if ch == ",":
            parts.append(text[prev:i])
            prev = i + 1
    parts.append(text[prev:])
    out = {}
    for p in parts:
        col, _, expr = p.partition("=")
        col = col.strip().split(".")[-1].strip("`")
        out[col] = expr.strip()
    return out


def _split_csv(text: str) -> list[str]:
    parts, prev = [], 0
    for i, ch in _scan_top_level(text):
        if ch == ",":
            parts.append(text[prev:i])
            prev = i + 1
    parts.append(text[prev:])
    return [p.strip() for p in parts]


def parse_merge(stmt: str) -> _MergeStmt:
    m = _MergeStmt()
    iu = _find_keyword(stmt, "USING")
    ion = _find_keyword(stmt, "ON", iu)
    iwhen = _find_keyword(stmt, "WHEN", ion)
    if min(iu, ion, iwhen) < 0:
        raise ValueError("MERGE: expected USING ... ON ... WHEN ...")

    head = stmt[:iu]
    hm = re.match(r"\s*MERGE\s+INTO\s+(\S+)(?:\s+AS)?\s*(\w+)?\s*$",
                  head, re.I | re.S)
    if not hm:
        raise ValueError(f"MERGE: cannot parse target in {head!r}")
    m.target = hm.group(1).strip("`")
    m.talias = hm.group(2) or m.target

    src = stmt[iu + len("USING"):ion].strip()
    sm = re.match(r"^\((?P<sub>.*)\)(?:\s+AS)?\s+(?P<al>\w+)\s*$",
                  src, re.S) or \
         re.match(r"^\((?P<sub>.*)\)\s*$", src, re.S)
    if sm:
        m.source_sql = sm.group("sub")
        m.salias = (sm.groupdict().get("al") or "__merge_src")
    else:
        nm = re.match(r"^(\S+)(?:\s+AS)?\s*(\w+)?\s*$", src, re.S)
        if not nm:
            raise ValueError(f"MERGE: cannot parse source in {src!r}")
        m.source_sql = f"SELECT * FROM {nm.group(1)}"
        m.salias = nm.group(2) or nm.group(1).strip("`")
    m.on_cond = stmt[ion + 2:iwhen].strip()

    # WHEN clauses, in order
    pos = iwhen
    clause_starts = []
    while pos >= 0:
        clause_starts.append(pos)
        pos = _find_keyword(stmt, "WHEN", pos + 4)
    clause_starts.append(len(stmt))
    for a, b in zip(clause_starts, clause_starts[1:]):
        clause = stmt[a:b].strip()
        ithen = _find_keyword(clause, "THEN")
        if ithen < 0:
            raise ValueError(f"MERGE: WHEN clause missing THEN: {clause!r}")
        head, action = clause[:ithen], clause[ithen + 4:].strip()
        hm2 = re.match(
            r"WHEN\s+(NOT\s+)?MATCHED(?:\s+BY\s+TARGET)?"
            r"(?:\s+AND\s+(?P<cond>.*))?$",
            head.strip(), re.I | re.S)
        if not hm2:
            raise ValueError(f"MERGE: unsupported WHEN head: {head!r}")
        negated, cond = bool(hm2.group(1)), hm2.group("cond")
        aw = _first_word(action)
        if not negated and aw == "UPDATE":
            sm2 = re.match(r"UPDATE\s+SET\s+(.*)$", action, re.I | re.S)
            m.matched.append(("update", cond, _split_assignments(sm2.group(1))))
        elif not negated and aw == "DELETE":
            m.matched.append(("delete", cond, {}))
        elif negated and aw == "INSERT":
            im = re.match(r"INSERT\s*\((?P<cols>.*?)\)\s*VALUES\s*"
                          r"\((?P<vals>.*)\)\s*$", action, re.I | re.S)
            if not im:
                raise ValueError(
                    f"MERGE: only INSERT (cols) VALUES (exprs) supported: "
                    f"{action!r}")
            cols = [c.strip().strip("`") for c in im.group("cols").split(",")]
            vals = _split_csv(im.group("vals"))
            if len(cols) != len(vals):
                raise ValueError(
                    f"MERGE INSERT arity mismatch: {len(cols)} columns vs "
                    f"{len(vals)} values (reference bug §2.11 #1 class)")
            m.not_matched.append((cond, cols, vals))
        else:
            raise ValueError(f"MERGE: unsupported action: {action!r}")
    return m


def rewrite_merge(spark: SparkSession, stmt: str) -> tuple[str, str]:
    """Parse a MERGE statement and return ``(target_view, sql)`` where
    ``sql`` computes the post-merge state of the target view.

    Cardinality guard: ANSI (and BigQuery — the reference's
    ``sql/core/dim/dim_customers.sql:60`` MERGE relies on it to keep
    dims consistent) raises a runtime error when one target row matches
    more than one source row and the MERGE has WHEN MATCHED clauses; a
    naive LEFT-JOIN rewrite would instead silently emit one output row
    per (target, source) pair.  The rewrite therefore tags each target
    row with a synthetic id, counts matched source rows per target row
    with a window, and folds ``assert_true(cnt <= 1)`` into the final
    filter — the error fires lazily at execution time, exactly like the
    engines it emulates.  At scale the guard is one count-window keyed
    by the target id over the already-shuffled join output (a lakehouse
    MERGE, e.g. Delta, performs the same multi-match detection
    natively).

    Known hazard (ADVICE r10, acceptable for this local emulation
    harness): the tag is ``monotonically_increasing_id()``, which is
    nondeterministic — on a cluster with task-failure retries, a
    shuffle-map retry can regenerate DIFFERENT tids for rows other
    reducers already consumed, corrupting the per-target match count
    (spurious or missed cardinality errors).  No deterministic
    substitute exists for an arbitrary view (any row-identity would
    need a key we don't have); if this rewrite ever runs on a flaky
    cluster, ``localCheckpoint()``/persist the tid-tagged target
    subquery first so the ids are fixed before the join consumes them.
    """
    m = parse_merge(stmt)
    tcols = spark.table(m.target).columns
    flag = "__merge_matched"

    # -- update/delete branch: target LEFT JOIN flagged source ------------
    # SQL MERGE applies the FIRST satisfied WHEN MATCHED clause; the
    # guards chain NOT-earlier-cond conjunctions to preserve that order.
    guards: list[str] = []
    prior: list[str] = []
    for kind, cond, _ in m.matched:
        g = [f"{m.salias}.{flag}"]
        g += [f"NOT coalesce(({c}), FALSE)" for c in prior]
        if cond is not None:
            g.append(f"coalesce(({cond}), FALSE)")
            prior.append(cond)
        else:
            prior.append("TRUE")
        guards.append(" AND ".join(g))

    sel = []
    for c in tcols:
        branches = []
        for (kind, _, assigns), guard in zip(m.matched, guards):
            if kind == "update" and c in assigns:
                branches.append(f"WHEN {guard} THEN ({assigns[c]})")
        if branches:
            sel.append(
                f"CASE {' '.join(branches)} ELSE {m.talias}.{c} END AS {c}")
        else:
            sel.append(f"{m.talias}.{c} AS {c}")
    del_guards = [g for (k, _, _), g in zip(m.matched, guards)
                  if k == "delete"]

    if m.matched:
        # Multi-match cardinality guard (see docstring): count matched
        # source rows per tid-tagged target row; any count > 1 raises
        # the standard "multiple rows of source match" error at
        # execution time via assert_true.  The delete filter moves to
        # the outer query so the window counts rows a delete would
        # remove (double-delete is equally an ANSI cardinality error).
        inner_sel = sel + [
            f"COUNT({m.salias}.{flag}) OVER "
            f"(PARTITION BY {m.talias}.__merge_tid) AS __merge_cnt",
        ]
        if del_guards:
            inner_sel.append(
                "coalesce(" +
                " OR ".join(f"({g})" for g in del_guards) +
                ", FALSE) AS __merge_del")
        outer_filters = [
            f"assert_true(__merge_cnt <= 1, 'MERGE into {m.target}: "
            f"multiple rows of the source match one target row') IS NULL"
        ]
        if del_guards:
            outer_filters.append("NOT __merge_del")
        parts = [
            f"WITH __merge_source AS ({m.source_sql})",
            "SELECT " + ", ".join(tcols) + " FROM (",
            "SELECT " + ", ".join(inner_sel),
            f"FROM (SELECT *, monotonically_increasing_id() AS __merge_tid "
            f"FROM {m.target}) AS {m.talias}",
            f"LEFT JOIN (SELECT *, TRUE AS {flag} FROM __merge_source) "
            f"AS {m.salias}",
            f"ON {m.on_cond}",
            ") WHERE " + " AND ".join(outer_filters),
        ]
    else:
        # Insert-only MERGE: target rows pass through untouched — no
        # join (and no guard) needed on the existing-rows branch.
        parts = [
            f"WITH __merge_source AS ({m.source_sql})",
            "SELECT " + ", ".join(tcols),
            f"FROM {m.target} AS {m.talias}",
        ]

    # -- insert branch: source LEFT ANTI JOIN target ----------------------
    # Like the matched side, only the FIRST satisfied WHEN NOT MATCHED
    # clause applies to a source row: each branch's filter conjoins
    # NOT-earlier-cond guards so a row satisfying two clauses inserts
    # once, not once per clause.
    ins_prior: list[str] = []
    for cond, cols, vals in m.not_matched:
        assigns = dict(zip(cols, vals))
        ins_sel = ", ".join(
            f"({assigns[c]}) AS {c}" if c in assigns else f"NULL AS {c}"
            for c in tcols)
        ins_guards = [f"NOT coalesce(({c}), FALSE)" for c in ins_prior]
        if cond is not None:
            ins_guards.append(f"coalesce(({cond}), FALSE)")
            ins_prior.append(cond)
        else:
            ins_prior.append("TRUE")
        parts += [
            "UNION ALL",
            f"SELECT {ins_sel}",
            f"FROM (SELECT * FROM __merge_source) AS {m.salias}",
            f"LEFT ANTI JOIN {m.target} AS {m.talias} ON {m.on_cond}",
            f"WHERE {' AND '.join(ins_guards)}" if ins_guards else "",
        ]
    return m.target, "\n".join(p for p in parts if p)


# --------------------------------------------------------------------------
# Statement execution
# --------------------------------------------------------------------------


def _run(spark: SparkSession, sql: str, args: dict[str, Any] | None):
    return spark.sql(sql, args=args) if args else spark.sql(sql)


def _exec_declare(spark, stmt, args):
    idef = _find_keyword(stmt, "DEFAULT")
    head = (stmt if idef < 0 else stmt[:idef]).strip()
    default = None if idef < 0 else stmt[idef + len("DEFAULT"):].strip()
    toks = head.split()
    i = 1  # skip DECLARE
    if i + 1 < len(toks) and toks[i].upper() == "OR" \
            and toks[i + 1].upper() == "REPLACE":
        i += 2
    if i < len(toks) and toks[i].upper() == "VARIABLE":
        i += 1
    name = toks[i]
    vtype = " ".join(toks[i + 1:])
    if default is not None and re.search(r"\bSELECT\b", default, re.I):
        # Spark rejects subquery DEFAULTs: declare typed-null, then
        # SET VAR evaluates the scalar subquery (BigQuery semantics).
        if not vtype:
            raise ValueError(
                f"DECLARE {name}: subquery DEFAULT needs an explicit type")
        _run(spark, f"DECLARE OR REPLACE {name} {vtype} DEFAULT NULL", None)
        _run(spark, f"SET VAR {name} = ({default})", args)
    else:
        tail = f" DEFAULT {default}" if default is not None else ""
        _run(spark, f"DECLARE OR REPLACE {name} {vtype}{tail}", args)


def _null_of(df: DataFrame, col: str):
    return F.lit(None).cast(df.schema[col].dataType).alias(col)


def _exec_insert(spark, stmt, args):
    m = re.match(r"INSERT\s+INTO\s+(\S+)\s*(.*)$", stmt, re.I | re.S)
    if m is None or not m.group(2).strip():
        raise ValueError(f"cannot parse INSERT statement: {stmt[:80]!r}")
    target, rest = m.group(1).strip("`"), m.group(2).strip()
    cols: list[str] | None = None
    if rest.startswith("("):
        # a collist only if the paren content is not itself a query
        close = 0
        depth = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    close = i
                    break
        inner = rest[1:close].strip()
        if _first_word(inner) not in ("SELECT", "WITH", "VALUES"):
            cols = [c.strip().strip("`") for c in inner.split(",")]
            rest = rest[close + 1:].strip()
    tdf = spark.table(target)
    ins = _run(spark, rest, args)
    expect = cols if cols else tdf.columns
    if len(ins.columns) != len(expect):
        raise ValueError(
            f"INSERT INTO {target}: {len(expect)} target columns but the "
            f"source produces {len(ins.columns)} (reference bug §2.11 #1 "
            f"is exactly this arity mismatch — rejected, not guessed)")
    ins = ins.toDF(*expect)
    proj = [F.col(c) if c in ins.columns else _null_of(tdf, c)
            for c in tdf.columns]
    tdf.unionByName(ins.select(*proj)).createOrReplaceTempView(target)


def _exec_delete(spark, stmt):
    m = re.match(r"DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.*))?$",
                 stmt, re.I | re.S)
    if m is None:
        raise ValueError(f"cannot parse DELETE statement: {stmt[:80]!r}")
    target, cond = m.group(1).strip("`"), (m.group(2) or "TRUE").strip()
    if not cond:
        raise ValueError(f"DELETE FROM {target}: empty WHERE condition")
    spark.table(target).filter(
        F.expr(f"({cond}) IS NOT TRUE")).createOrReplaceTempView(target)


def _exec_update(spark, stmt, args):
    m = re.match(r"UPDATE\s+(\S+)(?:\s+AS)?\s*(\w+)?\s+SET\s+(.*)$",
                 stmt, re.I | re.S)
    if m is None:
        raise ValueError(f"cannot parse UPDATE statement: {stmt[:80]!r}")
    target = m.group(1).strip("`")
    alias = m.group(2) or target
    rest = m.group(3)
    iw = _find_keyword(rest, "WHERE")
    cond = "TRUE" if iw < 0 else rest[iw + len("WHERE"):].strip()
    if not cond:
        raise ValueError(f"UPDATE {target}: empty WHERE condition")
    assigns = _split_assignments(rest if iw < 0 else rest[:iw])
    if not assigns or any(not e for e in assigns.values()):
        raise ValueError(
            f"UPDATE {target}: malformed SET assignment list")
    tdf = spark.table(target)
    sel = []
    for c in tdf.columns:
        if c in assigns:
            sel.append(f"CASE WHEN coalesce(({cond}), FALSE) "
                       f"THEN ({assigns[c]}) ELSE {alias}.{c} END AS {c}")
        else:
            sel.append(f"{alias}.{c} AS {c}")
    _run(spark,
         f"SELECT {', '.join(sel)} FROM {target} AS {alias}",
         args).createOrReplaceTempView(target)


def _exec_merge(spark, stmt, args):
    target, sql = rewrite_merge(spark, stmt)
    _run(spark, sql, args).createOrReplaceTempView(target)


def run_sql_script(
    spark: SparkSession,
    script: str,
    *,
    params: dict[str, str] | None = None,
    args: dict[str, Any] | None = None,
) -> DataFrame | None:
    """Execute a ``;``-separated SQL script statement-by-statement.

    Returns the DataFrame of the last SELECT-like statement (or None if
    the script ends with a mutation).  ``params``/``args`` follow
    ``run_sql`` (S4): ``{{key}}`` identifier splicing + native named
    parameter binding.
    """
    text = strip_comments(substitute_params(script, params))
    result: DataFrame | None = None
    for stmt in split_statements(text):
        word = _first_word(stmt)
        if word == "DECLARE":
            _exec_declare(spark, stmt, args)
        elif word == "MERGE":
            _exec_merge(spark, stmt, args)
        elif word == "INSERT":
            _exec_insert(spark, stmt, args)
        elif word == "DELETE":
            _exec_delete(spark, stmt)
        elif word == "UPDATE":
            _exec_update(spark, stmt, args)
        elif word == "TRUNCATE":
            mt = re.match(r"TRUNCATE\s+TABLE\s+(\S+)", stmt, re.I)
            if mt is None:
                raise ValueError(
                    f"cannot parse TRUNCATE statement: {stmt[:80]!r}")
            t = mt.group(1)
            spark.table(t.strip("`")).filter(
                F.lit(False)).createOrReplaceTempView(t.strip("`"))
        elif word in ("SELECT", "WITH", "VALUES", "TABLE"):
            result = _run(spark, stmt, args)
        else:
            # SET VAR, CREATE VIEW, CACHE, ... — Spark handles natively
            _run(spark, stmt, args)
    return result


def run_sql_script_file(
    spark: SparkSession,
    path: str,
    *,
    params: dict[str, str] | None = None,
    args: dict[str, Any] | None = None,
) -> DataFrame | None:
    with open(path) as f:
        return run_sql_script(spark, f.read(), params=params, args=args)
