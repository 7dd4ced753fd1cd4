"""Property sweep over the MERGE / script grammar (r9 verdict task 7).

``parse_merge`` / ``run_sql_script`` are regex-driven; this corpus pins
their accept-vs-reject boundary the same way the codec fuzz hardened
the decoders: a seeded generator composes MERGE statements across
clause orderings and counts, aliasing forms, nested subquery sources,
quoted identifiers, keyword casing, comment placement, and
keyword-bearing string literals — every ACCEPTED statement is executed
through ``run_sql_script`` and compared row-for-row against an
independent pure-Python ANSI-MERGE evaluator (DuckDB 1.0 has no MERGE,
so the oracle is semantic, not dialectal), and every REJECTED statement
must raise a clean ValueError without mutating the target view.
"""

from __future__ import annotations

import random

import pytest

from star_schema_etl_airflow_spark.sources.sql_script import (
    parse_merge,
    run_sql_script,
    split_statements,
    strip_comments,
)

# --------------------------------------------------------------------------
# Reference evaluator: ANSI MERGE over lists of dicts.
#
# Conditions and value expressions are tiny ASTs rendered to SQL by the
# generator and evaluated in Python here, so both engines interpret one
# shared structure — the fuzz tests the PARSER/REWRITE, not SQL
# expression semantics (which Spark itself provides downstream).
# --------------------------------------------------------------------------

TCOLS = ("k", "v", "tag")


def _ev(expr, t=None, s=None):
    kind = expr[0]
    if kind == "lit":
        return expr[1]
    if kind == "col":
        row = t if expr[1] == "t" else s
        return row[expr[2]]
    if kind == "add":
        return _ev(expr[1], t, s) + _ev(expr[2], t, s)
    if kind == "cmp":
        a, op, b = _ev(expr[1], t, s), expr[2], _ev(expr[3], t, s)
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b,
                "=": a == b, "<>": a != b}[op]
    raise AssertionError(kind)


def _render(expr, talias, salias):
    kind = expr[0]
    if kind == "lit":
        v = expr[1]
        return f"'{v}'" if isinstance(v, str) else str(v)
    if kind == "col":
        alias = talias if expr[1] == "t" else salias
        return f"{alias}.{expr[2]}"
    if kind == "add":
        return (f"({_render(expr[1], talias, salias)} + "
                f"{_render(expr[2], talias, salias)})")
    if kind == "cmp":
        return (f"{_render(expr[1], talias, salias)} {expr[2]} "
                f"{_render(expr[3], talias, salias)}")
    raise AssertionError(kind)


def eval_merge(target, source, matched, not_matched):
    """ANSI semantics over row dicts.  ``matched``: list of
    (kind, cond_ast|None, {col: ast}); ``not_matched``: list of
    (cond_ast|None, {col: ast}).  Returns new target rows or raises
    on a multi-match with matched clauses present (the implementation's
    documented BigQuery-style contract)."""
    out = []
    for t in target:
        ms = [s for s in source if s["k"] == t["k"]]
        if len(ms) > 1 and matched:
            raise ValueError("multiple rows of the source match")
        if not ms:
            out.append(dict(t))
            continue
        s = ms[0]
        applied = False
        for kind, cond, assigns in matched:
            if cond is None or _ev(cond, t, s):
                if kind == "update":
                    row = dict(t)
                    row.update({c: _ev(a, t, s) for c, a in assigns.items()})
                    out.append(row)
                # delete: drop the row
                applied = True
                break
        if not applied:
            out.append(dict(t))
    tks = {t["k"] for t in target}
    for s in source:
        if s["k"] in tks:
            continue
        for cond, assigns in not_matched:
            if cond is None or _ev(cond, None, s):
                row = {c: None for c in TCOLS}
                row.update({c: _ev(a, None, s) for c, a in assigns.items()})
                out.append(row)
                break
    return out


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------

TARGET_ROWS = [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"),
               (4, 40, "d"), (5, 50, "e")]
# unique source keys — the accept path must never trip the guard
SOURCE_ROWS = [(2, 200), (3, -1), (4, 44), (6, 600), (7, -7)]

CONDS = [
    ("cmp", ("col", "s", "v"), "<", ("lit", 0)),
    ("cmp", ("col", "s", "v"), ">=", ("lit", 100)),
    ("cmp", ("col", "t", "v"), ">", ("lit", 25)),
    ("cmp", ("add", ("col", "t", "v"), ("col", "s", "v")), "<>",
     ("lit", 230)),
    None,
]
S_CONDS = [  # source-only (legal in NOT MATCHED)
    ("cmp", ("col", "s", "v"), ">", ("lit", 0)),
    ("cmp", ("col", "s", "k"), ">=", ("lit", 7)),
    None,
]
UPDATES = [
    {"v": ("col", "s", "v")},
    {"v": ("add", ("col", "t", "v"), ("col", "s", "v"))},
    {"tag": ("lit", "x; WHEN MATCHED THEN -- not a clause"),
     "v": ("lit", 7)},
]
INSERTS = [
    {"k": ("col", "s", "k"), "v": ("col", "s", "v")},
    {"k": ("col", "s", "k"), "v": ("add", ("col", "s", "v"), ("lit", 1)),
     "tag": ("lit", "new")},
]

COMMENTS = ["/* c; WHEN MATCHED */", "-- line; MERGE\n", " ", "\n\t"]


def _ws(rng):
    return rng.choice(COMMENTS) if rng.random() < 0.3 else " "


def _kw(rng, word):
    return word.lower() if rng.random() < 0.3 else word


def gen_merge(rng):
    """Returns (sql_text, matched, not_matched) with 1-2 matched and
    0-2 not-matched clauses in random order, noise interleaved."""
    talias = rng.choice(["t", "tt", None])
    salias = rng.choice(["s", "src"])
    ta = talias or "ssr_fuzz_t"
    matched, not_matched = [], []
    for _ in range(rng.randint(0, 2)):
        kind = rng.choice(["update", "update", "delete"])
        cond = rng.choice(CONDS)
        assigns = rng.choice(UPDATES) if kind == "update" else {}
        matched.append((kind, cond, assigns))
    for _ in range(rng.randint(0, 2)):
        not_matched.append((rng.choice(S_CONDS), rng.choice(INSERTS)))
    if not matched and not not_matched:
        matched.append(("update", None, UPDATES[0]))
    # drop conditionless clauses that shadow a later clause of the same
    # side (the first-match semantics make later ones dead — fine — but
    # keep at most one unconditional clause per side, like real SQL)
    src_rows = ", ".join(f"({k}, {v})" for k, v in SOURCE_ROWS)
    src_inner = (f"SELECT{_ws(rng)}* FROM VALUES {src_rows} AS "
                 f"__vals(k, v)")
    if rng.random() < 0.4:  # nested subquery source
        src_inner = f"SELECT k, v FROM ({src_inner}) AS __inner"
    src = f"({src_inner}){_ws(rng)}{rng.choice(['AS ', ''])}{salias}"
    tgt_name = "`ssr_fuzz_t`" if rng.random() < 0.3 else "ssr_fuzz_t"
    parts = [
        f"{_kw(rng, 'MERGE')}{_ws(rng)}{_kw(rng, 'INTO')} {tgt_name}",
    ]
    if talias:
        parts.append(f"{rng.choice(['AS ', ''])}{talias}")
    parts += [
        f"{_kw(rng, 'USING')}{_ws(rng)}{src}",
        f"{_kw(rng, 'ON')} {ta}.k = {salias}.k",
    ]
    for kind, cond, assigns in matched:
        head = f"{_kw(rng, 'WHEN')} {_kw(rng, 'MATCHED')}"
        if cond is not None:
            head += f" AND {_render(cond, ta, salias)}"
        if kind == "update":
            sets = ", ".join(
                f"{c} = {_render(a, ta, salias)}"
                for c, a in assigns.items())
            parts.append(f"{head} {_kw(rng, 'THEN')}{_ws(rng)}"
                         f"UPDATE SET {sets}")
        else:
            parts.append(f"{head} {_kw(rng, 'THEN')} DELETE")
    for cond, assigns in not_matched:
        head = f"{_kw(rng, 'WHEN')} NOT {_kw(rng, 'MATCHED')}"
        if cond is not None:
            head += f" AND {_render(cond, ta, salias)}"
        cols = ", ".join(assigns)
        vals = ", ".join(_render(a, ta, salias) for a in assigns.values())
        parts.append(f"{head} THEN{_ws(rng)}INSERT ({cols}) "
                     f"VALUES ({vals})")
    return _ws(rng).join(parts), matched, not_matched


def _norm(rows):
    return sorted(
        tuple(r[c] for c in TCOLS) for r in rows
    )


N_CASES = 40


def test_merge_fuzz_accept_matches_reference(spark):
    rng = random.Random(20260815)
    src = [{"k": k, "v": v} for k, v in SOURCE_ROWS]
    tgt = [dict(zip(TCOLS, r)) for r in TARGET_ROWS]
    for case in range(N_CASES):
        sql, matched, not_matched = gen_merge(rng)
        spark.createDataFrame(
            TARGET_ROWS, "k INT, v INT, tag STRING"
        ).createOrReplaceTempView("ssr_fuzz_t")
        expect = eval_merge(tgt, src, matched, not_matched)
        out = run_sql_script(
            spark, sql + ";\nSELECT * FROM ssr_fuzz_t")
        got = [r.asDict() for r in out.collect()]
        assert _norm(got) == _norm(expect), f"case {case}:\n{sql}"


REJECTS = [
    # missing ON
    "MERGE INTO t USING s WHEN MATCHED THEN DELETE",
    # missing THEN
    "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED DELETE",
    # matched INSERT is not a thing
    "MERGE INTO t USING s ON t.k = s.k "
    "WHEN MATCHED THEN INSERT (k) VALUES (s.k)",
    # not-matched UPDATE is not a thing
    "MERGE INTO t USING s ON t.k = s.k "
    "WHEN NOT MATCHED THEN UPDATE SET v = s.v",
    # arity mismatch
    "MERGE INTO t USING s ON t.k = s.k "
    "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)",
    # INSERT without collist (unsupported restricted grammar)
    "MERGE INTO t USING s ON t.k = s.k "
    "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v)",
    # garbage action
    "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPSERT",
    # no WHEN clause at all
    "MERGE INTO t USING s ON t.k = s.k",
]


@pytest.mark.parametrize("stmt", REJECTS)
def test_merge_fuzz_rejects_raise_cleanly(spark, stmt):
    spark.createDataFrame(
        TARGET_ROWS, "k INT, v INT, tag STRING"
    ).createOrReplaceTempView("ssr_fuzz_t")
    before = _norm(r.asDict() for r in spark.table("ssr_fuzz_t").collect())
    with pytest.raises(ValueError):
        run_sql_script(spark, stmt.replace(" t ", " ssr_fuzz_t "))
    after = _norm(r.asDict() for r in spark.table("ssr_fuzz_t").collect())
    assert before == after, "rejected statement mutated the target view"


# --------------------------------------------------------------------------
# Lexer properties: strings and comments never leak statement breaks
# --------------------------------------------------------------------------


def test_lexer_fuzz_split_and_comments():
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randint(1, 5)
        stmts = []
        for i in range(n):
            lit = rng.choice(
                ["';'", "'-- x'", "'/* y */'", "'it''s; fine'", "1"])
            cmt = rng.choice(
                ["", " -- tail; SELECT 9\n", " /* b; lock */ "])
            stmts.append(f"SELECT {lit} AS c{i}{cmt}")
        script = ";".join(stmts)
        out = split_statements(strip_comments(script))
        assert len(out) == n, script
        for i, s in enumerate(out):
            assert s.startswith("SELECT"), s
            assert "-- tail" not in s and "/* b" not in s


# --------------------------------------------------------------------------
# DELETE / UPDATE / INSERT rewrites (r10 verdict task 8): the same
# accept-vs-reject + pure-Python reference evaluator pattern, extended
# to the script runner's other three statement rewrites.  Scripts chain
# 2-5 random DML statements against one target view so the rewrites are
# exercised COMPOSED (each statement reads the previous one's view
# swap), with SQL three-valued logic modeled in the evaluator (INSERTed
# NULLs flow into later WHERE conditions: DELETE keeps rows whose
# condition is NULL, UPDATE applies only where it is TRUE).
# --------------------------------------------------------------------------


def _ev3(expr, row):
    """Three-valued evaluation over one row dict (None = SQL NULL)."""
    kind = expr[0]
    if kind == "lit":
        return expr[1]
    if kind == "col":
        return row[expr[2]]
    if kind == "add":
        a, b = _ev3(expr[1], row), _ev3(expr[2], row)
        return None if a is None or b is None else a + b
    if kind == "cmp":
        a, b = _ev3(expr[1], row), _ev3(expr[3], row)
        if a is None or b is None:
            return None
        op = expr[2]
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b,
                "=": a == b, "<>": a != b}[op]
    raise AssertionError(kind)


def _render1(expr, alias):
    """Render a single-table AST; ``alias=None`` → bare column names
    (DELETE conditions run on the table itself, no alias in scope)."""
    kind = expr[0]
    if kind == "lit":
        v = expr[1]
        if v is None:
            return "NULL"
        return f"'{v}'" if isinstance(v, str) else str(v)
    if kind == "col":
        return expr[2] if alias is None else f"{alias}.{expr[2]}"
    if kind == "add":
        return f"({_render1(expr[1], alias)} + {_render1(expr[2], alias)})"
    if kind == "cmp":
        return (f"{_render1(expr[1], alias)} {expr[2]} "
                f"{_render1(expr[3], alias)}")
    raise AssertionError(kind)


DML_CONDS = [
    ("cmp", ("col", "t", "v"), "<", ("lit", 25)),
    ("cmp", ("col", "t", "k"), ">=", ("lit", 4)),
    ("cmp", ("add", ("col", "t", "v"), ("col", "t", "k")), "<>",
     ("lit", 23)),
    ("cmp", ("col", "t", "tag"), "=", ("lit", "b")),
    None,
]
DML_SETS = [
    {"v": ("add", ("col", "t", "v"), ("lit", 100))},
    {"tag": ("lit", "u; WHERE v < 0 -- not a clause"),
     "v": ("lit", 9)},
    {"v": ("col", "t", "k")},
]
# (collist or None, rows of full-AST values matching the collist)
DML_INSERTS = [
    (["k", "v"], [[("lit", 101), ("lit", 7)],
                  [("lit", 102), ("lit", None)]]),
    (["k", "v", "tag"], [[("lit", 103), ("lit", -3), ("lit", "ins")]]),
    (None, [[("lit", 104), ("lit", 12), ("lit", "full; not a cut")]]),
]


def gen_dml(rng, seq):
    """One random DML statement: (sql_text, python_effect) where
    python_effect(rows) -> rows."""
    kind = rng.choice(["delete", "update", "insert"])
    tgt = "`ssr_fuzz_t`" if rng.random() < 0.3 else "ssr_fuzz_t"
    if kind == "delete":
        cond = rng.choice(DML_CONDS)
        sql = f"{_kw(rng, 'DELETE')}{_ws(rng)}{_kw(rng, 'FROM')} {tgt}"
        if cond is not None:
            sql += f"{_ws(rng)}{_kw(rng, 'WHERE')} {_render1(cond, None)}"

        def eff(rows, cond=cond):
            if cond is None:
                return []
            return [r for r in rows if _ev3(cond, r) is not True]
        return sql, eff
    if kind == "update":
        alias = rng.choice([None, "u"])
        a = alias or tgt.strip("`")
        assigns = rng.choice(DML_SETS)
        cond = rng.choice(DML_CONDS)
        sets = ", ".join(
            f"{c} = {_render1(e, alias)}" for c, e in assigns.items())
        sql = f"{_kw(rng, 'UPDATE')} {tgt}"
        if alias:
            sql += f" {rng.choice(['AS ', ''])}{alias}"
        sql += f"{_ws(rng)}{_kw(rng, 'SET')} {sets}"
        if cond is not None:
            sql += f"{_ws(rng)}{_kw(rng, 'WHERE')} {_render1(cond, alias)}"

        def eff(rows, assigns=assigns, cond=cond):
            out = []
            for r in rows:
                if cond is None or _ev3(cond, r) is True:
                    new = dict(r)
                    new.update(
                        {c: _ev3(e, r) for c, e in assigns.items()})
                    out.append(new)
                else:
                    out.append(dict(r))
            return out
        return sql, eff
    cols, vrows = rng.choice(DML_INSERTS)
    vals = ", ".join(
        "(" + ", ".join(_render1(e, None) for e in vr) + ")"
        for vr in vrows)
    collist = f" ({', '.join(cols)})" if cols else ""
    body = f"VALUES{_ws(rng)}{vals}"
    if rng.random() < 0.4:
        width = len(cols) if cols else len(TCOLS)
        names = ", ".join(f"c{i}" for i in range(width))
        body = f"SELECT * FROM (VALUES {vals}) AS __v({names})"
    sql = (f"{_kw(rng, 'INSERT')}{_ws(rng)}{_kw(rng, 'INTO')} {tgt}"
           f"{collist}{_ws(rng)}{body}")

    def eff(rows, cols=cols, vrows=vrows):
        out = [dict(r) for r in rows]
        names = cols if cols else list(TCOLS)
        for vr in vrows:
            row = {c: None for c in TCOLS}
            row.update({c: _ev3(e, {}) for c, e in zip(names, vr)})
            out.append(row)
        return out
    return sql, eff


def test_dml_fuzz_scripts_match_reference(spark):
    rng = random.Random(20260816)
    for case in range(N_CASES):
        n = rng.randint(2, 5)
        stmts, effects = zip(*(gen_dml(rng, i) for i in range(n)))
        spark.createDataFrame(
            TARGET_ROWS, "k INT, v INT, tag STRING"
        ).createOrReplaceTempView("ssr_fuzz_t")
        rows = [dict(zip(TCOLS, r)) for r in TARGET_ROWS]
        for eff in effects:
            rows = eff(rows)
        script = ";\n".join(stmts) + ";\nSELECT * FROM ssr_fuzz_t"
        out = run_sql_script(spark, script)
        got = [r.asDict() for r in out.collect()]
        assert _norm(got) == _norm(rows), f"case {case}:\n{script}"


DML_REJECTS = [
    "DELETE ssr_fuzz_t WHERE v < 0",                      # missing FROM
    "DELETE FROM ssr_fuzz_t WHERE",                       # empty WHERE
    "UPDATE ssr_fuzz_t v = 5",                            # missing SET
    "UPDATE ssr_fuzz_t SET v = 5 WHERE",                  # empty WHERE
    "UPDATE ssr_fuzz_t SET v, tag",                       # no assignment
    "INSERT ssr_fuzz_t VALUES (1, 2, 'x')",               # missing INTO
    "INSERT INTO ssr_fuzz_t",                             # no source
    "INSERT INTO ssr_fuzz_t (k, v) VALUES (1, 2, 'x')",   # collist arity
    "INSERT INTO ssr_fuzz_t SELECT 1, 2",                 # target arity
    "TRUNCATE ssr_fuzz_t",                                # missing TABLE
]


@pytest.mark.parametrize("stmt", DML_REJECTS)
def test_dml_fuzz_rejects_raise_cleanly(spark, stmt):
    spark.createDataFrame(
        TARGET_ROWS, "k INT, v INT, tag STRING"
    ).createOrReplaceTempView("ssr_fuzz_t")
    before = _norm(r.asDict() for r in spark.table("ssr_fuzz_t").collect())
    with pytest.raises(ValueError):
        run_sql_script(spark, stmt)
    after = _norm(r.asDict() for r in spark.table("ssr_fuzz_t").collect())
    assert before == after, "rejected statement mutated the target view"
