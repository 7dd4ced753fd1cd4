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
