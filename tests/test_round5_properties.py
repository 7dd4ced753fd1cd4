"""Property-based invariants for the round-5 operators: both edit-
distance join variants vs a brute-force DP reference, counting IVM vs
the direct aggregate under arbitrary insert/delete sequences, and
snapshot-table consistency under arbitrary write/rollback/vacuum
programs.  Spark work per example is bounded and example counts capped
(repo convention, see test_scd2_properties.py)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

# ------------------------------------------------------------ edit distance

ALPHABET = "abcx"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def _expected_pairs(strings: list[str], k: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            d = _lev(strings[i], strings[j])
            if d <= k:
                out.add((i, j, d))
    return out


strings_strategy = st.lists(
    st.text(alphabet=ALPHABET, min_size=1, max_size=9),
    min_size=2, max_size=10, unique=True,
)


@settings(max_examples=12, deadline=None)
@given(strings=strings_strategy, k=st.integers(1, 3))
def test_edit_distance_join_variants_match_brute_force(spark, strings, k):
    """Both the length-band and ED-Join q-gram variants must return
    EXACTLY the brute-force pair set for arbitrary short strings —
    including the q-gram fallback regime (strings shorter than the
    gram cutoff) and distances right at the threshold."""
    from star_schema_etl_airflow_spark.plans.fuzzy_join import (
        edit_distance_join,
        edit_distance_join_qgram,
    )

    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    expected = _expected_pairs(strings, k)
    band = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s", k).collect()
    }
    assert band == expected
    qgram = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join_qgram(df, "id", "s", k).collect()
    }
    assert qgram == expected


# ------------------------------------------------------------- counting IVM

batches_strategy = st.lists(
    st.tuples(
        st.sampled_from([+1, -1]),
        st.lists(
            st.tuples(st.sampled_from("pq"), st.integers(1, 5)),
            min_size=1, max_size=6,
        ),
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(batches=batches_strategy)
def test_counting_ivm_equals_direct_aggregate(spark, batches):
    """For ANY sequence of insert/delete batches whose net multiplicity
    is non-negative, the counting-IVM fold equals the direct aggregate
    over the net multiset; groups netting to zero vanish."""
    from star_schema_etl_airflow_spark.operators.ivm import (
        ivm_counting_merge,
        ivm_counting_state,
    )

    # repair the program so deletes never exceed what exists (the
    # operator's referential contract): track the net multiset
    net: dict[tuple[str, int], int] = {}
    states = []
    for mult, rows in batches:
        if mult == -1:
            rows = [r for r in rows if net.get(r, 0) > 0]
            if not rows:
                continue
        for r in rows:
            net[r] = net.get(r, 0) + mult
        df = spark.createDataFrame(rows, "grp string, v int")
        states.append(ivm_counting_state(df, ["grp"], "v", mult))
    if not states:
        return
    got = {
        (r.grp, r.mult, str(r.vsum))
        for r in ivm_counting_merge(*states).collect()
    }
    expected = {}
    for (g, v), m in net.items():
        if m:
            cnt, s = expected.get(g, (0, 0))
            expected[g] = (cnt + m, s + m * v)
    expected_set = {
        (g, cnt, f"{s}.00") for g, (cnt, s) in expected.items() if cnt
    }
    assert got == expected_set


# ---------------------------------------------------------------- snapshots

ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("write"), st.integers(0, 99)),
        st.tuples(st.just("rollback"), st.integers(1, 6)),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    ),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(ops=ops_strategy)
def test_snapshot_program_consistency(spark, tmp_path_factory, ops):
    """For ANY program of write/rollback/vacuum ops, the table must
    always read back the payload of the last surviving version, history
    must match the model, and retained versions stay readable."""
    from star_schema_etl_airflow_spark.sources.snapshots import (
        history,
        read_snapshot,
        rollback,
        vacuum,
        write_snapshot,
    )

    d = str(tmp_path_factory.mktemp("snap"))
    model: list[tuple[int, int]] = []  # (version, payload)
    for op, arg in ops:
        if op == "write":
            v = write_snapshot(
                spark.createDataFrame([(arg,)], "payload int"), d
            )
            assert not model or v > model[-1][0]  # never reuse numbers
            model.append((v, arg))
        elif op == "rollback":
            if any(v == arg for v, _ in model):
                rollback(d, arg)
                model = [e for e in model if e[0] <= arg]
        else:  # vacuum
            vacuum(d, keep_last=arg)
            model = model[-arg:]
    assert history(d) == [v for v, _ in model]
    if model:
        assert read_snapshot(spark, d).first().payload == model[-1][1]
        for v, payload in model:
            assert read_snapshot(spark, d, v).first().payload == payload
