"""Registered BPE queries (plans/bpe_queries.py): the Spark merge
table must equal an independent pure-Python trainer's on the real
fixture corpus, and the encode census must be consistent with it."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.bpe_queries import (
    N_MERGES,
    bpe_encode_census,
    bpe_train_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_train(texts: list[str], n_merges: int):
    """Independent reference trainer (greedy left-to-right merges,
    count-desc then pair-lexicographic tie-break, min count 2) — the
    same evaluator ``tests/test_bpe.py`` proves the operator against,
    here driven at query grain on the fixture corpus."""
    words = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((left, right, n))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges, vocab


def test_train_merges_match_pure_python_reference(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text").collect()
    ]
    want, _ = _py_train(texts, N_MERGES)
    got = [
        (r.left_sym, r.right_sym, r.n)
        for r in bpe_train_merges(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == want


def test_encode_census_matches_reference_vocab(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text").collect()
    ]
    _, vocab = _py_train(texts, N_MERGES)
    want: Counter = Counter()
    for syms, f in vocab.items():
        for tok in syms:
            want[tok] += f
    got = {
        r.token: r.n_tokens
        for r in bpe_encode_census(spark, SF_DIR).collect()
    }
    assert got == dict(want)


def test_merge_ranks_are_contiguous_and_counts_decrease_weakly_valid(spark):
    df = bpe_train_merges(spark, SF_DIR)
    rows = df.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.n >= 2 for r in rows)
    # multi-char tokens actually formed (the table is non-trivial)
    enc = bpe_encode_census(spark, SF_DIR)
    assert enc.filter(F.length("token") >= 2).count() > 0


def test_encode_oracle_survives_early_stop():
    """ADVICE r14: a corpus with fewer than N_MERGES learnable merges
    must NOT empty the oracle's later word tables — each merge round
    with an empty best-pair is a no-op (LEFT JOIN), matching the Spark
    trainer's break.  Corpus: 'ab' x2 learns exactly one merge (a,b);
    the census must be {'ab': 2}, not zero rows."""
    import duckdb

    from star_schema_etl_airflow_spark.plans.bpe_queries import (
        BPE_ENCODE_ORACLE,
        BPE_TRAIN_ORACLE,
    )
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 'ab ab' AS text")
    census = dict(con.execute(BPE_ENCODE_ORACLE).fetchall())
    assert census == {"ab": 2}
    merges = con.execute(BPE_TRAIN_ORACLE).fetchall()
    assert [(r[1], r[2], r[3]) for r in merges] == [("a", "b", 2)]
