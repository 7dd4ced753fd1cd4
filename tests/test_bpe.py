"""Distributed BPE training vs an independent pure-Python reference:
exact merge-table equality on the documents fixture, encode/train
consistency, and the greedy non-overlap convention."""

from __future__ import annotations

from collections import Counter

from star_schema_etl_airflow_spark.operators.bpe import (
    encode_words,
    train_bpe,
    word_frequencies,
)

SF_DIR = "/root/testdata/sf0.001"


# --- pure-Python reference (independent implementation) --------------------

def _ref_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.split():
            if w:
                c[w] += 1
    return c


def _ref_apply(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    freqs = {
        tuple(w): n for w, n in _ref_word_freqs(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in freqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        freqs = {
            _ref_apply(s, best): n for s, n in freqs.items()
        }
    return merges


def test_train_matches_reference_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = train_bpe(docs, n_merges=12)
    assert got == _ref_train(texts, 12)
    assert len(got) == 12  # the fixture has at least 12 productive merges


def test_encode_matches_reference_application(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_bpe(docs, n_merges=8)
    words = word_frequencies(docs).limit(50)
    enc = {r.word: tuple(r.tokens) for r in encode_words(words, merges).collect()}
    for w, toks in enc.items():
        syms = tuple(w)
        for m in merges:
            syms = _ref_apply(syms, m)
        assert toks == syms, w
    # tokens re-join to the original word (lossless segmentation)
    assert all("".join(t) == w for w, t in enc.items())


def test_greedy_non_overlap_convention(spark):
    """'aaa' under merge (a,a) must segment as ['aa','a'] — left-to-right
    non-overlapping, the classic BPE rule the fold expression encodes."""
    df = spark.createDataFrame([("aaa",), ("aaaa",)], "word string")
    enc = {
        r.word: tuple(r.tokens)
        for r in encode_words(df, [("a", "a")]).collect()
    }
    assert enc["aaa"] == ("aa", "a")
    assert enc["aaaa"] == ("aa", "aa")


def test_backslash_symbols_survive_sql_literal_embedding(spark):
    """ADVICE r14: merge symbols containing a backslash (codepoint 92,
    inside the printable fixture range) must round-trip through the
    SQL string literals in both the per-merge training fold and the
    array-literal encode fold."""
    df = spark.createDataFrame([(r"\\a",), (r"\\a",), (r"\b",)], "word string")
    # encode fold: merge ('\', '\') applies to the double-backslash word
    enc = {
        r.word: tuple(r.tokens)
        for r in encode_words(df, [("\\", "\\")]).collect()
    }
    assert enc["\\\\a"] == ("\\\\", "a")
    assert enc["\\b"] == ("\\", "b")
    # training fold: corpus where the best pair contains a backslash
    docs = spark.createDataFrame([(r"\a \a",)], "text string")
    merges = train_bpe(docs, n_merges=1)
    assert merges == [("\\", "a")]
