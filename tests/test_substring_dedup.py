"""Exact-substring dedup semantics (operators/substring_dedup.py):
first-occurrence-wins policy, span merging, and excision — on a corpus
small enough to reason about by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.substring_dedup import (
    duplicate_substring_spans,
    excise_spans,
)

N = 4  # small gram size so fixtures stay readable


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _words(prefix, count):
    return " ".join(f"{prefix}{i}" for i in range(count))


def test_repeated_block_excised_everywhere_but_first(spark):
    shared = _words("dup", 6)                       # 6 shared tokens
    corpus = _corpus(spark, [
        (1, f"{_words('a', 3)} {shared}"),          # first occurrence
        (2, f"{_words('b', 5)} {shared}"),          # duplicate
        (3, _words("c", 8)),                        # clean
    ])
    spans = duplicate_substring_spans(corpus, n=N).collect()
    by_doc = {r.doc_id: r for r in spans}
    # only doc 2 carries a span; doc 1 keeps the canonical copy
    assert set(by_doc) == {2}
    # shared block occupies tokens [5, 11) of doc 2
    assert (by_doc[2].span_start, by_doc[2].span_end) == (5, 11)

    out = {r.doc_id: r for r in excise_spans(
        corpus, duplicate_substring_spans(corpus, n=N)).collect()}
    assert out[1].dropped_tokens == 0
    assert out[2].clean_text == _words("b", 5)
    assert out[2].dropped_tokens == 6
    assert out[3].clean_text == _words("c", 8)


def test_within_doc_repeat_keeps_first_copy(spark):
    block = _words("r", 4)
    corpus = _corpus(spark, [(7, f"{block} {_words('x', 4)} {block}")])
    spans = duplicate_substring_spans(corpus, n=N).collect()
    assert len(spans) == 1
    # second occurrence starts at token 8
    assert (spans[0].span_start, spans[0].span_end) == (8, 12)
    out = excise_spans(
        corpus, duplicate_substring_spans(corpus, n=N)).collect()[0]
    assert out.clean_text == f"{block} {_words('x', 4)}"


def test_adjacent_grams_merge_into_one_span(spark):
    shared = _words("m", 9)                         # 9 tokens → 6 dup grams
    corpus = _corpus(spark, [
        (1, shared),
        (2, f"{_words('y', 2)} {shared}"),
    ])
    spans = duplicate_substring_spans(corpus, n=N).filter(
        F.col("doc_id") == 2).collect()
    assert len(spans) == 1                          # one merged span, not 6
    assert spans[0].span_tokens == 9


def test_short_and_empty_docs_pass_through(spark):
    corpus = _corpus(spark, [
        (1, "only three tokens"),                   # < n → no grams
        (2, "only three tokens"),                   # exact dup but too short
        (3, ""),
    ])
    assert duplicate_substring_spans(corpus, n=N).count() == 0
    out = {r.doc_id: r for r in excise_spans(
        corpus, duplicate_substring_spans(corpus, n=N)).collect()}
    assert out[1].clean_text == "only three tokens"
    # the shared tokenizer maps '' to [''] (one empty token) — same
    # convention in both engines, pinned here so it can't drift
    assert out[3].clean_text == "" and out[3].kept_tokens == 1


def test_deterministic_under_repartition(spark):
    shared = _words("z", 7)
    rows = [(i, f"{_words(chr(97 + i), i % 3 + 2)} {shared}")
            for i in range(1, 9)]
    corpus = _corpus(spark, rows)
    a = sorted(map(tuple, duplicate_substring_spans(corpus, n=N).collect()))
    b = sorted(map(tuple, duplicate_substring_spans(
        corpus.repartition(7), n=N).collect()))
    assert a == b and len(a) == 7                   # all but doc 1 spanned
