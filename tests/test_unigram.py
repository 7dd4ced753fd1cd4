"""Distributed unigram-LM (Viterbi-EM) tokenizer vs an independent
pure-Python reference: exact vocabulary/log-prob equality on the
fixture corpus, encode/train consistency, and the DP tie-break
convention (longer piece wins a cost tie)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from star_schema_etl_airflow_spark.operators.unigram import (
    LP_SCALE,
    MAX_PIECE_LEN,
    MAXW,
    SEED_MULTI,
    T_EM,
    segment_words,
    train_unigram,
    word_frequencies,
)

SF_DIR = "/root/testdata/sf0.001"


# --- pure-Python reference (independent implementation) --------------------

def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _ref_words(texts):
    c: Counter = Counter()
    for t in texts:
        for w in t.split():
            # split-at-MAXW pre-split (identity on fixture words)
            for st in range(0, len(w), MAXW):
                if w[st:st + MAXW]:
                    c[w[st:st + MAXW]] += 1
    return dict(c)


def _ref_scored(counts: dict) -> dict:
    tot, v = sum(counts.values()), len(counts)
    return {
        p: _round_half_away(math.log((n + 1) / (tot + v)) * LP_SCALE)
        for p, n in counts.items()
    }


def _ref_seed(words: dict) -> dict:
    occ: Counter = Counter()
    for w, f in words.items():
        for st in range(len(w)):
            for en in range(st + 1, min(len(w), st + MAX_PIECE_LEN) + 1):
                occ[w[st:en]] += f
    singles = {p: n for p, n in occ.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in occ.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:SEED_MULTI]
    return {**singles, **dict(multi)}


def _ref_viterbi(word: str, lp: dict) -> list[str]:
    n = len(word)
    best = [(0, 0)] + [(None, 0)] * n   # (cost, back-start 1-based)
    for i in range(1, n + 1):
        cands = []
        for st in range(max(1, i - MAX_PIECE_LEN + 1), i + 1):
            piece = word[st - 1:i]
            if piece in lp and best[st - 1][0] is not None:
                cands.append((best[st - 1][0] - lp[piece], st))
        best[i] = min(cands)   # (cost asc, st asc) — longer piece wins
    pieces, j = [], n
    while j > 0:
        st = best[j][1]
        pieces.append(word[st - 1:j])
        j = st - 1
    return list(reversed(pieces))


def _ref_train(texts):
    words = _ref_words(texts)
    counts = _ref_seed(words)
    pieces = set(counts)
    lp = _ref_scored(counts)
    for _ in range(T_EM):
        c: Counter = Counter()
        for w, f in words.items():
            for piece in _ref_viterbi(w, lp):
                c[piece] += f
        counts = {p: c.get(p, 0) for p in pieces}
        lp = _ref_scored(counts)
    return counts, lp, words


def test_train_matches_reference_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    counts, lp, _ = _ref_train(texts)
    vocab, _words = train_unigram(docs)
    got = {r.piece: (r.n, r.lp_micro) for r in vocab.collect()}
    assert got == {p: (counts[p], lp[p]) for p in counts}
    # non-trivial: multi-char pieces were learned and used
    assert any(len(p) >= 2 and n > 0 for p, (n, _l) in got.items())


def test_encode_matches_reference_viterbi(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _counts, lp, words = _ref_train(texts := [
        r.text for r in docs.select("text").collect()
    ])
    vocab, wdf = train_unigram(docs)
    got = {
        r.word: list(r.tokens)
        for r in segment_words(wdf, vocab).collect()
    }
    for w in words:
        assert got[w] == _ref_viterbi(w, lp), w
        assert "".join(got[w]) == w          # lossless segmentation
    assert set(got) == set(words)


def test_tie_breaks_prefer_the_longer_piece(spark):
    """Equal-cost DP candidates resolve to the SMALLER start = the
    longer piece, matching the reference and the oracle's
    (cost asc, st asc) ROW_NUMBER."""
    import pyspark.sql.functions as F

    words = spark.createDataFrame([("abab", 1)], "word string, freq long")
    # hand-built vocab where 'ab' and 'a'+'b' cost the same per char
    vocab = spark.createDataFrame(
        [("a", -10), ("b", -10), ("ab", -20)],
        "piece string, lp_micro long",
    )
    toks = segment_words(words, vocab).collect()[0].tokens
    assert list(toks) == ["ab", "ab"]


def test_long_words_train_via_the_chunk_policy(spark):
    """A 40-char token no longer aborts the trainer: it is pre-split
    into MAXW-char chunks (split-at-MAXW policy), trains successfully,
    and matches both the chunking pure-Python reference and the DuckDB
    oracle (whose w0 CTE applies the identical pre-split)."""
    texts = [
        "the " + "q" * 40 + " token appears inside ordinary text",
        "ordinary words keep the trainer honest the the",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    counts, lp, words = _ref_train(texts)
    assert "q" * MAXW in words and "q" * 8 in words   # 40 = 16+16+8
    vocab, wdf = train_unigram(docs)
    got = {r.piece: (r.n, r.lp_micro) for r in vocab.collect()}
    assert got == {p: (counts[p], lp[p]) for p in counts}
    # differential: the committed oracle on the same documents table
    import duckdb
    import pandas as pd

    from star_schema_etl_airflow_spark.plans.unigram_queries import (
        UNIGRAM_TRAIN_ORACLE,
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    ora = {
        p: (int(n), int(l))
        for p, n, l in con.execute(UNIGRAM_TRAIN_ORACLE).fetchall()
    }
    assert got == ora


def test_fixture_words_fit_the_dp_cap(spark):
    """The committed oracle unrolls MAXW positions; the fixtures (and
    the disjoint-vocabulary scaled corpora, +3-char prefixes) must fit
    with headroom."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F

    mx = word_frequencies(docs).agg(
        F.max(F.length("word"))).first()[0]
    assert mx + 4 <= MAXW


def test_tokenizer_eval_compares_the_two_trainers(spark):
    from star_schema_etl_airflow_spark.plans.unigram_queries import (
        tokenizer_eval,
    )

    rows = {r.tokenizer: r for r in tokenizer_eval(spark, SF_DIR).collect()}
    assert set(rows) == {"bpe", "unigram", "unigram_pruned"}
    for r in rows.values():
        assert r.n_tokens_total > 0 and r.n_distinct_tokens > 0
        assert r.chars_per_token > 1.0   # all learned multi-char units
    # same corpus: chars = tokens x chars_per_token agrees across rows
    c_bpe = rows["bpe"].n_tokens_total * rows["bpe"].chars_per_token
    c_uni = rows["unigram"].n_tokens_total * rows["unigram"].chars_per_token
    assert abs(c_bpe - c_uni) / c_bpe < 1e-6
    # pruning halves the multi-char vocab; compression must not
    # collapse (the prune removed EM-orphaned pieces on this corpus)
    assert (rows["unigram_pruned"].chars_per_token
            >= rows["unigram"].chars_per_token * 0.9)
    assert (rows["unigram_pruned"].n_distinct_tokens
            <= rows["unigram"].n_distinct_tokens)


# --- likelihood-loss pruning (Kudo'18 §3.2) --------------------------------

def _ref_alt_costs(lp: dict) -> dict:
    """Viterbi cost of segmenting each multi-char piece by the rest of
    the vocabulary (identity span excluded)."""
    out = {}
    for piece in [p for p in lp if len(p) >= 2]:
        n = len(piece)
        best = [0] + [None] * n
        for i in range(1, n + 1):
            cands = []
            for st in range(max(1, i - MAX_PIECE_LEN + 1), i + 1):
                sub = piece[st - 1:i]
                if (st, i) == (1, n):
                    continue            # identity span excluded
                if sub in lp and best[st - 1] is not None:
                    cands.append(best[st - 1] - lp[sub])
            best[i] = min(cands) if cands else None
        out[piece] = best[n]
    return out


def _ref_train_pruned(texts):
    from star_schema_etl_airflow_spark.operators.unigram import (
        prune_schedule,
    )

    counts, lp, words = _ref_train(texts)
    for keep in prune_schedule():
        alt = _ref_alt_costs(lp)
        loss = {
            p: counts[p] * (alt[p] + lp[p])
            for p in counts if len(p) >= 2
        }
        kept = sorted(loss, key=lambda p: (-loss[p], p))[:keep]
        pieces = {p for p in counts if len(p) == 1} | set(kept)
        lp = _ref_scored({p: counts[p] for p in pieces})
        c: Counter = Counter()
        for w, f in words.items():
            for piece in _ref_viterbi(w, lp):
                c[piece] += f
        counts = {p: c.get(p, 0) for p in pieces}
        lp = _ref_scored(counts)
    return counts, lp, words


def test_pruned_train_matches_reference_on_fixture(spark):
    from star_schema_etl_airflow_spark.operators.unigram import (
        PRUNE_TARGET_MULTI,
        train_unigram_pruned,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    counts, lp, _ = _ref_train_pruned(texts)
    vocab, _words = train_unigram_pruned(docs)
    got = {r.piece: (r.n, r.lp_micro) for r in vocab.collect()}
    assert got == {p: (counts[p], lp[p]) for p in counts}
    n_multi = sum(1 for p in got if len(p) >= 2)
    assert n_multi == PRUNE_TARGET_MULTI
    # coverage invariant: every single char survived pruning
    assert {p for p in counts if len(p) == 1} <= set(got)


def test_prune_schedule_is_the_documented_trajectory():
    from star_schema_etl_airflow_spark.operators.unigram import (
        prune_schedule,
    )

    assert prune_schedule() == [32, 26, 21, 20]
    assert prune_schedule(10, 0.5, 3) == [5, 3]


def test_prune_drops_the_lowest_loss_pieces_first(spark):
    """A piece that the EM rounds stopped using (n = 0) has zero
    likelihood loss and must be pruned before any piece still in use."""
    from star_schema_etl_airflow_spark.operators.unigram import (
        prune_round, train_unigram,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab, words = train_unigram(docs)
    unused = {
        r.piece for r in vocab.collect() if len(r.piece) >= 2 and r.n == 0
    }
    if not unused:
        import pytest as _pytest
        _pytest.skip("fixture vocab has no unused multi pieces")
    kept = {
        r.piece
        for r in prune_round(vocab, words, 32).collect()
        if len(r.piece) >= 2
    }
    assert len(unused) > len(unused & kept) or len(unused) <= 40 - 32
    assert not (unused & kept) or len(unused) > 8
