"""Distributed BPE (byte-pair-encoding) tokenizer training: learn the
merge table from a corpus with pure DataFrame aggregations — the
tokenizer-fitting step of a training-data pipeline, expressed so the
corpus-sized work is one aggregation and the iterative part touches
only the vocabulary.

Algorithm (Sennrich et al. 2016, word-internal merges):

1. ONE corpus scan builds the word-frequency table (the only
   corpus-sized aggregation; everything after is vocab-sized).
2. Each round: count adjacent symbol pairs weighted by word frequency,
   pick the most frequent pair (deterministic tie-break: count desc,
   then pair lexicographic asc), and apply the merge left-to-right
   non-overlapping inside every word.
3. The merge application is a Spark-SQL ``aggregate`` fold over the
   symbol array — whole-stage-codegen JVM work, no Python UDF — and the
   per-round argmax is a 2-row-bounded driver collect (control-plane
   sized, like the max-sk seed reads).

No end-of-word marker symbol is used (merges are word-internal either
way; a production tokenizer appends one to distinguish suffix merges —
one-line change in ``word_frequencies``).

Scale design (100 TB): the word table is vocab-sized (~10⁶ rows
regardless of corpus bytes), so each round's pair count + merge rewrite
is a small job; ``localCheckpoint`` truncates the per-round lineage
exactly like k-means/PageRank.  The corpus is read ONCE.  Differential
correctness is pinned two ways: ``tests/test_bpe.py`` against an
independent pure-Python reference implementation (exact merge-table
equality), and the oracle registry via ``plans/bpe_queries.py``, whose
DuckDB oracle unrolls the training rounds as materialized CTEs (the
k-means/PageRank iterative-oracle pattern) with the greedy merge
application re-expressed as a lookback ``list_reduce`` string fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) from one corpus scan — whitespace tokenization to
    match the repo's token censuses."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _esc_literal(s: str) -> str:
    """Escape a symbol for embedding in a Spark SQL single-quoted
    string literal: backslashes BEFORE quotes, or a symbol containing
    a backslash silently diverges from the Python trainer."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(left: str, right: str) -> str:
    """Spark-SQL fold applying ONE merge (left,right)→left||right to the
    ``syms`` array, left-to-right non-overlapping (classic BPE greedy:
    'AAA' with pair (A,A) → ['AA','A'])."""
    # backslash first, then quote — a learned symbol containing '\'
    # (codepoint 92 is inside the printable fixture range) would
    # otherwise be corrupted by Spark's string-literal unescaping
    l, r = (_esc_literal(left), _esc_literal(right))
    return f"""
    aggregate(
      sequence(0, size(syms) - 1),
      named_struct('res', cast(array() as array<string>), 'skip', false),
      (acc, i) -> if(
        acc.skip,
        named_struct('res', acc.res, 'skip', false),
        if(i < size(syms) - 1 AND syms[i] = '{l}' AND syms[i + 1] = '{r}',
           named_struct('res', concat(acc.res, array('{l}{r}')), 'skip', true),
           named_struct('res', concat(acc.res, array(syms[i])), 'skip', false))
      ),
      acc -> acc.res
    )"""


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in rank order.
    Stops early when no pair occurs at least twice."""
    return [(l, r) for l, r, _n in train_bpe_ranked(docs, n_merges, text_col)[0]]


def train_bpe_ranked(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """:func:`train_bpe` exposing the full training state: the merge
    table WITH each merge's winning pair count (the oracle-checked
    surface of ``plans/bpe_queries.py``) and the final ``(syms, freq)``
    word table — which IS the encoded vocabulary, since training
    applies the merges incrementally in rank order."""
    words = (
        word_frequencies(docs, text_col)
        .select(
            F.expr("split(word, '')").alias("syms"), "freq"
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> named_struct('l', syms[i], 'r', syms[i + 1]))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < 2:
            break
        best = (pairs[0]["p"]["l"], pairs[0]["p"]["r"])
        merges.append((best[0], best[1], int(pairs[0]["n"])))
        words = words.select(
            F.expr(_merge_expr(*best)).alias("syms"), "freq"
        ).localCheckpoint()
    return merges, words


def encode_words(
    df: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge table (in rank order) to a word column —
    the tokenizer's encode step, same per-merge fold semantics as
    training so train/encode cannot drift.

    The merge table rides as an ARRAY LITERAL folded by an outer
    ``aggregate`` (one merge per step, each step the training fold),
    NOT as chained per-merge ``withColumn`` expressions: Catalyst's
    project collapsing would inline each step into every ``syms``
    reference of the next (~6 per fold), growing the expression tree
    exponentially in the merge count — a 20-merge table OOMs the
    driver during analysis.  One constant-size expression evaluates
    the same fold iteratively at runtime instead."""
    items = ",".join(
        f"named_struct('l', '{_esc_literal(l)}', 'r', '{_esc_literal(r)}')"
        for l, r in merges
    )
    merges_sql = (
        f"array({items})" if merges
        else "cast(array() as array<struct<l:string,r:string>>)"
    )
    return df.withColumn(
        "tokens",
        F.expr(f"""
        aggregate(
          {merges_sql},
          split({word_col}, ''),
          (syms, m) -> aggregate(
            sequence(0, size(syms) - 1),
            named_struct('res', cast(array() as array<string>), 'skip', false),
            (acc, i) -> if(
              acc.skip,
              named_struct('res', acc.res, 'skip', false),
              if(i < size(syms) - 1 AND syms[i] = m.l AND syms[i + 1] = m.r,
                 named_struct('res', concat(acc.res, array(concat(m.l, m.r))),
                              'skip', true),
                 named_struct('res', concat(acc.res, array(syms[i])),
                              'skip', false))
            ),
            acc -> acc.res
          )
        )"""),
    )
