"""BPE tokenizer training and encoding as oracle-checked queries —
closing the one family that was verified only by pytest (round-13
verdict task 1).

``bpe_train_merges`` returns the learned merge table (rank, pair,
winning pair count); ``bpe_encode_census`` is the 100 TB-shaped encode
pass: token frequencies of the whole corpus under the trained
tokenizer.

Oracle strategy: iterative argmax is not single-statement SQL, so the
DuckDB oracle unrolls the ``N_MERGES`` training rounds as MATERIALIZED
CTEs (the ``kmeans_assign``/``pagerank_trade_graph`` iterative-oracle
pattern; MATERIALIZED is required — each round's word table is
referenced twice, and inlining would re-evaluate the chain
exponentially).  DuckDB 1.0's ``list_reduce`` has no initial
accumulator, so the greedy left-to-right non-overlapping merge
application is re-expressed as a LOOKBACK string fold: the accumulator
is the merged word so far, tokens joined by ``chr(31)`` (unit
separator), with a trailing ``chr(2)`` marking the last token as
"closed" (just produced by a merge, so it cannot serve as the left
symbol of another merge this round — exactly the Spark fold's ``skip``
flag one step later).  The fixture corpus is printable ASCII
(verified: codepoints 32..121), so the control characters cannot
collide with symbols.  Fold equivalence to the Spark lookahead fold
and to an independent pure-Python trainer is pinned in
``tests/test_bpe.py``.

Scale design (100 TB): the corpus is scanned ONCE into a vocab-sized
word-frequency table; every training round is a vocab-sized job with a
2-row argmax collect (control-plane, like the max-sk seed); the merge
table itself is ``N_MERGES`` rows of driver-side state (broadcast to
encode).  Encoding tokenizes the vocab, not the corpus — per-document
token streams would join the encoded vocab back on ``word``.

Reference parity: beyond-reference (LLM-pipeline tokenizer fitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.bpe import (
    encode_words,
    train_bpe_ranked,
    word_frequencies,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

N_MERGES = 20
SEP, MARK = 31, 2  # chr codes: token separator / closed-token marker


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges, _words = train_bpe_ranked(docs, N_MERGES)
    rows = [(k + 1, l, r, n) for k, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left_sym string, right_sym string, n bigint"
    )


def bpe_encode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token census under the trained tokenizer, via the public
    encode path (``encode_words`` re-applies the merge table to the raw
    vocabulary — definitionally equal to training's final word table,
    which the oracle uses directly, so the census also pins
    train/encode non-drift cross-engine)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges, _words = train_bpe_ranked(docs, N_MERGES)
    encoded = encode_words(
        word_frequencies(docs), [(l, r) for l, r, _n in merges]
    )
    return (
        encoded.select(F.explode("tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n_tokens"))
    )


def _fold_sql(syms: str, l: str, r: str) -> str:
    """DuckDB lookback fold applying merge (l, r) to a symbol list,
    greedy left-to-right non-overlapping.  ``l``/``r`` are SQL
    expressions (the per-round best-pair columns)."""
    last = (f"CASE WHEN strpos(acc, chr({SEP})) = 0 THEN acc "
            f"ELSE split_part(acc, chr({SEP}), -1) END")
    toks = f"string_split(acc, chr({SEP}))"
    drop_last = (f"array_to_string(list_slice({toks}, 1, "
                 f"len({toks}) - 1), chr({SEP}))")
    return f"""
    string_split(
      rtrim(
        list_reduce({syms}, (acc, x) ->
          CASE
            WHEN right(acc, 1) = chr({MARK})
            THEN rtrim(acc, chr({MARK})) || chr({SEP}) || x
            WHEN {last} = {l} AND x = {r}
            THEN CASE WHEN strpos(acc, chr({SEP})) = 0
                      THEN {l} || {r} || chr({MARK})
                      ELSE {drop_last} || chr({SEP}) || {l} || {r}
                           || chr({MARK}) END
            ELSE acc || chr({SEP}) || x
          END),
        chr({MARK})),
      chr({SEP}))"""


def _round_ctes(k: int) -> str:
    """One training round: pair counts from w{k}, best pair b{k}
    (count desc, pair lexicographic asc, must occur >= 2), merged word
    table w{k+1}.  An empty b{k} (early stop) makes the round a NO-OP
    (LEFT JOIN keeps every word, the fold is skipped) — matching the
    Spark trainer's break, which stops merging but keeps the word
    table.  A CROSS JOIN here would instead empty every later w{k} and
    return a zero-row census on any corpus with fewer than N_MERGES
    learnable merges (ADVICE r14)."""
    return f"""
p{k} AS MATERIALIZED (
  SELECT l, r, SUM(freq) AS n FROM (
    SELECT unnest(list_slice(syms, 1, len(syms) - 1)) AS l,
           unnest(list_slice(syms, 2, len(syms))) AS r,
           freq
    FROM w{k} WHERE len(syms) >= 2
  ) GROUP BY l, r
),
b{k} AS MATERIALIZED (
  SELECT l, r, n FROM p{k} WHERE n >= 2
  ORDER BY n DESC, l ASC, r ASC LIMIT 1
),
w{k + 1} AS MATERIALIZED (
  SELECT CASE WHEN b.l IS NULL THEN w.syms
         ELSE {_fold_sql('w.syms', 'b.l', 'b.r')} END AS syms, w.freq
  FROM w{k} w LEFT JOIN b{k} b ON TRUE
)"""


_TRAIN_CTES = f"""
w0 AS MATERIALIZED (
  SELECT string_split(word, '') AS syms, COUNT(*)::BIGINT AS freq FROM (
    SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY word
),{",".join(_round_ctes(k) for k in range(N_MERGES))}
"""

_RANK_UNION = "\nUNION ALL\n".join(
    f"SELECT CAST({k + 1} AS INTEGER) AS rank, l AS left_sym, "
    f"r AS right_sym, CAST(n AS BIGINT) AS n FROM b{k}"
    for k in range(N_MERGES)
)

BPE_TRAIN_ORACLE = f"""
WITH {_TRAIN_CTES}
SELECT * FROM ({_RANK_UNION}) ORDER BY rank
"""

BPE_ENCODE_ORACLE = f"""
WITH {_TRAIN_CTES}
SELECT token, CAST(SUM(freq) AS BIGINT) AS n_tokens FROM (
  SELECT unnest(syms) AS token, freq FROM w{N_MERGES}
) GROUP BY token
"""

register(QuerySpec("bpe_train_merges", bpe_train_merges, BPE_TRAIN_ORACLE,
                   tags=("llm", "BPE")))
register(QuerySpec("bpe_encode_census", bpe_encode_census, BPE_ENCODE_ORACLE,
                   tags=("llm", "BPE")))
