"""Registered unigram-LM tokenizer queries (r14 verdict task 5):
``unigram_train`` (the Viterbi-EM vocabulary with micro log-probs)
and ``unigram_encode_census`` (the corpus token census under the
trained tokenizer) — the EM siblings of ``bpe_train_merges`` /
``bpe_encode_census``, with the oracle unrolling the EM rounds as
CTEs.

Oracle mechanics: the Viterbi DP is unrolled RELATIONALLY — one CTE
per word position (positions bounded by ``MAXW`` because the ``w0``
CTE pre-splits longer words into MAXW-char chunks, the split-at-MAXW
policy mirrored from ``operators/unigram.chunk_words`` — the trainer
is total, not guarded), each an argmin join against the
1..MAX_PIECE_LEN prior positions, then a backpointer walk of ``MAXW``
more CTEs.  No
lambdas anywhere: a ``list_reduce`` formulation with nested
``list_filter``/``list_transform`` capturing the outer accumulator
EVALUATES INCORRECTLY in DuckDB 1.0 depending on the input vector
layout (same expression: right over a freshly materialized table,
wrong through a join-fed CTE, and not reliably fixed by
``AS MATERIALIZED`` — observed as a non-minimal candidate chosen at
one position of one word).  The relational unrolling is immune and
every CTE is ``AS MATERIALIZED`` (chains are referenced repeatedly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.unigram import (
    LP_SCALE,
    MAX_PIECE_LEN,
    MAXW,
    SEED_MULTI,
    T_EM,
    segment_words,
    train_unigram,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table


def unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, n, lp_micro): the final vocabulary after seeding +
    ``T_EM`` Viterbi-EM rounds on the documents corpus."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab, _words = train_unigram(docs)
    return vocab.select(
        "piece", F.col("n").cast("long").alias("n"), "lp_micro"
    )


def unigram_encode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, n_tokens): corpus census under the trained tokenizer —
    one more Viterbi pass under the FINAL scores (the encode path),
    which differs from the last EM round's counts (those were taken
    under the previous round's scores)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab, words = train_unigram(docs)
    seg = segment_words(words, vocab)
    return (
        seg.select(F.explode("tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n_tokens"))
    )


# --- DuckDB oracle ----------------------------------------------------------


def _scored_cte(name: str, counts: str, pieces: str) -> str:
    """(piece, n, lp_micro) over the fixed piece set with smoothed
    micro log-probs — totals from the SAME fixed set."""
    return f"""{name}_n AS MATERIALIZED (
  SELECT p.piece, COALESCE(c.n, 0) AS n
  FROM {pieces} p LEFT JOIN {counts} c ON p.piece = c.piece
),
{name} AS MATERIALIZED (
  SELECT piece, n,
         CAST(round(ln(CAST(n + 1 AS DOUBLE)
                       / CAST(t.tot + t.vv AS DOUBLE))
                    * {LP_SCALE}.0) AS BIGINT) AS lp_micro
  FROM {name}_n
  CROSS JOIN (SELECT SUM(n) AS tot, COUNT(*) AS vv FROM {name}_n) t
)"""


def _round_ctes(t: int, vocab_prev: str, pieces: str = "v0_n") -> str:
    """One Viterbi round against ``vocab_prev``: span costs, the
    unrolled forward DP (argmin per position, ties cost-asc then
    start-asc so the longer piece wins), the backpointer walk, the
    weighted piece counts, and the re-scored vocab ``v{t}`` over the
    ``pieces`` table (the full seed set by default; the prune chain
    passes its reduced set)."""
    parts = [f"""spr{t} AS MATERIALIZED (
  SELECT s.word, s.st, s.en, -v.lp_micro AS cost
  FROM spx s JOIN {vocab_prev} v ON v.piece = s.piece
)""", f"""d{t}_0 AS MATERIALIZED (
  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS back FROM w0
)"""]
    for i in range(1, MAXW + 1):
        priors = " UNION ALL ".join(
            f"SELECT word, pos, cost FROM d{t}_{j}"
            for j in range(max(0, i - MAX_PIECE_LEN), i)
        )
        parts.append(f"""d{t}_{i} AS MATERIALIZED (
  SELECT word, {i} AS pos, cost, back FROM (
    SELECT s.word, p.cost + s.cost AS cost, CAST(s.st AS INTEGER) AS back,
           ROW_NUMBER() OVER (
             PARTITION BY s.word
             ORDER BY p.cost + s.cost ASC, s.st ASC) AS rn
    FROM spr{t} s
    JOIN ({priors}) p ON p.word = s.word AND p.pos = s.st - 1
    WHERE s.en = {i}
  ) WHERE rn = 1
)""")
        parts.append(f"""wk{t}_{i} AS MATERIALIZED (
  SELECT w.word, substr(w.word, d.back, w.j - d.back + 1) AS piece,
         d.back - 1 AS j
  FROM wk{t}_{i - 1} w
  JOIN dfin{t} d ON d.word = w.word AND d.pos = w.j
  WHERE w.j > 0
)""")
    # the walk CTEs reference dfin{t}, defined between DP and walk —
    # reorder: DP positions first, then dfin, then the walk
    dp = parts[:2] + [p for p in parts[2:] if p.startswith(f"d{t}_")]
    walk = [p for p in parts[2:] if p.startswith(f"wk{t}_")]
    dfin = f"""dfin{t} AS MATERIALIZED (
  {" UNION ALL ".join(f"SELECT * FROM d{t}_{i}" for i in range(MAXW + 1))}
)"""
    wk0 = f"""wk{t}_0 AS MATERIALIZED (
  SELECT word, CAST(len(word) AS INTEGER) AS j FROM w0
)"""
    pieces_union = " UNION ALL ".join(
        f"SELECT word, piece FROM wk{t}_{k}" for k in range(1, MAXW + 1)
    )
    tail = f"""cnt{t} AS MATERIALIZED (
  SELECT p.piece, SUM(w.freq) AS n
  FROM ({pieces_union}) p JOIN w0 w ON p.word = w.word
  GROUP BY p.piece
),
{_scored_cte(f'v{t}', f'cnt{t}', pieces)}"""
    return ",\n".join(dp + [dfin, wk0] + walk + [tail])


_TRAIN_CTES = f"""w0 AS MATERIALIZED (
  -- split-at-MAXW pre-split (mirrors operators/unigram.chunk_words):
  -- identity on words <= MAXW chars, deterministic chunking above,
  -- so the unrolled DP's position cap is always sufficient
  SELECT word, CAST(SUM(freq) AS BIGINT) AS freq FROM (
    SELECT substr(word, CAST(st AS INTEGER), {MAXW}) AS word, freq
    FROM (
      SELECT word, freq,
             unnest(range(1, len(word) + 1, {MAXW})) AS st
      FROM (
        SELECT word, COUNT(*)::BIGINT AS freq FROM (
          SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
          FROM documents
        ) WHERE word <> '' GROUP BY word
      )
    )
  ) GROUP BY word
),
sp1 AS MATERIALIZED (
  SELECT word, unnest(range(1, len(word) + 1)) AS st FROM w0
),
spx AS MATERIALIZED (
  SELECT word, st, en, substr(word, st, en - st + 1) AS piece FROM (
    SELECT word, st,
           unnest(range(st, least(len(word) + 1, st + {MAX_PIECE_LEN})))
             AS en
    FROM sp1
  )
),
occ AS MATERIALIZED (
  SELECT s.piece, SUM(w.freq) AS n
  FROM spx s JOIN w0 w ON s.word = w.word
  GROUP BY s.piece
),
seedp AS MATERIALIZED (
  SELECT piece, n FROM occ WHERE len(piece) = 1
  UNION ALL
  SELECT piece, n FROM (
    SELECT piece, n, ROW_NUMBER() OVER (ORDER BY n DESC, piece ASC) AS r
    FROM occ WHERE len(piece) >= 2
  ) WHERE r <= {SEED_MULTI}
),
{_scored_cte('v0', 'seedp', 'seedp')},
{",".join(_round_ctes(t, f"v{t - 1}") for t in range(1, T_EM + 1))}"""

UNIGRAM_TRAIN_ORACLE = f"""
WITH {_TRAIN_CTES}
SELECT piece, CAST(n AS BIGINT) AS n, lp_micro FROM v{T_EM}
"""

# encode = one more segmentation round under v{T_EM}; reuse the round
# machinery at t = T_EM + 1 and aggregate the census
_ENC_T = T_EM + 1
UNIGRAM_ENCODE_ORACLE = f"""
WITH {_TRAIN_CTES},
{_round_ctes(_ENC_T, f"v{T_EM}")}
SELECT piece AS token, CAST(n AS BIGINT) AS n_tokens FROM cnt{_ENC_T}
"""

register(QuerySpec("unigram_train", unigram_train, UNIGRAM_TRAIN_ORACLE,
                   tags=("llm", "TOKENIZER")))
register(QuerySpec("unigram_encode_census", unigram_encode_census,
                   UNIGRAM_ENCODE_ORACLE, tags=("llm", "TOKENIZER")))


# --- likelihood-loss vocabulary pruning (Kudo'18 §3.2) ----------------------


def unigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(piece, n, lp_micro): the vocabulary after the FULL Kudo'18
    trainer — seeding, ``T_EM`` EM rounds, then likelihood-loss
    pruning down the :func:`prune_schedule` (drop the bottom-η%
    multi-char pieces by loss per round, EM re-count between rounds,
    singles always kept for coverage) to ``PRUNE_TARGET_MULTI``
    multi-char pieces."""
    from star_schema_etl_airflow_spark.operators.unigram import (
        train_unigram_pruned,
    )

    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab, _words = train_unigram_pruned(docs)
    return vocab.select(
        "piece", F.col("n").cast("long").alias("n"), "lp_micro"
    )


def _prune_iter_ctes(k: int, prev: str, keep: int) -> str:
    """One prune iteration against vocabulary ``prev``: the
    alternative-path DP over the multi-char pieces themselves
    (identity span excluded — at most MAX_PIECE_LEN unrolled
    positions), the loss ranking, the kept set + re-smoothing
    (``pv{k}``), then one EM round over the reduced piece table
    (``v{T_EM + k}``) — mirroring ``operators/unigram.prune_round``."""
    parts = [f"""pw{k} AS MATERIALIZED (
  SELECT piece AS word FROM {prev} WHERE len(piece) >= 2
)""", f"""pspc{k} AS MATERIALIZED (
  SELECT p.word, p.st, p.en, -v.lp_micro AS cost FROM (
    SELECT word, st, en, substr(word, st, en - st + 1) AS sub FROM (
      SELECT word, st,
             unnest(range(st, least(len(word) + 1, st + {MAX_PIECE_LEN})))
               AS en
      FROM (SELECT word, unnest(range(1, len(word) + 1)) AS st FROM pw{k})
    ) WHERE NOT (st = 1 AND en = len(word))
  ) p JOIN {prev} v ON v.piece = p.sub
)""", f"""pd{k}_0 AS MATERIALIZED (
  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM pw{k}
)"""]
    for i in range(1, MAX_PIECE_LEN + 1):
        priors = " UNION ALL ".join(
            f"SELECT word, pos, cost FROM pd{k}_{j}"
            for j in range(max(0, i - MAX_PIECE_LEN), i)
        )
        parts.append(f"""pd{k}_{i} AS MATERIALIZED (
  SELECT word, {i} AS pos, cost FROM (
    SELECT s.word, p.cost + s.cost AS cost,
           ROW_NUMBER() OVER (
             PARTITION BY s.word
             ORDER BY p.cost + s.cost ASC, s.st ASC) AS rn
    FROM pspc{k} s
    JOIN ({priors}) p ON p.word = s.word AND p.pos = s.st - 1
    WHERE s.en = {i}
  ) WHERE rn = 1
)""")
    alts = " UNION ALL ".join(
        f"SELECT word, pos, cost FROM pd{k}_{i}"
        for i in range(1, MAX_PIECE_LEN + 1)
    )
    parts.append(f"""loss{k} AS MATERIALIZED (
  SELECT v.piece, v.n,
         CAST(v.n * (a.cost + v.lp_micro) AS BIGINT) AS loss
  FROM {prev} v
  JOIN ({alts}) a ON a.word = v.piece AND a.pos = len(v.piece)
)""")
    parts.append(f"""pp{k} AS MATERIALIZED (
  SELECT piece, n FROM {prev} WHERE len(piece) = 1
  UNION ALL
  SELECT piece, n FROM (
    SELECT piece, n,
           ROW_NUMBER() OVER (ORDER BY loss DESC, piece ASC) AS r
    FROM loss{k}
  ) WHERE r <= {keep}
)""")
    parts.append(_scored_cte(f"pv{k}", f"pp{k}", f"pp{k}"))
    parts.append(_round_ctes(T_EM + k, f"pv{k}", pieces=f"pv{k}_n"))
    return ",\n".join(parts)


def _unigram_prune_oracle() -> str:
    from star_schema_etl_airflow_spark.operators.unigram import (
        prune_schedule,
    )

    sched = prune_schedule()
    iters = ",\n".join(
        _prune_iter_ctes(
            k + 1,
            f"v{T_EM}" if k == 0 else f"v{T_EM + k}",
            keep,
        )
        for k, keep in enumerate(sched)
    )
    return f"""
WITH {_TRAIN_CTES},
{iters}
SELECT piece, CAST(n AS BIGINT) AS n, lp_micro FROM v{T_EM + len(sched)}
"""


register(QuerySpec("unigram_prune", unigram_prune, _unigram_prune_oracle(),
                   tags=("llm", "TOKENIZER")))


def unigram_pruned_encode_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(token, n_tokens): corpus census under the PRUNED vocabulary —
    the encode pass of the full Kudo trainer, feeding the pruned row
    of ``tokenizer_eval``."""
    from star_schema_etl_airflow_spark.operators.unigram import (
        train_unigram_pruned,
    )

    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab, words = train_unigram_pruned(docs)
    seg = segment_words(words, vocab)
    return (
        seg.select(F.explode("tokens").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n_tokens"))
    )


def _pruned_encode_oracle() -> str:
    from star_schema_etl_airflow_spark.operators.unigram import (
        prune_schedule,
    )

    sched = prune_schedule()
    iters = ",\n".join(
        _prune_iter_ctes(
            k + 1,
            f"v{T_EM}" if k == 0 else f"v{T_EM + k}",
            keep,
        )
        for k, keep in enumerate(sched)
    )
    t_enc = T_EM + len(sched) + 1
    enc = _round_ctes(t_enc, f"v{T_EM + len(sched)}",
                      pieces=f"pv{len(sched)}_n")
    return f"""
WITH {_TRAIN_CTES},
{iters},
{enc}
SELECT piece AS token, CAST(n AS BIGINT) AS n_tokens FROM cnt{t_enc}
"""


# --- tokenizer comparison eval ----------------------------------------------


def tokenizer_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tokenizer, n_tokens_total, n_distinct_tokens, chars_per_token):
    BPE vs unigram-LM on the same corpus — the eval-as-query row for
    the tokenizer family (the dedup_eval/ivfpq_eval convention).
    ``chars_per_token`` is the compression metric a deployment picks a
    tokenizer by: total word chars (identical numerator for both
    tokenizers, no whitespace) over emitted tokens."""
    from star_schema_etl_airflow_spark.operators.unigram import (
        word_frequencies,
    )
    from star_schema_etl_airflow_spark.plans.bpe_queries import (
        bpe_encode_census,
    )

    docs = load_table(spark, sf_dir, "documents").select("text")
    chars = F.broadcast(
        word_frequencies(docs)
        .agg(F.sum(F.expr("freq * length(word)")).alias("chars"))
    )

    def stats(census: DataFrame, name: str) -> DataFrame:
        return (
            census.agg(
                F.sum("n_tokens").alias("n_tokens_total"),
                F.count(F.lit(1)).alias("n_distinct_tokens"),
            )
            .crossJoin(chars)
            .select(
                F.lit(name).alias("tokenizer"),
                F.col("n_tokens_total").cast("long")
                .alias("n_tokens_total"),
                F.col("n_distinct_tokens").cast("long")
                .alias("n_distinct_tokens"),
                F.round(
                    F.col("chars").cast("double") / F.col("n_tokens_total"),
                    9,
                ).alias("chars_per_token"),
            )
        )

    return (
        stats(bpe_encode_census(spark, sf_dir), "bpe")
        .unionByName(stats(unigram_encode_census(spark, sf_dir),
                           "unigram"))
        .unionByName(stats(unigram_pruned_encode_census(spark, sf_dir),
                           "unigram_pruned"))
    )


def _tokenizer_eval_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.bpe_queries import (
        BPE_ENCODE_ORACLE,
    )

    # each census rides as a parenthesized subquery, so the two chains'
    # CTE namespaces (both define w0) never meet
    return f"""
WITH chars AS (
  SELECT SUM(freq * len(word)) AS chars FROM (
    SELECT word, COUNT(*)::BIGINT AS freq FROM (
      SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word
      FROM documents
    ) WHERE word <> '' GROUP BY word
  )
),
bpe_census AS (
  SELECT * FROM ({BPE_ENCODE_ORACLE})
),
uni_census AS (
  SELECT * FROM ({UNIGRAM_ENCODE_ORACLE})
),
unip_census AS (
  SELECT * FROM ({_pruned_encode_oracle()})
)
SELECT 'bpe' AS tokenizer,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
       ROUND(CAST(c.chars AS DOUBLE) / SUM(n_tokens), 9)
         AS chars_per_token
FROM bpe_census CROSS JOIN chars c GROUP BY c.chars
UNION ALL
SELECT 'unigram',
       CAST(SUM(n_tokens) AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       ROUND(CAST(c.chars AS DOUBLE) / SUM(n_tokens), 9)
FROM uni_census CROSS JOIN chars c GROUP BY c.chars
UNION ALL
SELECT 'unigram_pruned',
       CAST(SUM(n_tokens) AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       ROUND(CAST(c.chars AS DOUBLE) / SUM(n_tokens), 9)
FROM unip_census CROSS JOIN chars c GROUP BY c.chars
"""


register(QuerySpec("tokenizer_eval", tokenizer_eval,
                   _tokenizer_eval_oracle(),
                   tags=("llm", "TOKENIZER", "EVAL")))
