"""Unigram-LM tokenizer (SentencePiece-style, Kudo, ACL 2018
"Subword Regularization" §3) — the EM sibling that completes the
tokenizer family begun with BPE (``operators/bpe.py``).

Variant implemented: **Viterbi (hard) EM over a seeded candidate
vocabulary**, deterministic end to end:

- Seed: every single character (coverage guarantee: any word is
  segmentable) plus the ``SEED_MULTI`` most frequent substrings of
  length 2..``MAX_PIECE_LEN`` (occurrence-weighted by word frequency;
  ties count-desc then piece-asc).
- Piece scores: smoothed log-probs in the repo's micro-BIGINT rounding
  contract — ``lp_micro = round(ln((c+1)/(total+V)) · 1e6)`` (the
  ``ngram_lm`` form), so Viterbi costs are INT64 sums, exact in any
  engine.
- EM round: Viterbi-segment every distinct word under the previous
  round's scores (DP ties broken cost-asc then start-asc, i.e. the
  LONGER piece wins), re-count pieces weighted by word frequency,
  re-score.  ``T_EM`` rounds; the word table is the unit of work
  (distinct words ≪ corpus, the BPE train observation).
- Encode: one more Viterbi pass under the FINAL scores — the
  tokenizer's apply step, shared machinery so train/encode cannot
  drift.

Spark shape: the DP is ONE ``aggregate`` fold over word positions per
word (array-of-struct accumulator — constant-size expression, the
lesson from the BPE project-collapse blowup), with candidate spans
pre-joined per word against the BROADCAST vocabulary; every count is
a map-side-combinable groupBy.  Word-grain, never corpus-grain: at
100 TB the distinct-word relation is the only thing the rounds loop
touches, and each round is two shuffles (span join is broadcast; the
count is one groupBy).

Cited reference behavior: none in /root/reference (the reference has
no tokenizer); published-algorithm parity only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.bpe import word_frequencies

MAX_PIECE_LEN = 4
SEED_MULTI = 40       # multi-char candidates kept at seeding
T_EM = 2              # Viterbi-EM rounds
LP_SCALE = 1_000_000  # micro log-prob fixed point
MAXW = 16             # chunk width: words are pre-split into MAXW-char
                      # chunks (also the oracle's unrolled-DP cap)

PRUNE_ETA = 0.2        # fraction of multi-char pieces dropped per round
PRUNE_TARGET_MULTI = 20  # multi-char vocabulary size pruning stops at

__all__ = [
    "MAX_PIECE_LEN", "MAXW", "SEED_MULTI", "T_EM", "LP_SCALE",
    "PRUNE_ETA", "PRUNE_TARGET_MULTI",
    "seed_vocab", "train_unigram", "segment_words", "word_frequencies",
    "chunk_words", "prune_schedule", "train_unigram_pruned",
]

# split-at-MAXW: pre-split any word longer than MAXW into MAXW-char
# chunks (SentencePiece's answer to unbounded tokens is pre-splitting /
# byte fallback; a hard abort would let one long URL / DNA string / CJK
# run kill a corpus-scale train job).  Chunking is the identity on
# words of length <= MAXW, and chunk boundaries are deterministic, so
# the oracle applies the SAME pre-split and parity holds.
_CHUNK_S = f"""
transform(sequence(1, length(word), {MAXW}),
          st -> substring(word, st, {MAXW}))
"""


def chunk_words(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq) with every word longer than
    ``MAXW`` split into MAXW-char chunks (chunks of different source
    words merge their frequencies)."""
    return (
        words.select(F.explode(F.expr(_CHUNK_S)).alias("word"), "freq")
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )

# all candidate spans (st, en 1-based inclusive) of a word, pieces up
# to MAX_PIECE_LEN chars
_SPANS_S = f"""
flatten(transform(sequence(1, length(word)), st ->
  transform(sequence(st, least(length(word), st + {MAX_PIECE_LEN - 1})),
            en -> named_struct(
              'st', st, 'en', en,
              'piece', substring(word, st, en - st + 1)))))
"""

# Viterbi forward DP over positions 1..n: acc[p+1] = (cost, back-start)
# of the best segmentation of the first p characters.  Candidate spans
# (with cost = -lp_micro > 0) ride the row as ``spans``; ties break
# cost-asc then start-asc (longer piece wins), a total order because
# (st, en) determines the piece.  LONG_MAX init is unreachable: every
# single char is in the vocabulary.
_DP_S = """
aggregate(
  sequence(1, length(word)),
  array(named_struct('c', 0L, 'b', 0)),
  (acc, i) -> concat(acc, array(
    aggregate(
      filter(spans, s -> s.en = i),
      named_struct('c', 9223372036854775807L, 'b', 0),
      (m, s) -> if(element_at(acc, s.st).c + s.cost < m.c
                   OR (element_at(acc, s.st).c + s.cost = m.c
                       AND s.st < m.b),
                   named_struct('c', element_at(acc, s.st).c + s.cost,
                                'b', s.st),
                   m)
    )
  ))
)
"""

# backtrace: walk back-pointers from position n; at most n hops.  The
# pieces come out right-to-left; reverse() restores word order.
_BT_S = """
reverse(aggregate(
  sequence(1, length(word)),
  named_struct('j', length(word), 'ps', cast(array() as array<string>)),
  (a, _i) -> if(a.j <= 0, a,
    named_struct(
      'j', element_at(dp, a.j + 1).b - 1,
      'ps', concat(a.ps, array(substring(
        word, element_at(dp, a.j + 1).b,
        a.j - element_at(dp, a.j + 1).b + 1))))),
  a -> a.ps
))
"""


def _scored(pieces_with_counts: DataFrame) -> DataFrame:
    """(piece, n, lp_micro): smoothed micro log-probs over a fixed
    vocabulary — total and V are 1-row broadcasts."""
    tot = pieces_with_counts.agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("v")
    )
    return (
        pieces_with_counts.crossJoin(F.broadcast(tot))
        .select(
            "piece", "n",
            F.round(
                F.log(
                    (F.col("n") + 1).cast("double")
                    / (F.col("tot") + F.col("v")).cast("double")
                ) * F.lit(float(LP_SCALE)), 0,
            ).cast("long").alias("lp_micro"),
        )
    )


def seed_vocab(words: DataFrame) -> DataFrame:
    """(piece, n, lp_micro) seed: all single chars + the top
    ``SEED_MULTI`` multi-char substrings by occurrence-weighted
    frequency (ties piece-asc).  ``words`` is (word, freq)."""
    occ = (
        words.select(
            F.explode(F.expr(_SPANS_S)).alias("s"), "freq"
        )
        .select(F.col("s.piece").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )
    singles = occ.filter(F.length("piece") == 1)
    # top-K via orderBy().limit(): plans as TakeOrderedAndProject
    # (per-partition top-SEED_MULTI + driver merge) — NOT a global
    # single-partition Window, which would serialize the charset^4-sized
    # distinct-piece relation at corpus scale.  Output is identical
    # because (n desc, piece asc) is a total order.
    multi = (
        occ.filter(F.length("piece") >= 2)
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(SEED_MULTI)
    )
    return _scored(singles.unionByName(multi))


def segment_words(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, freq, tokens): Viterbi segmentation of every word under
    ``vocab``'s (piece, lp_micro) scores — the encode pass."""
    spans = (
        words.select("word", "freq", F.explode(F.expr(_SPANS_S)).alias("s"))
        .select("word", "freq", "s.st", "s.en", "s.piece")
        .join(F.broadcast(vocab.select("piece", "lp_micro")), "piece")
        .select("word", "freq", "st", "en",
                (-F.col("lp_micro")).alias("cost"))
    )
    per_word = spans.groupBy("word").agg(
        F.first("freq").alias("freq"),
        F.collect_list(F.struct("st", "en", "cost")).alias("spans"),
    )
    return (
        per_word.withColumn("dp", F.expr(_DP_S))
        .withColumn("tokens", F.expr(_BT_S))
        .select("word", "freq", "tokens")
    )


def train_unigram(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Run seeding + ``T_EM`` Viterbi-EM rounds; returns
    ``(vocab, words)`` where ``vocab`` is the final (piece, n,
    lp_micro) table and ``words`` the (word, freq) relation.  Each
    round's vocab is EAGERLY localCheckpointed (the doremi/kmeans
    rounds-loop lineage discipline)."""
    # split-at-MAXW keeps the trainer total (no word can abort the
    # job) while staying within the oracle's unrolled-DP cap; the
    # oracle's w0 CTE applies the identical pre-split, so the
    # differential check covers the policy rather than dodging it.
    words = chunk_words(
        word_frequencies(docs, text_col=text_col)
    ).localCheckpoint()
    vocab = seed_vocab(words).localCheckpoint()
    pieces = vocab.select("piece")
    for _t in range(T_EM):
        seg = segment_words(words, vocab)
        counts = (
            seg.select(F.explode("tokens").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("n"))
        )
        refreshed = (
            pieces.join(counts, "piece", "left")
            .select("piece", F.coalesce("n", F.lit(0)).alias("n"))
        )
        vocab = _scored(refreshed).localCheckpoint()
    return vocab, words


# --- likelihood-loss vocabulary pruning (Kudo'18 §3.2) ----------------------


def prune_schedule(
    m0: int = SEED_MULTI,
    eta: float = PRUNE_ETA,
    target: int = PRUNE_TARGET_MULTI,
) -> list[int]:
    """Deterministic keep-count schedule: drop ``floor(eta·m)`` (min 1)
    multi-char pieces per round until ``target`` remain — Kudo'18's
    "remove the bottom η% ... repeat until |V| reaches the desired
    size".  With the defaults: 40 → 32 → 26 → 21 → 20."""
    ks, m = [], m0
    while m > target:
        m = max(target, m - max(1, int(m * eta)))
        ks.append(m)
    return ks


def _piece_alt_costs(vocab: DataFrame) -> DataFrame:
    """(piece, alt_c): for every multi-char piece, the Viterbi cost of
    segmenting the PIECE ITSELF with the identity span excluded — i.e.
    by the rest of the vocabulary.  This is the alternative-path cost
    Kudo'18's loss approximates removal with: if piece x is dropped,
    each of its n_x uses re-segments as x's own best sub-segmentation
    (always possible — every single char stays in the vocabulary).
    Pieces are at most MAX_PIECE_LEN chars, so the DP fold is
    constant-size; the whole relation is vocabulary-grain."""
    pw = vocab.filter(F.length("piece") >= 2).select(
        F.col("piece").alias("word")
    )
    spans = (
        pw.select("word", F.explode(F.expr(_SPANS_S)).alias("s"))
        .select("word", "s.st", "s.en", "s.piece")
        .filter(~((F.col("st") == 1) & (F.col("en") == F.length("word"))))
        .join(F.broadcast(vocab.select("piece", "lp_micro")), "piece")
        .select("word", "st", "en", (-F.col("lp_micro")).alias("cost"))
    )
    per = spans.groupBy("word").agg(
        F.collect_list(F.struct("st", "en", "cost")).alias("spans")
    )
    return (
        per.withColumn("dp", F.expr(_DP_S))
        .select(
            F.col("word").alias("piece"),
            F.expr("element_at(dp, length(word) + 1).c").alias("alt_c"),
        )
    )


def prune_round(vocab: DataFrame, words: DataFrame,
                keep_multi: int) -> DataFrame:
    """One Kudo'18 prune iteration: rank multi-char pieces by
    likelihood loss ``n·(alt_cost + lp)`` (how much the corpus
    log-likelihood drops if the piece is removed and its uses
    re-segment along their best alternative path), keep the top
    ``keep_multi`` (ties piece-asc; all single chars always survive
    for coverage), re-smooth over the reduced set, then run one EM
    round (segment → recount → rescore) so counts reflect the new
    vocabulary.  Top-K is orderBy().limit() — vocabulary-grain and
    TakeOrdered-planned, never a global Window."""
    singles = vocab.filter(F.length("piece") == 1).select("piece", "n")
    multi = vocab.filter(F.length("piece") >= 2)
    loss = (
        multi.join(_piece_alt_costs(vocab), "piece")
        .select(
            "piece", "n",
            (F.col("n") * (F.col("alt_c") + F.col("lp_micro")))
            .cast("long").alias("loss"),
        )
    )
    kept = (
        loss.orderBy(F.col("loss").desc(), F.col("piece").asc())
        .limit(keep_multi)
        .select("piece", "n")
    )
    pruned = _scored(singles.unionByName(kept))
    seg = segment_words(words, pruned)
    counts = (
        seg.select(F.explode("tokens").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )
    refreshed = (
        pruned.select("piece").join(counts, "piece", "left")
        .select("piece", F.coalesce("n", F.lit(0)).alias("n"))
    )
    return _scored(refreshed)


def train_unigram_pruned(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Full Kudo'18 §3.2 trainer: seeding + ``T_EM`` EM rounds
    (:func:`train_unigram`), then likelihood-loss pruning rounds down
    the :func:`prune_schedule` until ``PRUNE_TARGET_MULTI`` multi-char
    pieces remain, each prune followed by an EM round.  Per-round
    eager localCheckpoint (the rounds-loop lineage discipline)."""
    vocab, words = train_unigram(docs, text_col=text_col)
    for keep in prune_schedule():
        vocab = prune_round(vocab, words, keep).localCheckpoint()
    return vocab, words
