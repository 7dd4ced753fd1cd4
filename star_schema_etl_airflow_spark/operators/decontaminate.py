"""Train↔eval decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Benchmark contamination audits are a standard step in LLM training-data
pipelines (the reference ETL has no equivalent — this extends the engine's
curation surface alongside dedup and sampling).  A training document is
*contaminated* when it contains enough of an eval document's word n-grams
that the benchmark can no longer measure generalization.

Scale design (100 TB train corpus vs ~1e4–1e6 eval docs):

- The EVAL side is tiny by definition (benchmark suites are megabytes).
  Its exploded gram-hash index is broadcast, so the train-side explode
  feeds a map-side broadcast hash join — the 100 TB relation is never
  shuffled on the gram key.
- Grams travel as 8-byte int hashes (one md5 pass per shingle, shared
  with the MinHash machinery in ``functions/text.py``), never strings.
- The only shuffle is the partial-aggregated ``groupBy(train_id,
  eval_id)`` over join survivors — rows that share at least one gram,
  a tiny fraction of the corpus.  No all-pairs stage anywhere.
- LONG grams (default 8 words, the published decontamination practice —
  GPT-3 used 13-grams) are what keep the gram join bounded: short grams
  are shared by huge numbers of documents (stopword runs), and the join
  fan-out is Σ_g train_count(g) × eval_count(g) — quadratic in gram
  popularity.  8-word grams are near-unique, so fan-out ≈ true overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    shingle_hashes_spark,
    shingles_spark,
    tokens_spark,
)
from star_schema_etl_airflow_spark.functions.caching import persist_once


DECONTAM_NGRAM = 8  # long grams are near-unique — see overlap_pairs


def gram_hashes_expr(text_col: str, n: int = DECONTAM_NGRAM) -> str:
    """Distinct word-``n``-gram hashes of a text column (Spark SQL
    expression; hash collisions ~2^-30 — identical on the oracle side)."""
    return (
        "array_distinct("
        f"{shingle_hashes_spark(shingles_spark(tokens_spark(text_col), n))})"
    )


def overlap_pairs(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 1,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """``(train_id, eval_id, n_shared, overlap_frac)`` for every doc pair
    sharing ≥ ``min_shared`` distinct word-n-gram hashes.

    ``overlap_frac`` is the fraction of the EVAL doc's grams found in the
    train doc (the decontamination-relevant direction: a long train doc
    that swallows a whole eval doc scores ~1.0 regardless of its own
    length).
    """
    # project the token array into a column FIRST: inlining split() into
    # the shingle lambda re-tokenizes per gram position (~4× slower; no
    # common-subexpression elimination inside lambda bodies)
    toks = tokens_spark(text_col)
    g = f"array_distinct({shingle_hashes_spark(shingles_spark('__t', n))})"
    # the eval gram index is tiny and feeds two broadcasts (grams, sizes)
    # — persist it so each broadcast build doesn't recompute the lineage
    ev = persist_once(eval_df.select(
        F.col(id_col).alias("eval_id"), F.expr(toks).alias("__t")
    ).select("eval_id", F.expr(g).alias("__h")))
    ev_sizes = ev.select("eval_id", F.size("__h").alias("n_eval_grams"))
    ev_grams = ev.select("eval_id", F.explode("__h").alias("g"))
    tr_grams = train_df.select(
        F.col(id_col).alias("train_id"), F.expr(toks).alias("__t")
    ).select("train_id", F.explode(F.expr(g)).alias("g"))
    pairs = (
        tr_grams.join(F.broadcast(ev_grams), "g")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.join(F.broadcast(ev_sizes), "eval_id").select(
        "train_id",
        "eval_id",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_eval_grams").cast("double"))
        .alias("overlap_frac"),
    )


def contamination_flags(pairs: DataFrame, min_shared: int) -> DataFrame:
    """Per-train-doc verdict over an :func:`overlap_pairs` result:
    ``(train_id, n_eval_matched, max_shared, contaminated)``.

    Only docs sharing ≥ 1 gram with some eval doc appear (inner semantics);
    ``contaminated`` (int 0/1) applies the ``min_shared`` policy so the
    caller can audit near-misses instead of silently dropping them.
    """
    return (
        pairs.groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matched"),
            F.max("n_shared").alias("max_shared"),
        )
        .withColumn(
            "contaminated", (F.col("max_shared") >= min_shared).cast("int")
        )
    )


def drop_contaminated(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 4,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """The pipeline composition: remove contaminated docs from the corpus.

    Left-anti join against the flagged id set — the train relation streams
    through once; the flagged set is corpus-sized only in the pathological
    all-contaminated case.
    """
    flagged = (
        contamination_flags(
            overlap_pairs(train_df, eval_df, id_col, text_col, min_shared, n),
            min_shared,
        )
        .filter(F.col("contaminated") == 1)
        .select(F.col("train_id").alias(id_col))
    )
    return train_df.join(flagged, id_col, "left_anti")


def positional_gram_hashes(text_col: str, n: int = DECONTAM_NGRAM) -> str:
    """Gram hashes in token-position order (NOT distinct — position i of
    the result is the gram starting at token i).  Docs shorter than ``n``
    tokens produce an empty array.

    The tokenizer is bound ONCE per document through a one-element-array
    lambda (``transform(array(toks), __t -> ...)[0]``): an inline
    ``{toks}`` splice re-evaluates the regexp split per gram position
    inside the position lambda (no CSE across lambda invocations),
    which measured 1.9× slower on the corpus gram stage at sf0.1."""
    toks = tokens_spark(text_col)
    grams = (
        f"transform(array({toks}), __t -> "
        f"case when size(__t) < {n} then array() "
        f"else transform(sequence(0, size(__t) - {n}), "
        f"i -> array_join(slice(__t, i + 1, {n}), ' ')) end)[0]"
    )
    return shingle_hashes_spark(grams)


def matched_spans(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Maximal contaminated token spans per (train, eval) doc pair:
    ``(train_id, eval_id, span_start, span_end, span_tokens)`` with
    ``[span_start, span_end)`` token intervals.

    The span granularity is what substring-level dedup/decontamination
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better") acts on: instead of dropping a whole 10k-token document for
    one leaked paragraph, the pipeline can excise the span.  Matched gram
    *positions* are merged islands-and-gaps style: two matches belong to
    one span when their gram starts are ≤ ``n`` apart (their token
    windows touch or overlap).

    Scale shape: identical to :func:`overlap_pairs` — the eval gram set
    broadcasts, the train side explodes positionally and joins map-side;
    the window partitions on (train_id, eval_id), a fine-grained
    skew-free key (each partition holds one doc pair's match positions).
    """
    from pyspark.sql import Window

    ev_grams = (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.explode(F.expr(gram_hashes_expr(text_col, n))).alias("g"),
        )
    )
    tr_pos = train_df.select(
        F.col(id_col).alias("train_id"),
        F.posexplode(F.expr(positional_gram_hashes(text_col, n))).alias(
            "pos", "g"
        ),
    )
    matched = (
        tr_pos.join(F.broadcast(ev_grams), "g")
        .select("train_id", "eval_id", "pos")
        .distinct()
    )
    w = Window.partitionBy("train_id", "eval_id").orderBy("pos")
    spans = (
        matched.withColumn(
            "new_span",
            (
                F.coalesce(
                    F.col("pos") - F.lag("pos").over(w), F.lit(n + 1)
                )
                > n
            ).cast("long"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("train_id", "eval_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
        )
    )
    return spans.select(
        "train_id",
        "eval_id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
    )
