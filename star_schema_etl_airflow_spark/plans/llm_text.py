"""Text-analysis operators over the ``documents`` fixture — the
training-data-pipeline extension surface (quality scoring, language ID,
fingerprinting).  No reference equivalent (the reference is a sales ELT);
these extend the engine per the build plan (SURVEY.md §7.2 M7).

All expressions are engine built-ins (higher-order array functions), so
the Spark side stays in whole-stage codegen and the DuckDB oracle is an
exact replica.  Scale: every query is a single projection/aggregation
over the document scan — no shuffle except the final nothing; at 100 TB
these run map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    STOPWORDS,
    md5_long_duck,
    md5_long_spark,
    minhash_duck,
    minhash_spark,
    shingles_duck,
    shingles_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

# letter runs | digit runs | single non-alnum-non-space chars
_SUBWORD_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"
_SUBWORD_RE_D = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# --- text_stats: token counts, type-token ratio, length quality gate -------


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.expr(f"size({_TOKS_S})").alias("n_tokens"),
        F.expr(f"size(array_distinct({_TOKS_S}))").alias("n_distinct_tokens"),
        F.expr(
            f"cast(aggregate(transform({_TOKS_S}, x -> length(x)), 0L, (a, x) -> a + x) as double)"
            f" / cast(size({_TOKS_S}) as double)"
        ).alias("avg_token_len"),
        F.expr(
            f"cast(size(array_distinct({_TOKS_S})) as double) / cast(size({_TOKS_S}) as double)"
        ).alias("type_token_ratio"),
        # BPE-ish pre-tokenization count: letter runs, digit runs, and
        # individual punctuation marks — the cheap stand-in for a real BPE
        # vocab's token count (both engines' regex agree on this subset)
        F.expr(f"regexp_count(text, '{_SUBWORD_RE}')").alias("n_subword_tokens"),
        F.expr(
            f"cast(regexp_count(text, '[^a-zA-Z0-9\\\\s]') as double)"
            f" / cast(length(text) as double)"
        ).alias("punct_ratio"),
    ).withColumn(
        "quality_bucket",
        F.when((F.col("n_tokens") >= 20) & (F.col("type_token_ratio") >= 0.15), "keep")
        .when(F.col("n_tokens") >= 20, "review")
        .otherwise("drop"),
    )


TEXT_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         len({_TOKS_D}) AS n_tokens,
         len(list_distinct({_TOKS_D})) AS n_distinct_tokens,
         CAST(list_sum(list_transform({_TOKS_D}, x -> length(x))) AS DOUBLE)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS avg_token_len,
         CAST(len(list_distinct({_TOKS_D})) AS DOUBLE)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS type_token_ratio,
         CAST(len(regexp_extract_all(text, '{_SUBWORD_RE_D}')) AS INTEGER)
           AS n_subword_tokens,
         CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS punct_ratio
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_distinct_tokens AS INTEGER) AS n_distinct_tokens,
       avg_token_len, type_token_ratio, n_subword_tokens, punct_ratio,
       CASE WHEN n_tokens >= 20 AND type_token_ratio >= 0.15 THEN 'keep'
            WHEN n_tokens >= 20 THEN 'review'
            ELSE 'drop' END AS quality_bucket
FROM t
"""

# --- lang_id: stopword-density heuristic -----------------------------------

_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language ID heuristic: density of English stopwords.

    A real pipeline swaps the predicate for per-language character-n-gram
    profiles; the operator shape (map-only scoring projection) is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        F.expr(
            f"cast(size(filter({_TOKS_S}, x -> x in ({_STOP_IN}))) as double)"
            f" / cast(size({_TOKS_S}) as double)"
        ).alias("stopword_ratio"),
    ).withColumn(
        "predicted_lang",
        F.when(F.col("stopword_ratio") >= 0.05, "en").otherwise("und"),
    )


LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS declared_lang,
         CAST(len(list_filter({_TOKS_D}, x -> x IN ({_STOP_IN}))) AS DOUBLE)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS stopword_ratio
  FROM documents
)
SELECT doc_id, declared_lang, stopword_ratio,
       CASE WHEN stopword_ratio >= 0.05 THEN 'en' ELSE 'und' END AS predicted_lang
FROM t
"""

# --- doc_fingerprint: content hash + min-shingle rolling fingerprint -------

_SH_S = shingles_spark(_TOKS_S)
_SH_D = shingles_duck(_TOKS_D)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fingerprints: full-content md5, integer content hash,
    and the min word-shingle hash (winnowing-style rolling fingerprint —
    stable under small appends, unlike the full hash)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.expr(md5_long_spark("text")).alias("content_hash"),
        F.expr(minhash_spark(_SH_S, 0)).alias("min_shingle_hash"),
    )


DOC_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       md5(text) AS content_md5,
       {md5_long_duck('text')} AS content_hash,
       {minhash_duck(_SH_D, 0)} AS min_shingle_hash
FROM documents
"""

# --- quality percentile gate: relative threshold per language --------------


def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents at or above the 25th quality percentile WITHIN their
    language — the relative-threshold curation step (absolute quality
    cutoffs don't transfer across languages/domains; percentile gates do).

    Exact rank here for oracle-checkability (ties broken on doc_id, so
    percent_rank is deterministic).  At 100 TB the per-language sort
    becomes the bottleneck and a dominant language skews the partition —
    the scale path is ``quality_gate_approx`` below: a two-pass
    ``percentile_approx`` threshold + broadcast map-only filter with no
    per-language global sort (invariant vs this exact gate pinned by
    ``tests/test_llm_text.py::test_quality_gate_approx_matches_exact``)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ttr = docs.select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(size(array_distinct({_TOKS_S})) as double)"
            f" / cast(size({_TOKS_S}) as double)"
        ).alias("ttr"),
    )
    w = Window.partitionBy("lang").orderBy("ttr", "doc_id")
    return (
        ttr.withColumn("qrank", F.percent_rank().over(w))
        .filter(F.col("qrank") >= 0.25)
        .select("doc_id", "lang", "ttr", "qrank")
    )


def exact_regime_guard(thr_col: str, n_col: str, accuracy: int):
    """Column expression that passes ``thr_col`` through only while the
    group's row count stays under the sketch ``accuracy`` — the regime in
    which ``percentile_approx`` is exact (no compression) and the DuckDB
    rank-``ceil(q*n)`` oracle matches bit-for-bit.

    Crossing the line raises ``assert_true`` at execution time instead of
    surfacing later as a silent oracle hash mismatch: a bigger fixture
    fails LOUDLY with this message, and the caller either raises
    ``accuracy`` or switches to the documented ±rel_err approximate
    contract (dropping the exact-oracle claim)."""
    return F.when(
        F.expr(
            f"assert_true({n_col} <= {accuracy}, "
            f"'percentile_approx exact-regime assumption violated: a group "
            f"exceeds accuracy={accuracy} rows, the sketch now compresses "
            f"and rank-exact oracles no longer apply — raise accuracy or "
            f"use the approximate contract')"
        ).isNull(),
        F.col(thr_col),
    )


def quality_gate_approx(
    df: DataFrame,
    lang_col: str = "lang",
    value_col: str = "ttr",
    q: float = 0.25,
    rel_err: float = 0.01,
    assert_exact: bool = False,
) -> DataFrame:
    """Scale path for :func:`quality_percentile_gate`: keep rows whose
    ``value_col`` is at or above the per-``lang_col`` ``q``-quantile,
    without any per-language global sort.

    Two passes, both skew-immune:
    1. ``groupBy(lang).agg(percentile_approx(value, q))`` — a partial-agg
       hash aggregate (each task sketches locally, the shuffle carries one
       KLL-style sketch per (partition, lang), never the rows);
    2. broadcast the tiny per-language threshold table back and filter
       map-only.

    ``rel_err`` is the rank error of the sketch: ``percentile_approx``'s
    accuracy knob guarantees a rank within ``rel_err * N`` of the exact
    quantile, so the kept fraction is within ~``rel_err`` of the exact
    gate's (pinned by ``tests/test_llm_text.py``).  At 100 TB this is the
    form you run: the exact window form ships a dominant language's whole
    corpus into one reducer; this one ships sketches.
    """
    accuracy = max(100, int(round(1.0 / rel_err)))
    thresholds = df.groupBy(lang_col).agg(
        F.percentile_approx(value_col, F.lit(q), F.lit(accuracy)).alias(
            "_q_threshold"
        ),
        F.count(F.lit(1)).alias("_q_n"),
    )
    if assert_exact:
        # differential-check mode: the exact-regime assumption must fail
        # loudly (see exact_regime_guard), never as an oracle red
        thresholds = thresholds.select(
            lang_col,
            exact_regime_guard("_q_threshold", "_q_n", accuracy)
            .alias("_q_threshold"),
        )
    else:
        thresholds = thresholds.drop("_q_n")
    return (
        df.join(F.broadcast(thresholds), lang_col)
        .filter(F.col(value_col) >= F.col("_q_threshold"))
        .drop("_q_threshold")
    )


QUALITY_GATE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct({_TOKS_D})) AS DOUBLE)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS ttr
  FROM documents
),
r AS (
  SELECT doc_id, lang, ttr,
         PERCENT_RANK() OVER (PARTITION BY lang ORDER BY ttr, doc_id) AS qrank
  FROM t
)
SELECT doc_id, lang, ttr, qrank FROM r WHERE qrank >= 0.25
"""


def quality_gate_approx_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The :func:`quality_gate_approx` scale path run end-to-end on the
    documents fixture (sketch thresholds + broadcast map-only filter, no
    per-language sort).

    Differential-checkability: ``percentile_approx`` is *exact* while a
    group's row count stays under the sketch accuracy (no compression
    happens), and in that regime it returns precisely the order statistic
    at rank ``ceil(q*n)`` (verified empirically per language at q = 0.05,
    0.25, 0.95) — which is what the DuckDB oracle
    computes.  ``rel_err=1e-4`` (accuracy 10 000) keeps every fixture
    language in the exact regime; at production scale the sketch
    compresses and the threshold carries the documented ±rel_err rank
    error (pinned vs the exact gate in ``tests/test_llm_text.py``)."""
    docs = load_table(spark, sf_dir, "documents")
    ttr = docs.select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(size(array_distinct({_TOKS_S})) as double)"
            f" / cast(size({_TOKS_S}) as double)"
        ).alias("ttr"),
    )
    return quality_gate_approx(
        ttr, "lang", "ttr", q=0.25, rel_err=1e-4, assert_exact=True
    )


QUALITY_GATE_APPROX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct({_TOKS_D})) AS DOUBLE)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS ttr
  FROM documents
),
r AS (
  SELECT doc_id, lang, ttr,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ttr) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM t
),
thr AS (
  SELECT lang,
         MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
             THEN ttr END) AS threshold
  FROM r GROUP BY lang
)
SELECT t.doc_id, t.lang, t.ttr
FROM t JOIN thr ON t.lang = thr.lang
WHERE t.ttr >= thr.threshold
"""

# --- repetition_stats: Gopher-style repetition filters ---------------------

def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction, fraction
    of tokens in the most frequent word, fraction of bigrams in the most
    frequent bigram, and a keep/drop gate.

    Spark-first shape: explode → (doc, term) count → per-doc max/sum —
    two partial-agg-friendly hash aggregates instead of nested O(n²)
    array lambdas (which defeat codegen and recompile per query).  At
    100 TB the shuffle key (doc_id, term) is high-cardinality and
    skew-free; the per-doc rollup is tiny."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(_TOKS_S).alias("toks"))
    wstats = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("int").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    bstats = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "case when size(toks) < 2 then array() "
                    "else transform(sequence(0, size(toks) - 2), "
                    "i -> concat(element_at(toks, i + 1), ' ', "
                    "element_at(toks, i + 2))) end"
                )
            ).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bc"))
    )
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_word_frac"),
            (
                F.col("top_c").cast("double") / F.col("n_tokens").cast("double")
            ).alias("top_word_frac"),
            F.when(F.col("n_tokens") < 2, F.lit(None).cast("double"))
            .otherwise(
                F.col("top_bc").cast("double")
                / (F.col("n_tokens") - 1).cast("double")
            )
            .alias("top_bigram_frac"),
        )
        .withColumn(
            "repetition_gate",
            F.when(
                (F.col("dup_word_frac") <= 0.55)
                & (F.col("top_word_frac") <= 0.10),
                "keep",
            ).otherwise("drop"),
        )
    )


# Same explode/GROUP BY shape as the Spark side (array lambdas that
# reference the split expression re-evaluate it per element in both
# engines — the unnest form is linear).
REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS_D} AS toks FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
  GROUP BY doc_id, w
),
ws AS (
  SELECT doc_id, CAST(SUM(c) AS INTEGER) AS n_tokens,
         COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM wc GROUP BY doc_id
),
bc AS (
  SELECT doc_id, b, COUNT(*) AS c
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) < 2 THEN []
                       ELSE list_transform(range(0, len(toks) - 1),
                            i -> toks[i + 1] || ' ' || toks[i + 2]) END) AS b
    FROM t
  )
  GROUP BY doc_id, b
),
bs AS (
  SELECT doc_id, MAX(c) AS top_bc FROM bc GROUP BY doc_id
)
SELECT ws.doc_id, ws.n_tokens,
       1.0 - CAST(ws.n_distinct AS DOUBLE) / CAST(ws.n_tokens AS DOUBLE)
         AS dup_word_frac,
       CAST(ws.top_c AS DOUBLE) / CAST(ws.n_tokens AS DOUBLE)
         AS top_word_frac,
       CASE WHEN ws.n_tokens < 2 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(bs.top_bc AS DOUBLE) / CAST(ws.n_tokens - 1 AS DOUBLE)
       END AS top_bigram_frac,
       CASE WHEN 1.0 - CAST(ws.n_distinct AS DOUBLE) / CAST(ws.n_tokens AS DOUBLE) <= 0.55
             AND CAST(ws.top_c AS DOUBLE) / CAST(ws.n_tokens AS DOUBLE) <= 0.10
            THEN 'keep' ELSE 'drop' END AS repetition_gate
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
"""

# --- pii_scrub: regex redaction (emails, phone numbers) --------------------

# RE2 ∩ Java-regex-compatible patterns (no lookaround, no \b needed).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace emails and phone numbers with typed
    placeholder tokens and count the redactions.  The fixture corpus has
    no organic PII, so the query deterministically injects one email and
    one phone per document first — the operator under test is the
    scrub projection (map-only; regexes run JVM-side at scale).
    Output carries md5(scrubbed) instead of the full text."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("aug_text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("aug_text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("aug_text"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("aug_text"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


PII_SCRUB_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or 555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug_text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug_text, '{_EMAIL_RE}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(aug_text, '{_PHONE_RE}')) AS INTEGER)
         AS n_phones,
       md5(regexp_replace(regexp_replace(aug_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM aug
"""

register(QuerySpec("repetition_stats", repetition_stats, REPETITION_ORACLE,
                   tags=("LLM-text",)))
register(QuerySpec("pii_scrub", pii_scrub, PII_SCRUB_ORACLE,
                   tags=("LLM-text",)))
register(QuerySpec("quality_percentile_gate", quality_percentile_gate,
                   QUALITY_GATE_ORACLE, tags=("LLM-text",)))
register(QuerySpec("quality_gate_approx", quality_gate_approx_q,
                   QUALITY_GATE_APPROX_ORACLE, tags=("LLM-text",)))
register(QuerySpec("text_stats", text_stats, TEXT_STATS_ORACLE,
                   tags=("LLM-text",)))
register(QuerySpec("lang_id", lang_id, LANG_ID_ORACLE, tags=("LLM-text",)))
register(QuerySpec("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_ORACLE,
                   tags=("LLM-text",)))


# --- chunking: overlapping fixed-width windows for embedding pipelines -----

CHUNK_CHARS = 200
CHUNK_OVERLAP = 50
_CHUNK_STEP = CHUNK_CHARS - CHUNK_OVERLAP


def chunk_documents(df: DataFrame, text_col: str = "text",
                    chunk_chars: int = CHUNK_CHARS,
                    overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """Split documents into overlapping character windows — the
    preprocessing step between curation and embedding (every RAG /
    embedding pipeline chunks; retrieval quality depends on stable,
    reproducible boundaries).

    Chunk k covers 1-based offsets [1 + k*step, 1 + k*step + chunk_chars)
    with step = chunk_chars - overlap; the last chunk is the remainder
    (never empty, never duplicated: k ranges over ceil-div of the
    overhang).  Pure ``explode(sequence(...))`` + ``substring`` — map-only
    column expressions, no shuffle, no UDF; at 100 TB chunking happens at
    scan speed and multiplies rows before the (already row-parallel)
    embedding stage."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    n_chunks = (
        f"greatest(1, cast(ceil((length({text_col}) - {chunk_chars}) "
        f"/ {step}.0d) as int) + 1)"
    )
    return (
        df.withColumn("__n_chunks", F.expr(n_chunks))
        .withColumn(
            "chunk_idx", F.expr("explode(sequence(0, __n_chunks - 1))")
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(f"1 + chunk_idx * {step}").alias("chunk_start"),
            F.expr(
                f"substring({text_col}, 1 + chunk_idx * {step}, {chunk_chars})"
            ).alias("chunk_text"),
            F.col("__n_chunks").alias("n_chunks"),
        )
    )


def chunk_docs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs)


CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text,
         GREATEST(1, CAST(ceil((len(text) - {CHUNK_CHARS}) / {_CHUNK_STEP}.0)
                     AS INTEGER) + 1) AS n_chunks
  FROM documents
),
e AS (
  SELECT doc_id, text, n_chunks,
         unnest(generate_series(0, n_chunks - 1)) AS k
  FROM d
)
SELECT doc_id,
       CAST(k AS INTEGER) AS chunk_idx,
       CAST(1 + k * {_CHUNK_STEP} AS INTEGER) AS chunk_start,
       substr(text, CAST(1 + k * {_CHUNK_STEP} AS INTEGER), {CHUNK_CHARS})
         AS chunk_text,
       n_chunks
FROM e
"""

register(QuerySpec("chunk_documents", chunk_docs_query, CHUNK_ORACLE,
                   tags=("LLM-text", "chunking")))


# --- winsorization: per-group quantile clipping ----------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = WINSOR_LO,
    hi: float = WINSOR_HI,
    accuracy: int = 10_000,
    assert_exact: bool = False,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo, hi] quantile band — the
    outlier treatment for numeric curation signals (a single 10 MB
    document must not dominate a mean length; clipping beats dropping
    when the row itself is valid).

    Same two-pass shape as :func:`quality_gate_approx`: a partial-agg
    ``percentile_approx`` sketch per group (exact while the group stays
    under ``accuracy``), broadcast back, then a map-only
    ``least/greatest`` clamp.  No per-group sort at any scale."""
    bounds = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, F.lit(lo), F.lit(accuracy))
        .alias("__lo"),
        F.percentile_approx(value_col, F.lit(hi), F.lit(accuracy))
        .alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    if assert_exact:
        bounds = bounds.select(
            group_col,
            exact_regime_guard("__lo", "__n", accuracy).alias("__lo"),
            exact_regime_guard("__hi", "__n", accuracy).alias("__hi"),
        )
    else:
        bounds = bounds.drop("__n")
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(
            f"{value_col}_winsor",
            F.greatest(F.col("__lo"), F.least(F.col("__hi"), F.col(value_col))),
        )
        .drop("__lo", "__hi")
    )


def winsorize_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("n_chars")
    )
    return winsorize(docs, "lang", "n_chars", assert_exact=True)


WINSORIZE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
b AS (
  SELECT lang,
         MAX(CASE WHEN rn = CAST(ceil({WINSOR_LO} * n) AS BIGINT)
             THEN n_chars END) AS lo,
         MAX(CASE WHEN rn = CAST(ceil({WINSOR_HI} * n) AS BIGINT)
             THEN n_chars END) AS hi
  FROM r GROUP BY lang
)
SELECT r.doc_id, r.lang, r.n_chars,
       GREATEST(b.lo, LEAST(b.hi, r.n_chars)) AS n_chars_winsor
FROM r JOIN b USING (lang)
"""

register(QuerySpec("winsorize_doc_lengths", winsorize_doc_lengths,
                   WINSORIZE_ORACLE, tags=("LLM-text",)))
