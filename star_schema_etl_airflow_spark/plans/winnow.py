"""Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm), plus the fingerprint-overlap join.

The repo's dedup family covers set sketches (MinHash), bit sketches
(SimHash), exact spans (ExactSubstr), and a global-min shingle
(``doc_fingerprint``); winnowing is the remaining classic: slide a
window of ``W`` consecutive k-gram hashes and keep each window's
minimum — the selected positions form the document's fingerprint set.
Guarantee (the paper's Theorem): any substring match of length at
least ``W + K - 1`` tokens shares at least one selected fingerprint,
while the expected density of selections is 2/(W+1) — a tunable,
position-robust sample that a fixed stride cannot give.

Engine-exactness: the per-window minimum is taken over
``key = g * 2^POS_BITS + pos`` (gram hashes are md5-based < 2^30, so
the key fits a BIGINT; ties on g break to the lowest position) with
the identical ``ROWS BETWEEN CURRENT ROW AND W-1 FOLLOWING`` frame on
both engines; only FULL windows select (``pos <= n_grams - W``, the
paper's definition — docs shorter than W+K-1 tokens yield no
fingerprints).  POS_BITS=20 bounds documents at 2^20 grams (~1M
tokens); an explicit guard in the key expression RAISES (with the
offending doc_id) on any longer document rather than silently
aliasing position bits into the gram hash — raise POS_BITS for
longer documents.

Overlap join scale shape: fingerprints are an inverted index keyed by
gram hash; the pair join is per-gram-group quadratic, so grams seen in
more than ``DF_CAP`` documents are dropped first (boilerplate shingles
carry no matching signal — the same DF-cap discipline as the sparse
cosine operator), keeping every group bounded.  The window selection
itself is doc-local (one partition-by-doc window, no cross-doc
shuffle).

Reference parity note: the reference (Airflow + BigQuery star-schema
ETL) has no fingerprinting surface; this extends the engine's
LLM-curation family (SURVEY.md "beyond the reference" scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    UHASH_M,
    md5_long_duck,
    tokens_duck,
)
from star_schema_etl_airflow_spark.operators.decontaminate import (
    positional_gram_hashes,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    build_corpus,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register

WINNOW_K = 4        # tokens per gram
WINNOW_W = 6        # gram hashes per window
POS_BITS = 20       # key = g * 2^POS_BITS + pos
SHARED_T = 2        # overlap pairs must share >= this many fingerprints
DF_CAP = 50         # drop grams fingerprinted in more docs than this


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """``(doc_id, g, pos)`` — the winnowing fingerprint set of every
    document in ``docs(doc_id, text)``."""
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(positional_gram_hashes("text", WINNOW_K))
        ).alias("pos", "g"),
    )
    wframe = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    whole = Window.partitionBy("doc_id")
    # Positions beyond 2^POS_BITS would alias into the gram-hash bits of
    # the packed key and corrupt selection identically on both engines —
    # invisible to the oracle sweep (r11 ADVICE).  Guard in the key
    # expression itself (not a separate asserted column, which column
    # pruning could drop): any out-of-range position raises with the
    # offending doc_id instead of silently mis-selecting.
    guarded_key = F.when(
        F.col("pos") >= F.lit(1 << POS_BITS),
        F.raise_error(F.concat(
            F.lit("winnow: document "), F.col("doc_id").cast("string"),
            F.lit(f" exceeds 2^{POS_BITS} grams; raise POS_BITS "
                  "for longer documents"))).cast("long"),
    ).otherwise(F.col("g") * F.lit(1 << POS_BITS) + F.col("pos"))
    return (
        pos.withColumn("key", guarded_key)
        .withColumn("wmin", F.min("key").over(wframe))
        .withColumn("n", F.count(F.lit(1)).over(whole))
        .filter(F.col("pos") <= F.col("n") - WINNOW_W)  # full windows only
        .select("doc_id", "wmin")
        .distinct()
        .select(
            "doc_id",
            F.expr(f"wmin div {1 << POS_BITS}").alias("g"),
            F.expr(f"wmin % {1 << POS_BITS}").cast("int").alias("pos"),
        )
    )


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(build_corpus(spark, sf_dir))


def doc_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= SHARED_T winnowing fingerprints (gram
    hash values, DF-capped) — MOSS-style overlap detection over the
    amplified corpus, where recrawl mutants genuinely share most of
    their fingerprints with their originals."""
    fps = persist_once(
        winnow_fingerprints(build_corpus(spark, sf_dir))
        .select("doc_id", "g").distinct()
    )
    rare = (
        fps.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("g")
    )
    keyed = fps.join(rare, "g")
    a = keyed.select(F.col("doc_id").alias("doc_a"), "g")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= SHARED_T)
    )


def _grams_duck(k: int) -> str:
    toks = tokens_duck("text")
    gram = md5_long_duck(
        f"array_to_string(({toks})[i + 1 : i + {k}], chr(32))")
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE list_transform(range(0, len({toks}) - {k} + 1), "
        f"i -> ({gram}) % {UHASH_M}) END"
    )


_SEL_DUCK = f"""
pg AS (
  SELECT doc_id, {_grams_duck(WINNOW_K)} AS gs FROM corpus
),
pp AS (
  SELECT doc_id, gs[p] AS g, p - 1 AS pos, len(gs) AS n
  FROM (SELECT doc_id, gs, unnest(range(1, len(gs) + 1)) AS p FROM pg)
),
sel AS (
  SELECT DISTINCT doc_id, wmin
  FROM (
    SELECT doc_id, pos, n,
           MIN(g * {1 << POS_BITS} + pos) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
           ) AS wmin
    FROM pp
  )
  WHERE pos <= n - {WINNOW_W}
)"""


_FPS_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_SEL_DUCK}
SELECT doc_id,
       wmin // {1 << POS_BITS} AS g,
       CAST(wmin % {1 << POS_BITS} AS INTEGER) AS pos
FROM sel
"""

_OVERLAP_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_SEL_DUCK},
fps AS (
  SELECT DISTINCT doc_id, wmin // {1 << POS_BITS} AS g FROM sel
),
rare AS (
  SELECT g FROM fps GROUP BY g HAVING COUNT(*) <= {DF_CAP}
),
keyed AS (SELECT f.doc_id, f.g FROM fps f JOIN rare r ON f.g = r.g)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
FROM keyed a JOIN keyed b ON a.g = b.g AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {SHARED_T}
"""

register(QuerySpec("doc_winnow_fingerprints", doc_winnow_fingerprints,
                   _FPS_ORACLE, tags=("LLM-text", "fingerprint")))
register(QuerySpec("doc_winnow_overlap", doc_winnow_overlap,
                   _OVERLAP_ORACLE, tags=("LLM-dedup", "fingerprint")))
