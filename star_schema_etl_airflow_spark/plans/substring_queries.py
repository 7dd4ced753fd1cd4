"""Registered queries for corpus-wide exact-substring dedup
(operators/substring_dedup.py — the Lee et al. ExactSubstr method as a
positional-gram fingerprint join).

Runs over the dup-augmented corpus of ``plans/llm_dedup.py`` so the
differential check sees real duplicated spans (every synthetic copy
duplicates its base document's whole token sequence, and genuine
boilerplate repeats inside the fixture text), not just empty output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    tokens_duck,
)
from star_schema_etl_airflow_spark.functions.text import UHASH_M
from star_schema_etl_airflow_spark.operators.substring_dedup import (
    SUBSTR_NGRAM,
    duplicate_substring_spans,
    excise_spans,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    build_corpus,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

_N = SUBSTR_NGRAM
_TOKS_D = tokens_duck("text")
# hashed positional grams — the SAME md5-mod quantity Spark compares, so
# an (astronomically unlikely) hash collision affects both engines alike
_GRAMS_D = (
    f"CASE WHEN len({_TOKS_D}) < {_N} THEN [] "
    f"ELSE list_transform(range(0, len({_TOKS_D}) - {_N} + 1), "
    f"i -> ({md5_long_duck(f'array_to_string(({_TOKS_D})[i + 1 : i + {_N}], chr(32))')}) % {UHASH_M}) END"
)


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # span mining reads the corpus twice (the documented paper-parity
    # trade); persist the FIXTURE AMPLIFIER output so its 3-branch
    # union + regexp mutation run once, not per pass.  In production
    # the corpus is an at-rest table and this persist is dropped — the
    # two passes themselves are the design, not the re-derivation.
    return duplicate_substring_spans(
        persist_once(build_corpus(spark, sf_dir)), n=_N)


_SPAN_CTES = f"""corpus AS ({CORPUS_DUCK}),
pg AS (SELECT doc_id, {_GRAMS_D} AS gs FROM corpus),
pgp AS (SELECT doc_id, gs, unnest(range(1, len(gs) + 1)) AS p FROM pg),
pp AS (SELECT doc_id, gs[p] AS g, p - 1 AS pos FROM pgp),
sstats AS (
  SELECT g, COUNT(*) AS occ, MIN(doc_id) AS fdoc
  FROM pp GROUP BY g HAVING COUNT(*) > 1
),
fpos AS (
  SELECT p.g, MIN(p.pos) AS fp
  FROM pp p JOIN sstats s ON p.g = s.g AND p.doc_id = s.fdoc
  GROUP BY p.g
),
dup AS (
  SELECT DISTINCT p.doc_id, p.pos
  FROM pp p JOIN sstats s ON p.g = s.g JOIN fpos f ON p.g = f.g
  WHERE NOT (p.doc_id = s.fdoc AND p.pos = f.fp)
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN COALESCE(
                pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                {_N + 1}) > {_N}
              THEN 1 ELSE 0 END AS new_span
  FROM dup
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (
           PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS span_id
  FROM isl
),
spans AS (
  SELECT doc_id,
         MIN(pos) AS span_start,
         MAX(pos) + {_N} AS span_end,
         MAX(pos) + {_N} - MIN(pos) AS span_tokens
  FROM sp GROUP BY doc_id, span_id
)"""

DEDUP_SUBSTRING_SPANS_ORACLE = f"""
WITH {_SPAN_CTES}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
"""

register(QuerySpec("dedup_substring_spans", dedup_substring_spans,
                   DEDUP_SUBSTRING_SPANS_ORACLE, tags=("LLM-DEDUP",)))


def dedup_substring_excised(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three corpus passes (spans ×2 + the excision join); one persisted
    # amplifier derivation — see dedup_substring_spans
    corpus = persist_once(build_corpus(spark, sf_dir))
    return excise_spans(corpus, duplicate_substring_spans(corpus, n=_N))


# CTE chain ending in excised(doc_id, clean_text, kept_tokens,
# dropped_tokens) — reused by the registered oracle and the composed
# curation pipeline v5 (plans/llm_pipeline5.py)
EXCISED_CTES = f"""{_SPAN_CTES},
per_doc AS (
  SELECT doc_id,
         list(struct_pack(s := span_start, e := span_end)) AS sps
  FROM spans GROUP BY doc_id
),
toked AS (SELECT doc_id, {_TOKS_D} AS t FROM corpus),
kept AS (
  SELECT td.doc_id, td.t, COALESCE(pd.sps, []) AS sps,
         list_filter(range(0, len(td.t)),
                     i -> len(list_filter(COALESCE(pd.sps, []),
                                          s -> s.s <= i AND i < s.e)) = 0)
           AS ki
  FROM toked td LEFT JOIN per_doc pd ON td.doc_id = pd.doc_id
),
excised AS (
  SELECT doc_id,
         -- COALESCE: a token-less document yields NULL from DuckDB's
         -- array_to_string where Spark's array_join yields ''
         COALESCE(array_to_string(list_transform(ki, i -> t[i + 1]),
                                  chr(32)), '') AS clean_text,
         CAST(len(ki) AS BIGINT) AS kept_tokens,
         CAST(len(t) - len(ki) AS BIGINT) AS dropped_tokens
  FROM kept
)"""

DEDUP_SUBSTRING_EXCISED_ORACLE = f"""
WITH {EXCISED_CTES}
SELECT * FROM excised
"""

register(QuerySpec("dedup_substring_excised", dedup_substring_excised,
                   DEDUP_SUBSTRING_EXCISED_ORACLE, headline=True,
                   tags=("LLM-DEDUP",)))


# --- incremental: batch spans vs the at-rest corpus gram index --------------
#
# The maintenance half of ExactSubstr: once the corpus is span-deduped,
# a daily ingest batch needs only (a) the corpus's DISTINCT gram-hash
# index (8 bytes per distinct gram at rest — the bucketed-table probe
# shape proven for dedup_incremental in tests/test_bucketing.py: the
# corpus side never shuffles, the delta repartitions to it) and (b) an
# ExactSubstr pass over the batch itself (delta-sized shuffles).  A
# batch gram duplicates if it exists in the corpus index OR repeats
# within the batch (first batch occurrence canonical — the corpus copy,
# when present, is always the canonical one).
#
# The synthetic batch is the same recrawl/new/internal-dup mix as
# plans/llm_dedup2.dedup_incremental, so recrawled documents span
# entirely and reversed-new content spans only where it repeats.

def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.decontaminate import (
        positional_gram_hashes,
    )
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        BATCH_INTERNAL_DUP_OFFSET,
        BATCH_NEW_OFFSET,
        BATCH_RECRAWL_OFFSET,
        _REV_S,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + BATCH_RECRAWL_OFFSET).alias("doc_id"),
                "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + BATCH_NEW_OFFSET).alias("doc_id"),
                F.expr(_REV_S).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + BATCH_INTERNAL_DUP_OFFSET).alias("doc_id"),
                F.expr(_REV_S).alias("text"),
            )
        )
    )
    corpus_index = docs.select(
        F.explode(F.expr(positional_gram_hashes("text", _N))).alias("g")
    ).distinct()
    return substring_batch_probe(batch, corpus_index)


def substring_batch_probe(
    batch: DataFrame, corpus_index: DataFrame
) -> DataFrame:
    """The probe itself, factored for reuse (the two-axis scale curve,
    ``tools/incremental_curve.py``): the batch is gram-hashed fresh
    (delta-sized shuffles only); the corpus participates solely through
    its distinct gram-hash index — at rest a bucketed 8-byte-key table
    the probe co-locates to without shuffling it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.decontaminate import (
        positional_gram_hashes,
    )

    pos = batch.select(
        "doc_id",
        F.posexplode(
            F.expr(positional_gram_hashes("text", _N))
        ).alias("pos", "g"),
    )
    # (a) grams already in the corpus: semi-join against the index —
    # at rest the index is bucketed by g, the probe co-locates
    vs_corpus = pos.join(corpus_index, "g", "left_semi").select(
        "doc_id", "pos"
    )
    # (b) batch-internal repeats, first batch occurrence canonical
    stats = (
        pos.groupBy("g")
        .agg(F.count("*").alias("occ"),
             F.min(F.struct("doc_id", "pos")).alias("first"))
        .filter(F.col("occ") > 1)
    )
    internal = (
        pos.join(stats, "g")
        .filter(~((F.col("doc_id") == F.col("first.doc_id"))
                  & (F.col("pos") == F.col("first.pos"))))
        .select("doc_id", "pos")
    )
    dup_pos = vs_corpus.unionByName(internal).distinct()
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dup_pos.withColumn(
            "new_span",
            (F.coalesce(F.col("pos") - F.lag("pos").over(w),
                        F.lit(_N + 1)) > _N).cast("long"),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "span_id")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + _N).alias("span_end"))
    )
    return spans.select(
        "doc_id", "span_start", "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
    )


def _substr_incr_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        BATCH_INTERNAL_DUP_OFFSET,
        BATCH_NEW_OFFSET,
        BATCH_RECRAWL_OFFSET,
        _REV_D,
    )

    return f"""
WITH batch AS (
  SELECT doc_id + {BATCH_RECRAWL_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + {BATCH_NEW_OFFSET}, {_REV_D}
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {BATCH_INTERNAL_DUP_OFFSET}, {_REV_D}
  FROM documents WHERE doc_id % 20 = 0
),
cidx AS (
  SELECT DISTINCT unnest({_GRAMS_D}) AS g FROM documents
),
bpg AS (SELECT doc_id, {_GRAMS_D} AS gs FROM batch),
bpgp AS (SELECT doc_id, gs, unnest(range(1, len(gs) + 1)) AS p FROM bpg),
bpp AS (SELECT doc_id, gs[p] AS g, p - 1 AS pos FROM bpgp),
vs_corpus AS (
  SELECT doc_id, pos FROM bpp WHERE g IN (SELECT g FROM cidx)
),
bstats AS (
  SELECT g, COUNT(*) AS occ, MIN(doc_id) AS fdoc
  FROM bpp GROUP BY g HAVING COUNT(*) > 1
),
bfpos AS (
  SELECT p.g, MIN(p.pos) AS fp
  FROM bpp p JOIN bstats s ON p.g = s.g AND p.doc_id = s.fdoc
  GROUP BY p.g
),
internal AS (
  SELECT DISTINCT p.doc_id, p.pos
  FROM bpp p JOIN bstats s ON p.g = s.g JOIN bfpos f ON p.g = f.g
  WHERE NOT (p.doc_id = s.fdoc AND p.pos = f.fp)
),
dup AS (
  SELECT doc_id, pos FROM vs_corpus
  UNION
  SELECT doc_id, pos FROM internal
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN COALESCE(
                pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                {_N + 1}) > {_N}
              THEN 1 ELSE 0 END AS new_span
  FROM dup
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (
           PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING)
           AS span_id
  FROM isl
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {_N} AS span_end,
       MAX(pos) + {_N} - MIN(pos) AS span_tokens
FROM sp GROUP BY doc_id, span_id
"""


register(QuerySpec("dedup_substring_incremental", dedup_substring_incremental,
                   _substr_incr_oracle(), tags=("LLM-DEDUP",)))
