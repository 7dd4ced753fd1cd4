"""Second composed curation pipeline — the round-4 operators chained
end-to-end under ONE differential check:

    line-level boilerplate removal  (dedup_lines semantics)
 →  exact dedup on the CLEANED text (hash-groupBy, min-id canonical)
 →  token-count quality gate
 →  eval split + 8-gram decontamination (broadcast eval gram index)
 →  hash train/val split
 →  per-split rollup (docs, tokens)

Each stage is individually oracle-checked elsewhere; this query pins
that they *compose* — boilerplate stripping changes the dedup hashes,
dedup changes the decontamination candidates, and the final rollup sees
every upstream decision.  The DuckDB oracle rebuilds the identical
chain as one CTE pipeline.

Scale shape (same rules as ``curation_pipeline``): the common-line set
and eval gram index broadcast; every split/gate is a content-hash map;
the only big-side shuffles are the line-hash frequency count, the
per-doc reassembly, and the dedup hash-groupBy — all on skew-free keys;
the cleaned corpus is persisted once for its three consumers
(dedup, gram build, rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    md5_long_spark,
    shingle_hashes_duck,
    shingle_hashes_spark,
    shingles_duck,
    shingles_spark,
)
from star_schema_etl_airflow_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    threshold,
)
from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
    DEDUP_LINES_ORACLE,
    dedup_lines,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.functions.caching import persist_once

GATE_MIN_TOKENS = 20
EVAL_SEED = "cur2-eval"
EVAL_FRAC = 0.04
VAL_SEED = "cur2-val"
VAL_FRAC = 0.10
DECONTAM_N = 8

_EVAL_T = threshold(EVAL_FRAC)
_VAL_T = threshold(VAL_FRAC)

_KEY_S = "cast(doc_id as string)"
_KEY_D = "CAST(doc_id AS VARCHAR)"

_CLEAN_TOKS_S = "split(clean_text, '\\\\s+')"
_CLEAN_TOKS_D = "string_split_regex(clean_text, '\\s+')"

_GRAMS_S = (
    "array_distinct("
    + shingle_hashes_spark(shingles_spark(_CLEAN_TOKS_S, DECONTAM_N))
    + ")"
)
_GRAMS_D = (
    "list_distinct("
    + shingle_hashes_duck(shingles_duck(_CLEAN_TOKS_D, DECONTAM_N))
    + ")"
)


def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1. boilerplate removal (oracle-checked operator, reused verbatim);
    #    persisted: consumed by the dedup hash, the gram build, the gate
    #    and the rollup
    cleaned = persist_once(dedup_lines(spark, sf_dir))

    # 2. exact dedup on cleaned text — canonical = lowest doc_id
    deduped = (
        cleaned.select(
            "doc_id", "clean_text",
            F.expr(md5_long_spark("clean_text")).alias("h"),
        )
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "clean_text")).alias("keep"))
        .select(
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.clean_text").alias("clean_text"),
        )
    )

    # 3. quality gate on token count
    gated = deduped.withColumn(
        "tok_n", F.size(F.expr(_CLEAN_TOKS_S))
    ).filter(F.col("tok_n") >= GATE_MIN_TOKENS)

    # 4. eval split + decontamination (train docs sharing any 8-gram
    #    with an eval doc are dropped; eval gram index broadcasts)
    b_eval = hash_bucket(_KEY_S, EVAL_SEED)
    ev = gated.filter(b_eval < _EVAL_T)
    tr = gated.filter(b_eval >= _EVAL_T)
    ev_grams = ev.select(F.explode(F.expr(_GRAMS_S)).alias("g")).distinct()
    tr_grams = tr.select(
        "doc_id", F.explode(F.expr(_GRAMS_S)).alias("g")
    )
    contaminated = (
        tr_grams.join(F.broadcast(ev_grams), "g")
        .select("doc_id")
        .distinct()
    )
    clean_train = tr.join(contaminated, "doc_id", "left_anti")

    # 5. train/val split + 6. rollup
    b_val = hash_bucket(_KEY_S, VAL_SEED)
    final = clean_train.withColumn(
        "split", F.when(b_val < _VAL_T, F.lit("val")).otherwise(F.lit("train"))
    )
    return final.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok_n").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


CURATION_V2_ORACLE = f"""
WITH cleaned AS ({DEDUP_LINES_ORACLE}),
deduped AS (
  SELECT MIN(doc_id) AS doc_id,
         arg_min(clean_text, doc_id) AS clean_text
  FROM (SELECT doc_id, clean_text,
               {md5_long_duck('clean_text')} AS h FROM cleaned)
  GROUP BY h
),
gated AS (
  SELECT doc_id, clean_text, len({_CLEAN_TOKS_D}) AS tok_n
  FROM deduped
  WHERE len({_CLEAN_TOKS_D}) >= {GATE_MIN_TOKENS}
),
ev AS (
  SELECT * FROM gated
  WHERE ({md5_long_duck(_KEY_D, EVAL_SEED)} % {BUCKETS}) < {_EVAL_T}
),
tr AS (
  SELECT * FROM gated
  WHERE ({md5_long_duck(_KEY_D, EVAL_SEED)} % {BUCKETS}) >= {_EVAL_T}
),
evg AS (SELECT DISTINCT unnest({_GRAMS_D}) AS g FROM ev),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest({_GRAMS_D}) AS g FROM tr) t
  JOIN evg ON t.g = evg.g
),
final AS (
  SELECT tr.doc_id, tr.tok_n,
         CASE WHEN ({md5_long_duck(_KEY_D, VAL_SEED)} % {BUCKETS})
                   < {_VAL_T}
              THEN 'val' ELSE 'train' END AS split
  FROM tr
  WHERE tr.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(tok_n) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM final
GROUP BY split
"""

register(QuerySpec("curation_pipeline_v2", curation_pipeline_v2,
                   CURATION_V2_ORACLE, tags=("LLM-PIPELINE",)))
