"""End-to-end curation pipeline, differentially checked as ONE query:

    documents → per-language quality gate (drop bottom 25% by TTR)
              → decontaminate vs the hash-selected eval set (8-gram overlap)
              → mix surviving corpus to target language weights
              → hash-split into train/val
              → per (lang, split) doc + token counts

Each stage is oracle-checked standalone elsewhere; this composes them so
the differential check covers stage *interactions* (the mixing counts are
computed over the post-decontamination corpus, the split applies after
mixing — exactly the order a production curation run uses).

Scale design: every stage is a map, a broadcast join, or a partial-agg
sketch over the corpus scan — there is NO window anywhere: the quality
gate is the two-pass ``percentile_approx`` value threshold
(``llm_text.quality_gate_approx``'s shape), whose sketch is exact at
fixture scale (rank ``ceil(q*n)``, the formula the oracle mirrors —
see ``quality_gate_approx_q``) and carries the documented ±rel_err rank
error beyond it.  The corpus is never shuffled on a low-cardinality
key, and the final rollup is a tiny partial aggregate.

(The gate is value-thresholded: every document whose TTR ties the
boundary value is kept, with no dependence on doc_id order inside tie
blocks — cleaner curation semantics than a percent_rank cut, and the
form that scales.  The exact window form remains available as
``quality_percentile_gate``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    shingle_hashes_duck,
    shingles_duck,
    tokens_duck,
)
from star_schema_etl_airflow_spark.operators.decontaminate import (
    DECONTAM_NGRAM,
    drop_contaminated,
)
from star_schema_etl_airflow_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_split,
    mix_to_weights,
    threshold,
)
from star_schema_etl_airflow_spark.plans.llm_text import exact_regime_guard
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

_KEY_S = "cast(doc_id as string)"
_KEY_D = "CAST(doc_id AS VARCHAR)"

EVAL_SEED = "cur_eval"
EVAL_FRAC = 0.04
MIN_SHARED = 4
MIX_SEED = "cur_mix"
MIX_WEIGHTS = {"en": 0.35, "es": 0.2, "fr": 0.2, "de": 0.15, "zh": 0.1}
SPLIT_SEED = "cur_split"
SPLIT_CUTS = {"train": 0.9, "val": 0.1}

_T_EVAL = threshold(EVAL_FRAC)


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    b_eval = hash_bucket(_KEY_S, EVAL_SEED)
    ev = docs.filter(b_eval < _T_EVAL)
    train = docs.filter(b_eval >= _T_EVAL)

    # 1. per-language quality gate (bottom TTR quartile dropped):
    # two-pass value threshold — sketch per language, broadcast back,
    # map-only filter; no per-language sort at any scale
    ttr = F.expr(
        "cast(size(array_distinct(split(text, '\\\\s+'))) as double)"
        " / cast(size(split(text, '\\\\s+')) as double)"
    )
    with_ttr = train.withColumn("__ttr", ttr)
    # the guard makes the sketch's exact-regime assumption (group rows <=
    # accuracy, see llm_text.exact_regime_guard) raise at execution time
    # on a bigger fixture instead of silently drifting from the oracle
    _ACC = 10_000
    thr_q = with_ttr.groupBy("lang").agg(
        F.percentile_approx("__ttr", F.lit(0.25), F.lit(_ACC))
        .alias("__thr0"),
        F.count(F.lit(1)).alias("__n"),
    ).select(
        "lang", exact_regime_guard("__thr0", "__n", _ACC).alias("__thr")
    )
    gated = (
        with_ttr.join(F.broadcast(thr_q), "lang")
        .filter(F.col("__ttr") >= F.col("__thr"))
        .drop("__ttr", "__thr")
        .select("doc_id", "lang", "text", "n_chars")
    )

    # 2. decontaminate vs the eval set.  The post-decontamination corpus
    # is consumed TWICE — once by mix_to_weights' per-language counts,
    # once by the final filtered rollup — so persist it: without the
    # cache the whole gate+decontam upstream (several corpus scans)
    # executes twice per run.  At 100 TB this stage is exactly what a
    # production pipeline checkpoints to storage between curation steps;
    # MEMORY_AND_DISK is the local twin of that checkpoint.
    from pyspark import StorageLevel

    clean = drop_contaminated(gated, ev, min_shared=MIN_SHARED).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 3. mix to target language weights, 4. split
    mixed = mix_to_weights(clean, "lang", _KEY_S, MIX_WEIGHTS, MIX_SEED)
    split = hash_split(mixed, _KEY_S, SPLIT_SEED, SPLIT_CUTS)

    # 5. rollup
    return split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("(n_chars + 3) div 4")).alias("total_tokens"),
    )


def _bucket_d(seed: str) -> str:
    return f"({md5_long_duck(_KEY_D, seed)} % {BUCKETS})"


def _oracle() -> str:
    grams = (
        "list_distinct("
        f"{shingle_hashes_duck(shingles_duck(tokens_duck('text'), DECONTAM_NGRAM))})"
    )
    mix_values = ", ".join(
        f"('{s}', CAST({w} AS DOUBLE))" for s, w in MIX_WEIGHTS.items()
    )
    split_edges, hi = [], 0.0
    for name, frac in SPLIT_CUTS.items():
        lo_t, hi = threshold(hi), hi + frac
        split_edges.append((name, lo_t, threshold(hi)))
    split_case = "\n    ".join(
        f"WHEN {_bucket_d(SPLIT_SEED)} >= {lo} "
        f"AND {_bucket_d(SPLIT_SEED)} < {h} THEN '{name}'"
        for name, lo, h in split_edges
    )
    return f"""
WITH ev AS (
  SELECT doc_id, text FROM documents WHERE {_bucket_d(EVAL_SEED)} < {_T_EVAL}
),
train AS (
  SELECT doc_id, lang, text, n_chars FROM documents
  WHERE {_bucket_d(EVAL_SEED)} >= {_T_EVAL}
),
tt AS (
  SELECT doc_id, lang, text, n_chars,
         CAST(len(list_distinct({tokens_duck('text')})) AS DOUBLE)
           / CAST(len({tokens_duck('text')}) AS DOUBLE) AS ttr
  FROM train
),
tr AS (
  SELECT lang, ttr,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ttr) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM tt
),
thr_q AS (
  SELECT lang,
         MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
             THEN ttr END) AS threshold
  FROM tr GROUP BY lang
),
gated AS (
  SELECT t.doc_id, t.lang, t.text, t.n_chars
  FROM tt t JOIN thr_q ON t.lang = thr_q.lang
  WHERE t.ttr >= thr_q.threshold
),
trg AS (SELECT doc_id AS train_id, unnest({grams}) AS g FROM gated),
evg AS (SELECT doc_id AS eval_id, unnest({grams}) AS g FROM ev),
flagged AS (
  SELECT DISTINCT train_id FROM (
    SELECT train_id, eval_id, COUNT(*) AS n_shared
    FROM trg JOIN evg USING (g) GROUP BY 1, 2
  ) WHERE n_shared >= {MIN_SHARED}
),
clean AS (
  SELECT g.* FROM gated g
  WHERE NOT EXISTS (SELECT 1 FROM flagged f WHERE f.train_id = g.doc_id)
),
wts(lang, wt) AS (VALUES {mix_values}),
counts AS (
  SELECT c.lang, CAST(COUNT(*) AS DOUBLE) AS n
  FROM clean c JOIN wts ON c.lang = wts.lang GROUP BY c.lang
),
f AS (SELECT MIN(c.n / w.wt) AS factor FROM counts c JOIN wts w ON c.lang = w.lang),
thr AS (
  SELECT c.lang,
         CAST(FLOOR(LEAST((w.wt * f.factor) / c.n, 1.0) * {BUCKETS}) AS BIGINT) AS t
  FROM counts c JOIN wts w ON c.lang = w.lang CROSS JOIN f
),
mixed AS (
  SELECT c.* FROM clean c JOIN thr ON c.lang = thr.lang
  WHERE {_bucket_d(MIX_SEED)} < thr.t
),
sp AS (
  SELECT *,
    CASE {split_case} END AS split
  FROM mixed
)
SELECT lang, split, COUNT(*) AS n_docs,
       CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS total_tokens
FROM sp WHERE split IS NOT NULL
GROUP BY lang, split
"""


register(QuerySpec("curation_pipeline", curation_pipeline, _oracle(),
                   headline=True, tags=("LLM-pipeline",)))
