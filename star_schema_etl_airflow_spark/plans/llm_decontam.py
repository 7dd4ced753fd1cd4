"""Oracle-checked decontamination + epoch-shuffle queries.

The fixture corpus has no real benchmark leakage, so the queries build one
deterministically (the ``llm_dedup`` corpus pattern): a ~4% hash-selected
eval set, and every 10th remaining train doc gets an eval doc's full text
appended.  Both engines derive the identical corpus from the same parquet,
so the differential check covers corpus construction, gram indexing, the
broadcast overlap join, and the flag policy end-to-end.

``shuffle_rank`` differentially checks :func:`deterministic_shuffle` — the
distributed two-pass rank must equal the oracle's single ``ROW_NUMBER()
OVER (ORDER BY hash, key)`` exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    md5_long_duck,
    shingle_hashes_duck,
    shingles_duck,
    tokens_duck,
)
from star_schema_etl_airflow_spark.operators.decontaminate import (
    DECONTAM_NGRAM,
    contamination_flags,
    overlap_pairs,
)
from star_schema_etl_airflow_spark.operators.sampling import (
    BUCKETS,
    deterministic_shuffle,
    hash_bucket,
    threshold,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import (
    load_table,
    spread_scan,
)
from star_schema_etl_airflow_spark.functions.caching import persist_once

_KEY_S = "cast(doc_id as string)"
_KEY_D = "CAST(doc_id AS VARCHAR)"

EVAL_SEED = "eval"
EVAL_FRAC = 0.04
CONTAM_EVERY = 10   # every 10th train doc gets eval text appended
MIN_SHARED = 4      # 8-gram natural overlap is ~0; planted docs share ~all
                    # of the eval doc's grams — 4 is policy headroom

_T = threshold(EVAL_FRAC)
_BUCKET_D = f"({md5_long_duck(_KEY_D, EVAL_SEED)} % {BUCKETS})"


def _split_docs(spark: SparkSession, sf_dir: str):
    # r16: spread the single-split fixture scan before the bucket split —
    # the train side's 8-gram shingle explode otherwise runs on the scan's
    # task count (2 tasks measured); both filter branches consume the one
    # spread exchange (ReusedExchange).  No-op at production split counts.
    docs = spread_scan(
        load_table(spark, sf_dir, "documents"), "doc_id", "doc_id", "text"
    )
    b = hash_bucket(_KEY_S, EVAL_SEED)
    return docs.filter(b < _T), docs.filter(b >= _T)


def _contaminated_train(ev: DataFrame, tr: DataFrame) -> DataFrame:
    # rank eval docs so train docs can pick one by modulo — the window is
    # over the eval set only (tiny by definition; single partition is fine)
    evr = persist_once(ev.withColumn(
        "eval_rn", F.row_number().over(Window.orderBy("doc_id")) - 1
    ))
    # eval-set cardinality rides the plan as a broadcast 1-row aggregate
    # instead of a blocking .count() round trip per call (r16): the
    # modulo sees the identical BIGINT, but the count job fuses into the
    # consuming query instead of serializing ahead of it
    n_eval = evr.agg(F.count(F.lit(1)).alias("__n_eval"))
    contam = (
        tr.filter(F.col("doc_id") % CONTAM_EVERY == 0)
        .crossJoin(F.broadcast(n_eval))
        # guard the modulo (r16 ADVICE): doc_id % 0 is NULL in Spark —
        # an empty eval bucket would silently drop every planted row at
        # the inner join below, where the old driver-side count raised
        # ZeroDivisionError.  assert_true keeps the failure loud; the
        # when() ties it into the consumed column so Catalyst cannot
        # prune it (the ql_scores headroom-guard pattern).
        .withColumn(
            "eval_rn",
            F.col("doc_id") % F.when(
                F.assert_true(
                    F.col("__n_eval") > 0,
                    "empty eval bucket: doc_id % 0 would silently "
                    "drop every contamination-planted row",
                ).isNull(),
                F.col("__n_eval"),
            ),
        )
        .drop("__n_eval")
        .join(
            F.broadcast(evr.select("eval_rn", F.col("text").alias("eval_text"))),
            "eval_rn",
        )
        .select("doc_id", F.concat_ws(" ", "text", "eval_text").alias("text"))
    )
    clean = tr.filter(F.col("doc_id") % CONTAM_EVERY != 0).select("doc_id", "text")
    return clean.unionByName(contam)


def decontam_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, tr = _split_docs(spark, sf_dir)
    return overlap_pairs(
        _contaminated_train(ev, tr), ev, min_shared=MIN_SHARED
    )


def decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev, tr = _split_docs(spark, sf_dir)
    pairs = overlap_pairs(_contaminated_train(ev, tr), ev, min_shared=1)
    return contamination_flags(pairs, MIN_SHARED)


_GRAMS_D = (
    "list_distinct("
    f"{shingle_hashes_duck(shingles_duck(tokens_duck('text'), DECONTAM_NGRAM))})"
)

_CORPUS_D = f"""
ev AS (
  SELECT doc_id, text, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS eval_rn
  FROM documents WHERE {_BUCKET_D} < {_T}
),
n AS (SELECT COUNT(*) AS n_eval FROM ev),
tr AS (SELECT doc_id, text FROM documents WHERE {_BUCKET_D} >= {_T}),
train AS (
  SELECT doc_id, text FROM tr WHERE doc_id % {CONTAM_EVERY} <> 0
  UNION ALL
  SELECT t.doc_id, t.text || ' ' || e.text
  FROM tr t CROSS JOIN n JOIN ev e ON e.eval_rn = t.doc_id % n.n_eval
  WHERE t.doc_id % {CONTAM_EVERY} = 0
),
evh AS (SELECT doc_id AS eval_id, {_GRAMS_D} AS h FROM ev),
evg AS (SELECT eval_id, unnest(h) AS g FROM evh),
evs AS (SELECT eval_id, len(h) AS n_eval_grams FROM evh),
trg AS (SELECT doc_id AS train_id, unnest({_GRAMS_D}) AS g FROM train),
pairs AS (
  SELECT train_id, eval_id, COUNT(*) AS n_shared
  FROM trg JOIN evg USING (g)
  GROUP BY 1, 2
)
"""

DECONTAM_PAIRS_ORACLE = f"""
WITH {_CORPUS_D}
SELECT p.train_id, p.eval_id, p.n_shared,
       CAST(p.n_shared AS DOUBLE) / CAST(s.n_eval_grams AS DOUBLE)
         AS overlap_frac
FROM pairs p JOIN evs s USING (eval_id)
WHERE p.n_shared >= {MIN_SHARED}
"""

DECONTAM_FLAGS_ORACLE = f"""
WITH {_CORPUS_D}
SELECT train_id,
       COUNT(*) AS n_eval_matched,
       MAX(n_shared) AS max_shared,
       CAST(MAX(n_shared) >= {MIN_SHARED} AS INTEGER) AS contaminated
FROM pairs
GROUP BY train_id
"""

# --- deterministic epoch shuffle -------------------------------------------

SHUFFLE_SEED = "epoch0"


def shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, _KEY_S, SHUFFLE_SEED).select(
        "doc_id", "lang", "pos"
    )


SHUFFLE_RANK_ORACLE = f"""
SELECT doc_id, lang,
       ROW_NUMBER() OVER (
         ORDER BY {md5_long_duck(_KEY_D, SHUFFLE_SEED)}, {_KEY_D}
       ) AS pos
FROM documents
"""

register(QuerySpec("decontam_pairs", decontam_pairs, DECONTAM_PAIRS_ORACLE,
                   headline=True, tags=("DECONTAM",)))
register(QuerySpec("decontam_flags", decontam_flags, DECONTAM_FLAGS_ORACLE,
                   tags=("DECONTAM",)))
register(QuerySpec("shuffle_rank", shuffle_rank, SHUFFLE_RANK_ORACLE,
                   tags=("SHUFFLE",)))


# --- span-level decontamination --------------------------------------------


def decontam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal contaminated token spans (operators/decontaminate.py::
    matched_spans) over the same planted-leak corpus as decontam_pairs —
    the substring-granularity output that lets a pipeline excise leaked
    passages instead of dropping whole documents."""
    from star_schema_etl_airflow_spark.operators.decontaminate import (
        matched_spans,
    )

    ev, tr = _split_docs(spark, sf_dir)
    return matched_spans(_contaminated_train(ev, tr), ev)


_TOKS_SPANS_D = tokens_duck("text")
_GRAMS_NODIST_D = (
    f"list_transform(range(0, len({_TOKS_SPANS_D}) - {DECONTAM_NGRAM} + 1), "
    f"i -> array_to_string({_TOKS_SPANS_D}[i + 1 : i + {DECONTAM_NGRAM}], ' '))"
)
_POS_GRAMS_D = (
    f"CASE WHEN len({_TOKS_SPANS_D}) < {DECONTAM_NGRAM} THEN [] "
    f"ELSE {shingle_hashes_duck(_GRAMS_NODIST_D)} END"
)

DECONTAM_SPANS_ORACLE = f"""
WITH {_CORPUS_D},
pg AS (
  SELECT doc_id AS train_id, gs FROM (
    SELECT doc_id, {_POS_GRAMS_D} AS gs FROM train
  )
),
pgp AS (
  SELECT train_id, gs, unnest(range(1, len(gs) + 1)) AS p FROM pg
),
matched AS (
  SELECT DISTINCT pgp.train_id, e.eval_id, pgp.p - 1 AS pos
  FROM pgp JOIN evg e ON pgp.gs[pgp.p] = e.g
),
isl AS (
  SELECT train_id, eval_id, pos,
         CASE WHEN COALESCE(
                pos - LAG(pos) OVER (
                  PARTITION BY train_id, eval_id ORDER BY pos),
                {DECONTAM_NGRAM + 1}) > {DECONTAM_NGRAM}
              THEN 1 ELSE 0 END AS new_span
  FROM matched
),
sp AS (
  SELECT train_id, eval_id, pos,
         SUM(new_span) OVER (
           PARTITION BY train_id, eval_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS span_id
  FROM isl
)
SELECT train_id, eval_id,
       MIN(pos) AS span_start,
       MAX(pos) + {DECONTAM_NGRAM} AS span_end,
       MAX(pos) + {DECONTAM_NGRAM} - MIN(pos) AS span_tokens
FROM sp
GROUP BY train_id, eval_id, span_id
"""

register(QuerySpec("decontam_spans", decontam_spans, DECONTAM_SPANS_ORACLE,
                   tags=("DECONTAM",)))
