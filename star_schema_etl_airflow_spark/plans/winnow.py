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


def _sel_ctes(src: str, p: str = "") -> str:
    """The winnowing selection as DuckDB CTEs over relation ``src``
    (doc_id, text), with CTE names prefixed by ``p`` so two selections
    (corpus + batch) can coexist in one oracle."""
    return f"""
{p}pg AS (
  SELECT doc_id, {_grams_duck(WINNOW_K)} AS gs FROM {src}
),
{p}pp AS (
  SELECT doc_id, gs[p] AS g, p - 1 AS pos, len(gs) AS n
  FROM (SELECT doc_id, gs, unnest(range(1, len(gs) + 1)) AS p FROM {p}pg)
),
{p}sel AS (
  SELECT DISTINCT doc_id, wmin
  FROM (
    SELECT doc_id, pos, n,
           MIN(g * {1 << POS_BITS} + pos) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
           ) AS wmin
    FROM {p}pp
  )
  WHERE pos <= n - {WINNOW_W}
)"""


_SEL_DUCK = _sel_ctes("corpus")


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


# Islands-merge gap for span extraction: within one contiguous matched
# region winnowing guarantees a selection in EVERY window of W grams
# (consecutive selected positions ≤ W apart) and each gram covers K
# tokens, so fingerprints of one real match are never farther apart
# than W + K - 1 — a larger gap starts a new span.
SPAN_GAP = WINNOW_W + WINNOW_K - 1


def doc_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style matched-span evidence (r11 verdict task 7): for every
    overlapping pair, the maximal token spans of doc_a covered by the
    pair's shared (DF-capped) fingerprints — positional fingerprint
    runs merged islands-style (like ``decontam_spans``), giving the
    plagiarism-reviewer artifact instead of a bare count.

    A span is ``[span_start, span_end]`` in doc_a gram-position
    coordinates (a gram at ``pos`` covers tokens ``pos..pos+K-1``);
    islands merge while consecutive shared-fingerprint positions are
    ≤ SPAN_GAP apart (the winnowing density guarantee — see SPAN_GAP),
    so spans within a pair are provably disjoint (next island starts
    > previous island's last position + W + K - 1 > its span_end).

    Scale shape: everything up to the island window is the overlap
    join's own DF-capped relations; the window is partitioned by pair
    and touches only matched positions (≤ fingerprints of matched
    pairs), never the corpus."""
    fps = persist_once(winnow_fingerprints(build_corpus(spark, sf_dir)))
    fpsd = fps.select("doc_id", "g").distinct()
    rare = (
        fpsd.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("g")
    )
    keyed = fpsd.join(rare, "g")
    a = keyed.select(F.col("doc_id").alias("doc_a"), "g")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "g")
    shared = a.join(b, "g").filter(F.col("doc_a") < F.col("doc_b"))
    pairs = (
        shared.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= SHARED_T)
        .select("doc_a", "doc_b")
    )
    posns = (
        shared.join(pairs, ["doc_a", "doc_b"])
        .join(
            fps.select(F.col("doc_id").alias("doc_a"), "g", "pos"),
            ["doc_a", "g"],
        )
        .select("doc_a", "doc_b", "pos")
        .distinct()
    )
    wseq = Window.partitionBy("doc_a", "doc_b").orderBy("pos")
    new_flag = F.when(
        F.lag("pos").over(wseq).isNull()
        | (F.col("pos") - F.lag("pos").over(wseq) > SPAN_GAP),
        1,
    ).otherwise(0)
    island = F.sum("new_flag").over(
        wseq.rowsBetween(Window.unboundedPreceding, 0))
    return (
        posns.withColumn("new_flag", new_flag)
        .withColumn("island", island)
        .groupBy("doc_a", "doc_b", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(WINNOW_K - 1)).cast("int")
            .alias("span_end"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .select("doc_a", "doc_b", "span_start", "span_end", "n_fps")
    )


def _spans_oracle() -> str:
    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_SEL_DUCK},
fpos AS (
  SELECT DISTINCT doc_id, wmin // {1 << POS_BITS} AS g,
         CAST(wmin % {1 << POS_BITS} AS INTEGER) AS pos
  FROM sel
),
fps AS (SELECT DISTINCT doc_id, g FROM fpos),
rare AS (
  SELECT g FROM fps GROUP BY g HAVING COUNT(*) <= {DF_CAP}
),
keyed AS (SELECT f.doc_id, f.g FROM fps f JOIN rare r ON f.g = r.g),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.g
  FROM keyed a JOIN keyed b ON a.g = b.g AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM shared
  GROUP BY doc_a, doc_b HAVING COUNT(*) >= {SHARED_T}
),
posns AS (
  SELECT DISTINCT s.doc_a, s.doc_b, p.pos
  FROM shared s
  JOIN pairs pr ON s.doc_a = pr.doc_a AND s.doc_b = pr.doc_b
  JOIN fpos p ON p.doc_id = s.doc_a AND p.g = s.g
),
flagged AS (
  SELECT doc_a, doc_b, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w > {SPAN_GAP}
              THEN 1 ELSE 0 END AS new_flag
  FROM posns
  WINDOW w AS (PARTITION BY doc_a, doc_b ORDER BY pos)
),
islands AS (
  SELECT doc_a, doc_b, pos,
         SUM(new_flag) OVER (
           PARTITION BY doc_a, doc_b ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_a, doc_b,
       MIN(pos) AS span_start,
       CAST(MAX(pos) + {WINNOW_K - 1} AS INTEGER) AS span_end,
       COUNT(*) AS n_fps
FROM islands
GROUP BY doc_a, doc_b, island
"""


def winnow_capped_index(docs: DataFrame) -> DataFrame:
    """The at-rest artifact the incremental probe reads: the corpus's
    DF-capped fingerprint inverted index ``(doc_id, g)`` — written once
    by the full pass (bucketed by ``g`` in a production deployment)."""
    fps = winnow_fingerprints(docs).select("doc_id", "g").distinct()
    rare = (
        fps.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("g")
    )
    return fps.join(rare, "g")


def winnow_batch_probe(batch: DataFrame, index: DataFrame) -> DataFrame:
    """Delta fingerprints ⨝ the corpus's at-rest capped index: the only
    relation shingled, windowed, and shuffled fresh is the DELTA — the
    corpus participates through ``index`` alone.  Factored for the
    two-axis curve (``tools/incremental_curve.py``), like
    ``minhash_batch_probe`` / ``substring_batch_probe``."""
    bfps = (
        winnow_fingerprints(batch)
        .select(F.col("doc_id").alias("batch_id"), "g")
        .distinct()
    )
    return (
        bfps.join(
            index.select(F.col("doc_id").alias("corpus_id"), "g"), "g")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= SHARED_T)
    )


def doc_winnow_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow-fingerprint overlap of a new ingest batch AGAINST the
    existing corpus — the fingerprint family's member of the
    incremental-probe trio (exact hash / MinHash / exact-substring all
    have one; r11 verdict task 5).

    A daily crawl cannot re-fingerprint 100 TB to ingest a few GB: the
    corpus participates only through its materialized DF-capped
    inverted index (``winnow_capped_index`` — the full pass's at-rest
    table, bucketed by gram hash), while the delta is the only side
    fingerprinted fresh.  Per-gram probe fan-out is bounded by DF_CAP
    (≤ {DF_CAP} corpus docs per gram), so probe output ≤ delta
    fingerprints × DF_CAP — linear in the delta, flat in the corpus.

    The synthetic delta mirrors ``dedup_incremental_minhash``'s mix:
    light-mutated recrawls (every 13th token dropped — ~69% of k-grams
    survive, so mutants share most fingerprint VALUES with their
    originals) and genuinely-new docs (reversed token order — disjoint
    grams, zero matches)."""
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        _LIGHT_MUTATE_S,
        _REV_S,
        BATCH_FRESH_OFFSET,
        BATCH_MUTANT_OFFSET,
    )
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + BATCH_MUTANT_OFFSET).alias("doc_id"),
                F.expr(_LIGHT_MUTATE_S).alias("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 15 == 0).select(
                (F.col("doc_id") + BATCH_FRESH_OFFSET).alias("doc_id"),
                F.expr(_REV_S).alias("text"),
            )
        )
    )
    index = persist_once(winnow_capped_index(docs))
    return winnow_batch_probe(batch, index)


def _inc_winnow_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        _LIGHT_MUTATE_D,
        _REV_D,
        BATCH_FRESH_OFFSET,
        BATCH_MUTANT_OFFSET,
    )

    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + {BATCH_MUTANT_OFFSET} AS doc_id,
         {_LIGHT_MUTATE_D} AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {BATCH_FRESH_OFFSET}, {_REV_D}
  FROM documents WHERE doc_id % 15 = 0
),
{_sel_ctes("corpus", "c")},
{_sel_ctes("batch", "b")},
cfps AS (
  SELECT DISTINCT doc_id, wmin // {1 << POS_BITS} AS g FROM csel
),
rare AS (SELECT g FROM cfps GROUP BY g HAVING COUNT(*) <= {DF_CAP}),
idx AS (SELECT f.doc_id, f.g FROM cfps f JOIN rare r ON f.g = r.g),
bfps AS (
  SELECT DISTINCT doc_id, wmin // {1 << POS_BITS} AS g FROM bsel
)
SELECT b.doc_id AS batch_id, i.doc_id AS corpus_id,
       COUNT(*) AS shared_fps
FROM bfps b JOIN idx i ON b.g = i.g
GROUP BY b.doc_id, i.doc_id
HAVING COUNT(*) >= {SHARED_T}
"""


def capped_df_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-run droppage census for the DF-capped inverted indexes (r11
    verdict task 6 — the no-silent-caps rule): ``doc_winnow_overlap``
    and ``tfidf_topk_pairs`` both drop keys whose document frequency
    exceeds their cap BY DESIGN (boilerplate grams carry no matching
    signal), but silent truncation reads as "covered everything" on a
    corpus whose signal lives in common grams.  One row per capped
    index family: keys kept, keys dropped, postings dropped, max df —
    the numbers an operator needs to decide whether the cap is eating
    signal (dropped_keys ≫ 0 with modest max_df) or just boilerplate
    (few dropped keys, huge max_df)."""
    from star_schema_etl_airflow_spark.functions.text import (
        shingles_spark,
        tokens_spark,
    )
    from star_schema_etl_airflow_spark.plans.text_classify import (
        DF_CAP as TFIDF_DF_CAP,
    )

    corpus = persist_once(build_corpus(spark, sf_dir))

    def census(df_rel: DataFrame, family: str, cap: int) -> DataFrame:
        agg = df_rel.agg(
            F.sum(F.when(F.col("df") <= cap, 1).otherwise(0))
            .alias("kept_keys"),
            F.sum(F.when(F.col("df") > cap, 1).otherwise(0))
            .alias("dropped_keys"),
            F.coalesce(
                F.sum(F.when(F.col("df") > cap, F.col("df"))), F.lit(0)
            ).alias("dropped_postings"),
            F.max("df").alias("max_df"),
        )
        return agg.select(
            F.lit(family).alias("family"),
            F.lit(cap).cast("int").alias("df_cap"),
            "kept_keys", "dropped_keys", "dropped_postings", "max_df",
        )

    winnow_df = (
        winnow_fingerprints(corpus)
        .select("doc_id", "g").distinct()
        .groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    )
    tfidf_df = (
        corpus.select(
            "doc_id",
            F.explode(
                F.expr(shingles_spark(tokens_spark("text")))
            ).alias("term"),
        )
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    return census(winnow_df, "winnow_fingerprint", DF_CAP).unionByName(
        census(tfidf_df, "tfidf_shingle", TFIDF_DF_CAP))


def _census_oracle() -> str:
    from star_schema_etl_airflow_spark.functions.text import (
        shingles_duck,
        tokens_duck,
    )
    from star_schema_etl_airflow_spark.plans.text_classify import (
        DF_CAP as TFIDF_DF_CAP,
    )

    sh = shingles_duck(tokens_duck("text"))

    def one(src: str, family: str, cap: int) -> str:
        return f"""
SELECT '{family}' AS family, CAST({cap} AS INTEGER) AS df_cap,
       CAST(SUM(CASE WHEN df <= {cap} THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_keys,
       CAST(SUM(CASE WHEN df > {cap} THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_keys,
       CAST(COALESCE(SUM(CASE WHEN df > {cap} THEN df END), 0) AS BIGINT)
         AS dropped_postings,
       CAST(MAX(df) AS BIGINT) AS max_df
FROM {src}"""

    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_SEL_DUCK},
fps AS (
  SELECT DISTINCT doc_id, wmin // {1 << POS_BITS} AS g FROM sel
),
wdf AS (SELECT g, COUNT(*) AS df FROM fps GROUP BY g),
tpost AS (SELECT doc_id, unnest({sh}) AS term FROM corpus),
tdf AS (SELECT term, COUNT(*) AS df FROM tpost GROUP BY term)
{one('wdf', 'winnow_fingerprint', DF_CAP)}
UNION ALL
{one('tdf', 'tfidf_shingle', TFIDF_DF_CAP)}
"""


register(QuerySpec("doc_winnow_fingerprints", doc_winnow_fingerprints,
                   _FPS_ORACLE, tags=("LLM-text", "fingerprint")))
register(QuerySpec("doc_winnow_overlap", doc_winnow_overlap,
                   _OVERLAP_ORACLE, tags=("LLM-dedup", "fingerprint")))
register(QuerySpec("doc_winnow_spans", doc_winnow_spans,
                   _spans_oracle(), tags=("LLM-dedup", "fingerprint")))
register(QuerySpec("doc_winnow_incremental", doc_winnow_incremental,
                   _inc_winnow_oracle(),
                   tags=("LLM-dedup", "fingerprint", "incremental")))
register(QuerySpec("capped_df_census", capped_df_census,
                   _census_oracle(), tags=("LLM-dedup", "observability")))
