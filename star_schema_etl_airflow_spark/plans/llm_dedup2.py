"""Second dedup wave over the ``documents`` / ``embeddings`` fixtures:
line-level boilerplate removal, incremental (delta-vs-corpus) dedup, and
SemDeDup-style cluster-scoped semantic dedup.

These are the three dedup shapes the first wave (``plans/llm_dedup.py``)
does not cover:

- ``dedup_lines`` — *sub-document* dedup: lines repeated across a large
  fraction of the corpus (copyright headers, navigation, footers) are
  stripped from every document while each document's unique content and
  line order are preserved.  This is the C4/RefinedWeb "remove
  boilerplate lines seen in >X% of pages" pass.
- ``dedup_incremental`` — *delta* dedup: a new ingest batch is deduped
  against the already-curated corpus (and internally) without
  reprocessing the corpus.  This is the shape every recurring crawl
  pipeline actually runs — full-corpus re-dedup at 100 TB per day is a
  non-starter.
- ``semdedup`` — *semantic* dedup (SemDeDup, Abbas et al. 2023): train a
  coarse k-means codebook, assign every vector to a cluster, and compare
  pairs **within a cluster only**; a vector is dropped when a same-cluster
  lower-id neighbor is cosine-similar above threshold.

Scale design (100 TB):
- ``dedup_lines`` shuffles 8-byte line hashes, never line text; the
  surviving "common" set (lines above the document-frequency threshold)
  is tiny by construction → broadcast to a map-side filter; the only
  full-width shuffle is the per-document reassembly, keyed by doc_id
  (skew-free).
- ``dedup_incremental`` keeps the corpus side down to its 8-byte content
  hashes (at rest: a bucketed hash-index table, so the daily probe is a
  co-located join with zero corpus shuffle); the delta is the only side
  that moves.
- ``semdedup`` never runs an all-pairs scan: the codebook is k rows
  (broadcast assignment, map-side argmin), and candidate pairs exist
  only within a cluster — with k sized so clusters hold ~1/k of the
  corpus, pair volume drops k× and each cluster's pair join is an
  independent, skew-bounded unit (split oversized clusters by a
  secondary LSH key if a cluster degenerates).

Reference parity: beyond-reference (the reference has no document
processing at all — builder's LLM-pipeline extension brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.text import (
    let_spark,
    md5_long_duck,
    md5_long_spark,
    tokens_duck,
    tokens_spark,
)
from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.vecexpr import unrolled_dot
from star_schema_etl_airflow_spark.operators.kmeans import assign_clusters
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

# --- line-level boilerplate removal ----------------------------------------

# The fixture corpus has no line structure (single-line token streams),
# so lines are synthesized identically on both engines: the text is cut
# into 8-token lines, a boilerplate header is prepended to every document
# and a footer to every 2nd one.  Production replaces the synthesis with
# ``split(text, '\n')``; everything downstream is unchanged.

LINE_TOKENS = 8
HEADER_LINE = "copyright acme corp all rights reserved"
FOOTER_LINE = "subscribe to our newsletter for updates"
# a line is boilerplate when it appears in ≥30% of documents
COMMON_DOC_FRACTION = 0.3

_TOKS_S = tokens_spark("text")
_TOKS_D = tokens_duck("text")

# let-bound: the tokenizer runs ONCE per document, not once per chunk
_LINES_S = let_spark(
    _TOKS_S,
    "__lt",
    f"concat(array('{HEADER_LINE}'), "
    f"transform(sequence(0, cast(ceil(size(__lt) / {LINE_TOKENS}.0d) as int) - 1), "
    f"i -> array_join(slice(__lt, i * {LINE_TOKENS} + 1, {LINE_TOKENS}), ' ')), "
    f"slice(array('{FOOTER_LINE}'), 1, cast(doc_id % 2 = 0 as int)))",
)

_NCHUNKS_D = f"CAST(CEIL(len({_TOKS_D}) / {LINE_TOKENS}.0) AS INT)"
_LINES_D = (
    f"list_concat(list_concat(['{HEADER_LINE}'], "
    f"list_transform(range(0, {_NCHUNKS_D}), "
    f"i -> array_to_string(list_slice({_TOKS_D}, i * {LINE_TOKENS} + 1, "
    f"i * {LINE_TOKENS} + {LINE_TOKENS}), ' '))), "
    f"CASE WHEN doc_id % 2 = 0 THEN ['{FOOTER_LINE}'] ELSE [] END)"
)


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip lines that occur in ≥30% of documents, keep per-document
    line order.  Line identity travels as an 8-byte md5 hash (the
    shuffle key at scale is fixed-width, never the text); the common-line
    set is broadcast, so removal is a map-side filter and the only
    full-width shuffle is the doc_id reassembly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lines = docs.select(
        "doc_id", F.posexplode(F.expr(_LINES_S)).alias("pos", "line")
    ).withColumn("lh", F.expr(md5_long_spark("line")))

    freq = lines.groupBy("lh").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    n_total = docs.agg(F.countDistinct("doc_id").alias("n"))
    common = (
        freq.crossJoin(F.broadcast(n_total))
        .filter(F.col("n_docs") >= F.lit(COMMON_DOC_FRACTION) * F.col("n"))
        .select("lh")
    )
    flagged = lines.join(
        F.broadcast(common.withColumn("is_common", F.lit(True))), "lh", "left"
    ).withColumn("is_common", F.coalesce("is_common", F.lit(False)))
    return flagged.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort("
            "collect_list(case when not is_common then struct(pos, line) end)"
            "), s -> s.line), '\n')"
        ).alias("clean_text"),
        F.sum(F.col("is_common").cast("long")).alias("n_removed"),
    )


DEDUP_LINES_ORACLE = f"""
WITH lw AS (
  SELECT doc_id, {_LINES_D} AS ls FROM documents
),
l AS (
  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, ls FROM lw
),
lines AS (
  SELECT doc_id, pos, ls[pos] AS line, {md5_long_duck('ls[pos]')} AS lh FROM l
),
freq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM lines GROUP BY 1
),
ntot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
common AS (
  SELECT lh FROM freq, ntot WHERE n_docs >= {COMMON_DOC_FRACTION} * n
)
SELECT li.doc_id,
       COALESCE(string_agg(li.line, chr(10) ORDER BY li.pos)
                FILTER (c.lh IS NULL), '') AS clean_text,
       COUNT(c.lh) AS n_removed
FROM lines li LEFT JOIN common c ON li.lh = c.lh
GROUP BY li.doc_id
"""

# --- incremental (delta-vs-corpus) dedup -----------------------------------

# The "new batch" is synthesized from the fixture on both engines:
#  - re-crawled exact copies of every 4th corpus doc (id + 3M),
#  - genuinely new content: every 10th doc with tokens reversed (id + 4M),
#  - batch-internal duplicates of the new content for every 20th (id + 5M).
BATCH_RECRAWL_OFFSET = 3_000_000
BATCH_NEW_OFFSET = 4_000_000
BATCH_INTERNAL_DUP_OFFSET = 5_000_000

_REV_S = f"array_join(reverse({_TOKS_S}), ' ')"
_REV_D = f"array_to_string(list_reverse({_TOKS_D}), ' ')"


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a new ingest batch against the existing corpus and itself,
    touching only content hashes of the corpus.

    Survivors = batch docs whose content hash (a) does not exist in the
    corpus (anti join against the 8-byte hash projection — at rest this
    is a bucketed hash-index table, so the probe co-locates and the
    corpus never shuffles) and (b) is the lowest doc_id for that hash
    within the batch (hash-groupBy on the small delta only)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + BATCH_RECRAWL_OFFSET).alias("doc_id"), "text")
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
    corpus_hashes = docs.select(
        F.expr(md5_long_spark("text")).alias("content_hash")
    )
    hashed = batch.select(
        "doc_id", F.expr(md5_long_spark("text")).alias("content_hash")
    )
    vs_corpus = hashed.join(corpus_hashes, "content_hash", "left_anti")
    return vs_corpus.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_batch_copies"),
    )


DEDUP_INCREMENTAL_ORACLE = f"""
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
hashed AS (
  SELECT doc_id, {md5_long_duck('text')} AS content_hash FROM batch
),
corpus AS (
  SELECT DISTINCT {md5_long_duck('text')} AS content_hash FROM documents
)
SELECT h.content_hash, MIN(h.doc_id) AS doc_id,
       COUNT(*) AS n_batch_copies
FROM hashed h
WHERE h.content_hash NOT IN (SELECT content_hash FROM corpus)
GROUP BY 1
"""

# --- SemDeDup: cluster-scoped semantic dedup --------------------------------

SEM_COS_THRESHOLD = 0.98
SEM_DUP_OFFSET = 1_000_000
SEM_COS_DECIMALS = 9

# K ∝ n operating point (r15 verdict task 8): tools/semdedup_curve.py
# measured candidate-pair volume exponent +1.00 in corpus size with
# K ∝ n vs +2.00 with K fixed, and flat max-cell occupancy — so the
# cluster count is DERIVED from corpus size (target mean cell
# occupancy SEM_CELL_TARGET, the curve's measured-flat cell size), not
# a fixture constant.  Floor of 8 keeps tiny corpora meaningful.
SEM_CELL_TARGET = 64


def sem_k(n: int) -> int:
    """Corpus-size-derived SemDeDup cluster count: ceil(n / target
    occupancy), min 8 — K ∝ n, the curve-proven scale-safe default."""
    return max(8, -(-n // SEM_CELL_TARGET))


# the identical derivation in SQL, over the oracle's embeddings view
SEM_K_SQL = (f"GREATEST(8, ((SELECT COUNT(*) FROM embeddings) + "
             f"{SEM_CELL_TARGET - 1}) // {SEM_CELL_TARGET})")
_EMB_DIM = 64

# same float32-exact perturbation as dedup_embedding_cosine
# (plans/llm_similarity.py): +0.0625 on the first component.
_PERTURB_S = ("concat(array(cast(embedding[0] + cast(0.0625 as float) as float)), "
              "slice(embedding, 2, size(embedding) - 1))")
_PERTURB_D = ("[CAST(embedding[1] + CAST(0.0625 AS FLOAT) AS FLOAT)] "
              "|| embedding[2:len(embedding)]")


def _sem_cos_spark(a: str, b: str) -> str:
    # unrolled (codegen) form of the aggregate(zip_with(...)) fold;
    # identical doubles — see functions/vecexpr.py numeric contract
    dot = unrolled_dot(a, b, _EMB_DIM)
    na = f"sqrt({unrolled_dot(a, a, _EMB_DIM)})"
    nb = f"sqrt({unrolled_dot(b, b, _EMB_DIM)})"
    return f"round(({dot}) / ({na} * {nb}), {SEM_COS_DECIMALS})"


def _sem_cos_duck(a: str, b: str) -> str:
    dot = (f"list_sum(list_transform(range(1, {_EMB_DIM} + 1), "
           f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")
    na = (f"sqrt(list_sum(list_transform(range(1, {_EMB_DIM} + 1), "
          f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))")
    nb = (f"sqrt(list_sum(list_transform(range(1, {_EMB_DIM} + 1), "
          f"i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))")
    return f"round({dot} / ({na} * {nb}), {SEM_COS_DECIMALS})"


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means codebook trained on the base embeddings
    (``kmeans_fit`` determinism contract), the dup-augmented corpus
    assigned to its nearest centroid (broadcast argmin, map-side
    combine), then cosine compared **within clusters only** — a vector is
    dropped when a same-cluster lower-id neighbor has cosine ≥ 0.98.

    Cluster-scoping is the SemDeDup recall trade: cross-cluster near-dups
    are missed by design, and in exchange pair volume falls k× and each
    cluster dedups independently (the embarrassingly-parallel unit)."""
    from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
    from star_schema_etl_airflow_spark.plans.clustering_queries import N_ITER

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _, codebook = kmeans_fit(emb, sem_k(emb.count()), N_ITER, dim=_EMB_DIM)
    dup = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + SEM_DUP_OFFSET).alias("vec_id"),
        F.expr(_PERTURB_S).alias("embedding"),
    )
    corpus = emb.unionByName(dup)
    # persist: assigned has THREE consumers (both sides of the pair
    # self-join + the final left join), so the codebook cross-join
    # argmin would otherwise execute three times; and pre-compute each
    # vector's norm ONCE here — the per-pair cosine then evaluates one
    # dot product instead of dot + two norms (the norms are the same
    # doubles either way, so the rounded cosine is bit-identical)
    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"
    assigned = persist_once(
        corpus.join(assign_clusters(corpus, codebook, dim=_EMB_DIM), "vec_id")
        .withColumn("__norm", F.expr(norm))
    )
    pairs = _sem_pairs(assigned)
    dropped = (
        pairs.select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            (~F.coalesce("is_dropped", F.lit(False))).alias("is_kept"),
        )
    )


def _sem_pairs(assigned: DataFrame) -> DataFrame:
    """Within-cluster near-dup pairs ``(vec_a < vec_b)`` at cosine ≥
    threshold — the candidate relation SemDeDup scopes to clusters
    (shared by :func:`semdedup` and its recall eval)."""
    a, b = assigned.alias("a"), assigned.alias("b")
    dot = unrolled_dot("a.embedding", "b.embedding", _EMB_DIM)
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(
            F.expr(f"round(({dot}) / (a.__norm * b.__norm), "
                   f"{SEM_COS_DECIMALS})")
            >= SEM_COS_THRESHOLD
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
    )


def semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup matches of a new ingest batch AGAINST the
    at-rest corpus — the SemDeDup member of the incremental family
    (``dedup_incremental`` exact hashes, ``dedup_incremental_minhash``
    shingle bands, ``embed_ivfpq_incremental`` codes; now embeddings).

    A recurring crawl cannot re-cluster-and-self-join the corpus per
    delta: the at-rest side participates through its FROZEN artifacts —
    the k-means codebook (trained once on the base embeddings, the
    production SemDeDup posture) and its standing cell assignment —
    while only the delta is assigned and compared fresh.  Cluster
    scoping applies to the probe exactly as to the full run: a delta
    vector is compared ONLY against at-rest members of its cell, so
    probe output ≡ the full recompute's (delta × at-rest) pair subset
    by construction (same codebook ⇒ same cells; pinned in
    ``tests/test_round4.py``).

    Synthetic delta (the ``dedup_incremental`` conventions): re-ingested
    near-copies (every 7th base vector, +0.03125 on the second
    component — exact in float32, cosine ≈ 0.999 to its source) that
    the probe must match, and genuinely-new vectors (every 11th,
    dimension-reversed — a fresh direction in the near-orthogonal
    fixture) that must match nothing.

    Output: (delta_id, corpus_id, cluster, cosine) per verified match."""
    from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
    from star_schema_etl_airflow_spark.plans.clustering_queries import N_ITER

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _, codebook = kmeans_fit(emb, sem_k(emb.count()), N_ITER, dim=_EMB_DIM)
    at_rest = emb.unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + SEM_DUP_OFFSET).alias("vec_id"),
            F.expr(_PERTURB_S).alias("embedding"),
        )
    )
    delta = (
        emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + SEM_RECRAWL_OFFSET).alias("vec_id"),
            F.expr(_PERTURB2_S).alias("embedding"),
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 11 == 0).select(
                (F.col("vec_id") + SEM_FRESH_OFFSET).alias("vec_id"),
                F.expr("reverse(embedding)").alias("embedding"),
            )
        )
    )
    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"

    def members(df: DataFrame) -> DataFrame:
        return (
            df.join(assign_clusters(df, codebook, dim=_EMB_DIM), "vec_id")
            .withColumn("__norm", F.expr(norm))
        )

    a = members(delta).alias("a")          # probe side: delta only
    b = persist_once(members(at_rest)).alias("b")
    dot = unrolled_dot("a.embedding", "b.embedding", _EMB_DIM)
    cos = f"round(({dot}) / (a.__norm * b.__norm), {SEM_COS_DECIMALS})"
    return (
        a.join(b, F.col("a.cluster") == F.col("b.cluster"))
        .filter(F.expr(cos) >= SEM_COS_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("delta_id"),
            F.col("b.vec_id").alias("corpus_id"),
            F.col("a.cluster").alias("cluster"),
            F.expr(cos).alias("cosine"),
        )
    )


SEM_RECRAWL_OFFSET = 7_000_000
SEM_FRESH_OFFSET = 8_000_000

# second exact-in-float32 perturbation (the recrawl edit): +0.03125 on
# the SECOND component — distinct from the at-rest dup's first-component
# edit so recrawl≠at-rest-dup rows stay distinguishable
_PERTURB2_S = ("concat(slice(embedding, 1, 1), "
               "array(cast(embedding[1] + cast(0.03125 as float) as float)), "
               "slice(embedding, 3, size(embedding) - 2))")
_PERTURB2_D = ("embedding[1:1] || "
               "[CAST(embedding[2] + CAST(0.03125 AS FLOAT) AS FLOAT)] "
               "|| embedding[3:len(embedding)]")


def _sem_assign_cte(cent_table: str, name: str = "sem_assign",
                    src: str = "sem_corpus") -> str:
    diff = (f"(CAST(v.embedding[i] AS DOUBLE) - "
            f"CAST({cent_table}.embedding[i] AS DOUBLE))")
    dist = (f"list_sum(list_transform(range(1, {_EMB_DIM} + 1), "
            f"i -> {diff} * {diff}))")
    return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, {cent_table}.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY {dist}, {cent_table}.cluster) AS rn
    FROM {src} v CROSS JOIN {cent_table}
  ) WHERE rn = 1
)"""


def _semdedup_incremental_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        kmeans_ctes,
    )

    return f"""
WITH {kmeans_ctes(SEM_K_SQL)},
si_at AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEM_DUP_OFFSET}, {_PERTURB_D}
  FROM embeddings WHERE vec_id % 5 = 0
),
si_delta AS (
  SELECT vec_id + {SEM_RECRAWL_OFFSET} AS vec_id, {_PERTURB2_D} AS embedding
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + {SEM_FRESH_OFFSET}, list_reverse(embedding)
  FROM embeddings WHERE vec_id % 11 = 0
),
{_sem_assign_cte('c2', 'si_aa', 'si_at')},
{_sem_assign_cte('c2', 'si_ad', 'si_delta')},
si_ja AS (
  SELECT v.vec_id, v.embedding, a.cluster
  FROM si_at v JOIN si_aa a USING (vec_id)
),
si_jd AS (
  SELECT v.vec_id, v.embedding, a.cluster
  FROM si_delta v JOIN si_ad a USING (vec_id)
)
SELECT d.vec_id AS delta_id, r.vec_id AS corpus_id, d.cluster,
       {_sem_cos_duck('d.embedding', 'r.embedding')} AS cosine
FROM si_jd d JOIN si_ja r ON d.cluster = r.cluster
WHERE {_sem_cos_duck('d.embedding', 'r.embedding')} >= {SEM_COS_THRESHOLD}
"""


def _semdedup_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        kmeans_ctes,
    )

    return f"""
WITH {kmeans_ctes(SEM_K_SQL)},
sem_corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEM_DUP_OFFSET}, {_PERTURB_D}
  FROM embeddings WHERE vec_id % 5 = 0
),
{_sem_assign_cte('c2')},
j AS (
  SELECT v.vec_id, v.embedding, a.cluster
  FROM sem_corpus v JOIN sem_assign a USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM j a JOIN j b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_sem_cos_duck('a.embedding', 'b.embedding')} >= {SEM_COS_THRESHOLD}
)
SELECT j.vec_id, j.cluster, d.vec_id IS NULL AS is_kept
FROM j LEFT JOIN dropped d ON j.vec_id = d.vec_id
"""


def semdedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup recall as a query (the ``dedup_eval`` pattern on the
    SEMANTIC family): cluster-scoped pairs vs the repo's established
    embedding-cosine truth (``dedup_embedding_cosine`` — LSH-bucketed
    pairwise cosine at the SAME threshold over the SAME dup-augmented
    corpus, ``plans/llm_similarity.py``).

    ``recall_semantic`` prices SemDeDup's trade explicitly: a truth
    pair is missed exactly when k-means separates its two members
    (cross-cluster near-dups are invisible by design — the k× pair-
    volume reduction is bought with those misses); ``n_extra`` counts
    pairs only cluster scoping finds (same cell, different LSH
    bucket).  Every tally is a 1-row aggregate crossJoined at the end
    (control-plane sized) — the corpus is scanned once per side."""
    from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
    from star_schema_etl_airflow_spark.plans.clustering_queries import N_ITER
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        dedup_embedding_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _, codebook = kmeans_fit(emb, sem_k(emb.count()), N_ITER, dim=_EMB_DIM)
    dup = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + SEM_DUP_OFFSET).alias("vec_id"),
        F.expr(_PERTURB_S).alias("embedding"),
    )
    corpus = emb.unionByName(dup)
    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"
    assigned = persist_once(
        corpus.join(assign_clusters(corpus, codebook, dim=_EMB_DIM), "vec_id")
        .withColumn("__norm", F.expr(norm))
    )
    caught = persist_once(_sem_pairs(assigned))
    truth = persist_once(
        dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b")
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_caught = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    n_hit = (
        caught.join(truth, ["vec_a", "vec_b"])
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        n_truth.crossJoin(n_caught).crossJoin(n_hit)
        .select(
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_caught").cast("long").alias("n_caught"),
            F.col("n_hit").cast("long").alias("n_hit"),
            (F.col("n_caught") - F.col("n_hit")).cast("long")
            .alias("n_extra"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_truth"), 9
            ).alias("recall_semantic"),
        )
    )


def _semdedup_eval_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        kmeans_ctes,
    )
    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        EMB_COS_THRESHOLD,
        _bucket_duck,
    )

    assert EMB_COS_THRESHOLD == SEM_COS_THRESHOLD  # shared τ by design
    return f"""
WITH {kmeans_ctes(SEM_K_SQL)},
sem_corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEM_DUP_OFFSET}, {_PERTURB_D}
  FROM embeddings WHERE vec_id % 5 = 0
),
{_sem_assign_cte('c2')},
j AS (
  SELECT v.vec_id, v.embedding, a.cluster
  FROM sem_corpus v JOIN sem_assign a USING (vec_id)
),
caught AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM j a JOIN j b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {_sem_cos_duck('a.embedding', 'b.embedding')} >= {SEM_COS_THRESHOLD}
),
lsh AS (
  SELECT vec_id, embedding, {_bucket_duck('embedding')} AS bucket
  FROM sem_corpus
),
truth AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM lsh a JOIN lsh b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE {_sem_cos_duck('a.embedding', 'b.embedding')} >= {SEM_COS_THRESHOLD}
),
tallies AS (
  SELECT
    (SELECT COUNT(*) FROM truth) AS n_truth,
    (SELECT COUNT(*) FROM caught) AS n_caught,
    (SELECT COUNT(*) FROM caught c JOIN truth t
       ON c.vec_a = t.vec_a AND c.vec_b = t.vec_b) AS n_hit
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_caught AS BIGINT) AS n_caught,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST(n_caught - n_hit AS BIGINT) AS n_extra,
       ROUND(CAST(n_hit AS DOUBLE) / n_truth, 9) AS recall_semantic
FROM tallies
"""


# --- incremental NEAR-dup probe (delta vs corpus via MinHash bands) --------

BATCH_MUTANT_OFFSET = 6_000_000
BATCH_FRESH_OFFSET = 7_000_000

# Recrawl edit: drop every 13th token.  The corpus-amplifier mutation
# (every 7th, plans/llm_dedup._MUTATE_S) lands at shingle-Jaccard
# ≈ 0.47 — just UNDER the family threshold, so a probe with it
# degenerates to "everything is new".  A real recrawl is a light edit;
# every-13th measures ≈ 0.6 and exercises both outcomes (most mutants
# match their source, the heavier-edited tail stays below threshold).
_LIGHT_MUTATE_S = (
    f"array_join(filter({_TOKS_S}, (x, i) -> i % 13 != 0), ' ')"
)
_LIGHT_MUTATE_D = (
    f"array_to_string(list_transform("
    f"list_filter(range(0, len({_TOKS_D})), i -> i % 13 <> 0), "
    f"i -> ({_TOKS_D})[i + 1]), ' ')"
)


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup matches of a new ingest batch AGAINST the existing
    corpus — the MinHash companion of :func:`dedup_incremental` (which
    probes exact content hashes and is blind to edits).

    A recurring crawl cannot re-run the corpus SELF-join per delta:
    re-banding 100 TB daily to ingest a few GB is a non-starter.  The
    incremental shape probes only: the corpus participates through its
    (materialized, at rest bucketed-by-band-key) band index and its
    signature table — both written once by the full pass — while the
    delta is the only side that is shingled, banded, and shuffled
    fresh.  Candidates = delta bands ⨝ corpus band index; verify =
    exact Jaccard on the hashed shingle sets, same threshold as the
    full self-join, so a doc surviving this probe is exactly the doc
    the full re-run would have kept.

    The synthetic delta mirrors ``dedup_incremental``'s: mutated
    recrawls (every 7th token dropped — near-dups the exact-hash probe
    misses by construction) and genuinely-new docs (reversed token
    order: same vocabulary, disjoint shingles).

    Output: (batch_id, corpus_id, jaccard) per verified match; fresh
    docs appear in no row (kept), mutants match their source (dropped
    or routed to re-crawl dedup policy)."""
    from star_schema_etl_airflow_spark.plans.llm_dedup import signature_of

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
    # corpus side: signatures + band index are the PRE-MATERIALIZED
    # artifacts of the full pass (persist_once stands in for the
    # at-rest tables); the delta side is computed fresh per batch
    csig = persist_once(signature_of(docs))
    return minhash_batch_probe(batch, csig)


def minhash_batch_probe(batch: DataFrame, csig: DataFrame) -> DataFrame:
    """The probe itself, factored for reuse (the two-axis scale curve,
    ``tools/incremental_curve.py``, feeds it independently-sized
    corpora and deltas): delta docs are shingled/banded fresh; the
    corpus participates only through its signature relation ``csig``
    (and the band index derived from it — at rest, both are the full
    pass's materialized tables, bucketed by band key)."""
    from star_schema_etl_airflow_spark.functions.text import jaccard_spark
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        JACCARD_THRESHOLD,
        band_buckets,
        signature_of,
    )

    bsig = persist_once(signature_of(batch))
    cband = band_buckets(csig).select(
        F.col("doc_id").alias("corpus_id"), "band_idx", "band_key"
    )
    bband = band_buckets(bsig).select(
        F.col("doc_id").alias("batch_id"), "band_idx", "band_key"
    )
    cand = (
        bband.join(cband, ["band_idx", "band_key"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    bh = bsig.select(F.col("doc_id").alias("batch_id"),
                     F.col("hashes").alias("bh"))
    ch = csig.select(F.col("doc_id").alias("corpus_id"),
                     F.col("hashes").alias("chs"))
    return (
        cand.join(bh, "batch_id")
        .join(ch, "corpus_id")
        .select(
            "batch_id",
            "corpus_id",
            F.expr(jaccard_spark("bh", "chs")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _inc_minhash_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        JACCARD_THRESHOLD,
        _duck_bands,
        _duck_minhash_sig,
    )
    from star_schema_etl_airflow_spark.functions.text import jaccard_duck

    jac = jaccard_duck("bh.hashes", "ch.hashes")
    return f"""
WITH batch AS (
  SELECT doc_id + {BATCH_MUTANT_OFFSET} AS doc_id, {_LIGHT_MUTATE_D} AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {BATCH_FRESH_OFFSET}, {_REV_D}
  FROM documents WHERE doc_id % 15 = 0
),
corpus AS (SELECT doc_id, text FROM documents),
{_duck_minhash_sig("corpus", "csigh")},
{_duck_minhash_sig("batch", "bsigh")},
cbuckets AS (
{_duck_bands("csigh")}
),
bbuckets AS (
{_duck_bands("bsigh")}
),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM bbuckets b JOIN cbuckets c
    ON b.band_idx = c.band_idx AND b.band_key = c.band_key
)
SELECT cand.batch_id, cand.corpus_id, {jac} AS jaccard
FROM cand
JOIN bsigh bh ON cand.batch_id = bh.doc_id
JOIN csigh ch ON cand.corpus_id = ch.doc_id
WHERE {jac} >= {JACCARD_THRESHOLD}
"""


register(QuerySpec("dedup_lines", dedup_lines, DEDUP_LINES_ORACLE,
                   tags=("LLM-DEDUP",)))
register(QuerySpec("dedup_incremental", dedup_incremental,
                   DEDUP_INCREMENTAL_ORACLE, tags=("LLM-DEDUP",)))
register(QuerySpec("dedup_incremental_minhash", dedup_incremental_minhash,
                   _inc_minhash_oracle(), tags=("LLM-DEDUP",)))
from star_schema_etl_airflow_spark.plans.ivfpq import mat_ctes as _mat  # noqa: E402

register(QuerySpec("semdedup", semdedup, _mat(_semdedup_oracle()),
                   tags=("LLM-DEDUP", "KMEANS")))
register(QuerySpec("semdedup_eval", semdedup_eval,
                   _mat(_semdedup_eval_oracle()),
                   tags=("LLM-DEDUP", "KMEANS", "EVAL")))
register(QuerySpec("semdedup_incremental", semdedup_incremental,
                   _mat(_semdedup_incremental_oracle()),
                   tags=("LLM-DEDUP", "KMEANS", "INCREMENTAL")))
