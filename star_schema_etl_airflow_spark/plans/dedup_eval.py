"""Dedup-quality evaluation as a query — the MinHash-LSH twin of
``plans/retrieval_eval.py``: measure the banding's recall against
constructed ground truth, and the candidate filter's precision, in one
differential query.

Ground truth is the corpus's own injected duplicates
(``plans/llm_dedup.py::build_corpus``: every 10th doc re-appears
verbatim at ``+EXACT_DUP_OFFSET``, every 5th with ~14% of tokens
dropped at ``+NEAR_DUP_OFFSET``), kept only where the pair's EXACT
shingle-set Jaccard clears the pipeline's own threshold — so "relevant"
is defined by the same τ the pipeline verifies against, not by the
injection recipe.  This keeps truth LINEAR in the corpus (the injected
pair list is an equi-join on the id mapping), never an all-pairs scan.

What the numbers mean (b=4 bands of r=4): an exact pair (J=1) collides
in every band — recall_exact must be 1.0, and the test pins that; a
near pair at J≈0.6 collides with probability 1−(1−J⁴)⁴ ≈ 0.4 — the
classic S-curve miss rate that motivates banding-parameter choice, now
measured per corpus instead of assumed.  ``cand_precision`` is the
fraction of bucket-join candidates that survive exact verification —
the knob that prices the verify stage.

Scale design: signatures build in one corpus scan (shared, persisted);
the candidate join is the banded bucket join (never all-pairs); the
truth join is id-keyed and linear; every tally is a 1-row aggregate
crossJoined at the end (control-plane sized).

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    jaccard_duck,
    jaccard_spark,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    EXACT_DUP_OFFSET,
    JACCARD_THRESHOLD,
    NEAR_DUP_OFFSET,
    _duck_bands,
    _duck_minhash_sig,
    _signature_df,
    band_buckets,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register

EVAL_DECIMALS = 9


def _injected_pairs(sig: DataFrame, offset: int) -> DataFrame:
    """(doc_a, doc_b, jaccard) for one injected family — id-keyed join,
    linear in the corpus."""
    base = sig.select(F.col("doc_id").alias("doc_a"),
                      F.col("hashes").alias("ha"))
    twin = sig.filter(
        (F.col("doc_id") >= offset)
        & (F.col("doc_id") < offset + NEAR_DUP_OFFSET)
    ).select(
        (F.col("doc_id") - offset).alias("doc_a"),
        F.col("doc_id").alias("doc_b"),
        F.col("hashes").alias("hb"),
    )
    return (
        twin.join(base, "doc_a")
        .select(
            "doc_a", "doc_b",
            F.expr(jaccard_spark("ha", "hb")).alias("jaccard"),
        )
    )


def dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = persist_once(_signature_df(spark, sf_dir))
    buckets = band_buckets(sig)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = persist_once(
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = sig.select("doc_id", "hashes")
    predicted = persist_once(
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.expr(jaccard_spark("sa.hashes", "sb.hashes")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )

    def relevant(offset: int) -> DataFrame:
        return persist_once(
            _injected_pairs(sig, offset)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b")
        )

    rel_exact, rel_near = relevant(EXACT_DUP_OFFSET), relevant(NEAR_DUP_OFFSET)

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    tp_exact = rel_exact.join(predicted, ["doc_a", "doc_b"])
    tp_near = rel_near.join(predicted, ["doc_a", "doc_b"])
    out = (
        n(rel_exact, "n_relevant_exact")
        .crossJoin(n(rel_near, "n_relevant_near"))
        .crossJoin(n(tp_exact, "n_tp_exact"))
        .crossJoin(n(tp_near, "n_tp_near"))
        .crossJoin(n(cand, "n_candidates"))
        .crossJoin(n(predicted, "n_predicted"))
    )
    r = lambda num, den: F.round(  # noqa: E731
        F.col(num).cast("double") / F.col(den).cast("double"), EVAL_DECIMALS
    )
    return out.select(
        "n_relevant_exact", "n_relevant_near", "n_tp_exact", "n_tp_near",
        "n_candidates", "n_predicted",
        r("n_tp_exact", "n_relevant_exact").alias("recall_exact"),
        r("n_tp_near", "n_relevant_near").alias("recall_near"),
        r("n_predicted", "n_candidates").alias("cand_precision"),
    )


def _duck_injected(name: str, offset: int) -> str:
    return f"""{name} AS (
  SELECT t.doc_a, t.doc_b
  FROM (
    SELECT doc_id - {offset} AS doc_a, doc_id AS doc_b, hashes AS hb
    FROM sigh
    WHERE doc_id >= {offset} AND doc_id < {offset} + {NEAR_DUP_OFFSET}
  ) t
  JOIN (SELECT doc_id AS doc_a, hashes AS ha FROM sigh) s USING (doc_a)
  WHERE {jaccard_duck('s.ha', 't.hb')} >= {JACCARD_THRESHOLD}
)"""


DEDUP_EVAL_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_minhash_sig()},
buckets AS (
{_duck_bands()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
predicted AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sigh sa ON c.doc_a = sa.doc_id
  JOIN sigh sb ON c.doc_b = sb.doc_id
  WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
),
{_duck_injected('rel_exact', EXACT_DUP_OFFSET)},
{_duck_injected('rel_near', NEAR_DUP_OFFSET)},
counts AS (
  SELECT
    (SELECT COUNT(*) FROM rel_exact) AS n_relevant_exact,
    (SELECT COUNT(*) FROM rel_near) AS n_relevant_near,
    (SELECT COUNT(*) FROM rel_exact r JOIN predicted p
       ON r.doc_a = p.doc_a AND r.doc_b = p.doc_b) AS n_tp_exact,
    (SELECT COUNT(*) FROM rel_near r JOIN predicted p
       ON r.doc_a = p.doc_a AND r.doc_b = p.doc_b) AS n_tp_near,
    (SELECT COUNT(*) FROM cand) AS n_candidates,
    (SELECT COUNT(*) FROM predicted) AS n_predicted
)
SELECT n_relevant_exact, n_relevant_near, n_tp_exact, n_tp_near,
       n_candidates, n_predicted,
       ROUND(CAST(n_tp_exact AS DOUBLE) / CAST(n_relevant_exact AS DOUBLE),
             {EVAL_DECIMALS}) AS recall_exact,
       ROUND(CAST(n_tp_near AS DOUBLE) / CAST(n_relevant_near AS DOUBLE),
             {EVAL_DECIMALS}) AS recall_near,
       ROUND(CAST(n_predicted AS DOUBLE) / CAST(n_candidates AS DOUBLE),
             {EVAL_DECIMALS}) AS cand_precision
FROM counts
"""

register(QuerySpec("dedup_eval", dedup_eval, DEDUP_EVAL_ORACLE,
                   tags=("LLM-DEDUP", "EVAL")))


# --- banding-parameter sweep ------------------------------------------------

# (bands, rows-per-band) splits of the 16-hash signature.  The S-curve
# catch probability at Jaccard J is 1−(1−J^r)^b: more bands with
# shorter rows buys recall at the price of candidate volume; this query
# measures BOTH sides of that trade on the actual corpus — the
# parameter-selection table a dedup deployment reads before fixing
# (b, r).  (16, 1) is excluded by design: single-hash buckets collapse
# to near-all-pairs on self-similar corpora — the config the S-curve
# already rules out.
BANDING_CONFIGS = ((8, 2), (4, 4), (2, 8))


def _bands_of(sig: DataFrame, b: int, r: int) -> DataFrame:
    """Parameterized banding — ``llm_dedup.band_buckets`` generalized
    to any (b, r) split of the signature."""
    exprs = []
    for i in range(b):
        row = ", ".join(f"mh{i * r + j}" for j in range(r))
        exprs.append(f"{i}, md5(concat_ws(',', {row}))")
    return sig.select(
        "doc_id",
        F.expr(f"stack({b}, {', '.join(exprs)}) as (band_idx, band_key)"),
    )


def dedup_eval_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per banding config: candidate volume, verified pairs,
    near-dup recall vs the τ-filtered injected truth, and candidate
    precision — the measured S-curve trade.  Signatures and the truth
    sets build once (persisted) and every config reuses them; each
    config's candidate join is the same banded bucket join, never
    all-pairs."""
    sig = persist_once(_signature_df(spark, sf_dir))
    sh = sig.select("doc_id", "hashes")
    rel_near = persist_once(
        _injected_pairs(sig, NEAR_DUP_OFFSET)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    n_rel = rel_near.agg(F.count(F.lit(1)).alias("n_relevant_near"))

    out = None
    for b, r in BANDING_CONFIGS:
        buckets = _bands_of(sig, b, r)
        x, y = buckets.alias("a"), buckets.alias("b")
        cand = persist_once(
            x.join(
                y,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        predicted = persist_once(
            cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .filter(
                F.expr(jaccard_spark("sa.hashes", "sb.hashes"))
                >= JACCARD_THRESHOLD
            )
            .select("doc_a", "doc_b")
        )
        row = (
            cand.agg(F.count(F.lit(1)).alias("n_candidates"))
            .crossJoin(predicted.agg(F.count(F.lit(1)).alias("n_predicted")))
            .crossJoin(
                rel_near.join(predicted, ["doc_a", "doc_b"])
                .agg(F.count(F.lit(1)).alias("n_tp_near"))
            )
            .crossJoin(n_rel)
            .select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_predicted",
                "n_tp_near",
                F.round(
                    F.col("n_tp_near").cast("double")
                    / F.col("n_relevant_near").cast("double"),
                    EVAL_DECIMALS,
                ).alias("recall_near"),
                F.round(
                    F.col("n_predicted").cast("double")
                    / F.col("n_candidates").cast("double"),
                    EVAL_DECIMALS,
                ).alias("cand_precision"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _duck_bands_of(b: int, r: int) -> str:
    parts = []
    for i in range(b):
        row = " || ',' || ".join(f"mh{i * r + j}" for j in range(r))
        parts.append(
            f"SELECT doc_id, {i} AS band_idx, md5({row}) AS band_key "
            f"FROM sigh"
        )
    return "\nUNION ALL\n".join(parts)


def _banding_cfg_select(b: int, r: int) -> str:
    return f"""
  SELECT CAST({b} AS INTEGER) AS n_bands,
         CAST({r} AS INTEGER) AS rows_per_band,
         (SELECT COUNT(*) FROM cand_{b}_{r}) AS n_candidates,
         (SELECT COUNT(*) FROM pred_{b}_{r}) AS n_predicted,
         (SELECT COUNT(*) FROM rel_near x JOIN pred_{b}_{r} p
            ON x.doc_a = p.doc_a AND x.doc_b = p.doc_b) AS n_tp_near,
         ROUND(CAST((SELECT COUNT(*) FROM rel_near x JOIN pred_{b}_{r} p
                       ON x.doc_a = p.doc_a AND x.doc_b = p.doc_b) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM rel_near) AS DOUBLE),
               {EVAL_DECIMALS}) AS recall_near,
         ROUND(CAST((SELECT COUNT(*) FROM pred_{b}_{r}) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM cand_{b}_{r}) AS DOUBLE),
               {EVAL_DECIMALS}) AS cand_precision"""


def _banding_cfg_ctes(b: int, r: int) -> str:
    return f"""bk_{b}_{r} AS (
{_duck_bands_of(b, r)}
),
cand_{b}_{r} AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk_{b}_{r} a JOIN bk_{b}_{r} b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
pred_{b}_{r} AS (
  SELECT c.doc_a, c.doc_b
  FROM cand_{b}_{r} c
  JOIN sigh sa ON c.doc_a = sa.doc_id
  JOIN sigh sb ON c.doc_b = sb.doc_id
  WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
)"""


DEDUP_EVAL_BANDING_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_minhash_sig()},
{_duck_injected('rel_near', NEAR_DUP_OFFSET)},
{", ".join(_banding_cfg_ctes(b, r) for b, r in BANDING_CONFIGS)}
{" UNION ALL ".join(_banding_cfg_select(b, r) for b, r in BANDING_CONFIGS)}
"""

# MATERIALIZED CTEs (r15): DuckDB re-evaluated the shared signature
# chain per reference — 5.8s -> 0.56s at sf0.01, identical rows
from star_schema_etl_airflow_spark.plans.ivfpq import mat_ctes as _mat  # noqa: E402

register(QuerySpec("dedup_eval_banding", dedup_eval_banding,
                   _mat(DEDUP_EVAL_BANDING_ORACLE),
                   tags=("LLM-DEDUP", "EVAL")))


# --- SimHash-family eval ----------------------------------------------------


def simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash twin of :func:`dedup_eval`: recall of the 4×12-bit
    banded discovery against the injected truth (relevance = true
    hamming ≤ the pipeline's own threshold).  An identical-text pair
    has hamming 0 — every band collides, so ``recall_exact`` must be
    1.0; a mutated pair at hamming 1..4 can scatter its differing bits
    across all four bands (the pigeonhole guarantee only covers
    hamming < 4 bands... strictly hamming ≤ 3 pairs share a band, a
    hamming-4 pair may not) — the measured near recall prices exactly
    that residual miss class."""
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        HAMMING_THRESHOLD,
        build_corpus,
        simhash_banded_pairs,
        simhash_relation,
    )

    sim = persist_once(simhash_relation(build_corpus(spark, sf_dir)))
    predicted = persist_once(
        simhash_banded_pairs(sim).select("doc_a", "doc_b")
    )

    def relevant(offset: int) -> DataFrame:
        base = sim.select(F.col("doc_id").alias("doc_a"),
                          F.col("simhash").alias("ha"))
        twin = sim.filter(
            (F.col("doc_id") >= offset)
            & (F.col("doc_id") < offset + NEAR_DUP_OFFSET)
        ).select(
            (F.col("doc_id") - offset).alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("hb"),
        )
        return persist_once(
            twin.join(base, "doc_a")
            .filter(F.expr("bit_count(ha ^ hb)") <= HAMMING_THRESHOLD)
            .select("doc_a", "doc_b")
        )

    rel_exact = relevant(EXACT_DUP_OFFSET)
    rel_near = relevant(NEAR_DUP_OFFSET)

    def n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    out = (
        n(rel_exact, "n_relevant_exact")
        .crossJoin(n(rel_near, "n_relevant_near"))
        .crossJoin(n(rel_exact.join(predicted, ["doc_a", "doc_b"]),
                     "n_tp_exact"))
        .crossJoin(n(rel_near.join(predicted, ["doc_a", "doc_b"]),
                     "n_tp_near"))
        .crossJoin(n(predicted, "n_predicted"))
    )
    r = lambda num, den: F.round(  # noqa: E731
        F.col(num).cast("double") / F.col(den).cast("double"), EVAL_DECIMALS
    )
    return out.select(
        "n_relevant_exact", "n_relevant_near", "n_tp_exact", "n_tp_near",
        "n_predicted",
        r("n_tp_exact", "n_relevant_exact").alias("recall_exact"),
        r("n_tp_near", "n_relevant_near").alias("recall_near"),
    )


def _simhash_eval_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        HAMMING_THRESHOLD,
        _duck_sim_bands,
        _duck_simhash,
    )

    def rel(name: str, offset: int) -> str:
        return f"""{name} AS (
  SELECT t.doc_a, t.doc_b
  FROM (
    SELECT doc_id - {offset} AS doc_a, doc_id AS doc_b, simhash AS hb
    FROM sim
    WHERE doc_id >= {offset} AND doc_id < {offset} + {NEAR_DUP_OFFSET}
  ) t
  JOIN (SELECT doc_id AS doc_a, simhash AS ha FROM sim) s USING (doc_a)
  WHERE bit_count(xor(s.ha, t.hb)) <= {HAMMING_THRESHOLD}
)"""

    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_simhash()},
buckets AS (
{_duck_sim_bands()}
),
predicted AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
),
{rel('rel_exact', EXACT_DUP_OFFSET)},
{rel('rel_near', NEAR_DUP_OFFSET)},
counts AS (
  SELECT
    (SELECT COUNT(*) FROM rel_exact) AS n_relevant_exact,
    (SELECT COUNT(*) FROM rel_near) AS n_relevant_near,
    (SELECT COUNT(*) FROM rel_exact r JOIN predicted p
       ON r.doc_a = p.doc_a AND r.doc_b = p.doc_b) AS n_tp_exact,
    (SELECT COUNT(*) FROM rel_near r JOIN predicted p
       ON r.doc_a = p.doc_a AND r.doc_b = p.doc_b) AS n_tp_near,
    (SELECT COUNT(*) FROM predicted) AS n_predicted
)
SELECT n_relevant_exact, n_relevant_near, n_tp_exact, n_tp_near,
       n_predicted,
       ROUND(CAST(n_tp_exact AS DOUBLE) / CAST(n_relevant_exact AS DOUBLE),
             {EVAL_DECIMALS}) AS recall_exact,
       ROUND(CAST(n_tp_near AS DOUBLE) / CAST(n_relevant_near AS DOUBLE),
             {EVAL_DECIMALS}) AS recall_near
FROM counts
"""


register(QuerySpec("simhash_eval", simhash_eval, _simhash_eval_oracle(),
                   tags=("LLM-DEDUP", "EVAL")))
