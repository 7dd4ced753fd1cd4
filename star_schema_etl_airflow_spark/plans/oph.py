"""One-permutation MinHash with densification (OPH; Shrivastava & Li,
"Densifying One Permutation Hashing via Rotation for Fast Near
Neighbor Search", ICML 2014) — the cheap sibling of the K-rehash
MinHash in ``plans/llm_dedup.py``.

Classic MinHash evaluates K independent universal hashes over every
shingle (K full passes over the shingle array per document).  OPH
applies ONE permutation hash π, splits π's range into K bins
(``bin = π % K``), and takes the within-bin minimum of ``π // K`` —
one heavy pass plus K cheap bin-filters.  Empty bins (short documents)
are densified by rotation: bin j borrows the value of the nearest
non-empty bin to its right (circularly), offset by ``t·C`` per hop so
borrowed values cannot collide with genuine ones — here a K-term
COALESCE chain, identical SQL in both engines.  The estimator is
unbiased with variance comparable to K-rehash MinHash (the paper's
result); the banding, bucket join, and exact-Jaccard verify are reused
verbatim from the LSH pipeline, so the ONLY change is signature cost.

Determinism: π is the same seeded affine hash family as
``functions/text.uhash_*`` (public LCG constants), bin math is integer
BIGINT, and ties inside a bin are impossible (π is injective on
distinct shingle hashes below P) — fully oracle-checkable.

Scale: signature construction is map-side either way; at 100 TB the
K-rehash signature pass is the dominant CPU of the dedup front (the
md5 pass is shared), so halving-to-quartering the per-shingle hash
work moves the whole-corpus bill.  Measured on the fixture corpus in
``BENCH_*`` extras (``dedup_minhash_oph`` vs ``dedup_minhash_lsh``).

Cited reference behavior: none in /root/reference (no dedup there);
published-algorithm parity only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.functions.text import (
    N_MINHASH,
    UHASH_P,
    jaccard_duck,
    jaccard_spark,
    shingle_hashes_duck,
    shingle_hashes_spark,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    EXACT_DUP_OFFSET,
    JACCARD_THRESHOLD,
    NEAR_DUP_OFFSET,
    _SH_D,
    _SH_S,
    band_buckets,
    build_corpus,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register

K_BINS = N_MINHASH            # one bin per signature component
OPH_A = 1103515245            # public LCG constants (the repo's seeds)
OPH_B = 12345
OPH_C = UHASH_P               # per-hop densification offset


def _coalesce_chain(col_of, j: int) -> str:
    """H_j = value of the first non-empty bin at rotation t = 0..K-1,
    borrowed values offset by t·C (the paper's rotation scheme)."""
    terms = [col_of(j)]
    for t in range(1, K_BINS):
        terms.append(f"{col_of((j + t) % K_BINS)} + {t * OPH_C}")
    return f"coalesce({', '.join(terms)})"


def oph_signature_of(docs: DataFrame) -> DataFrame:
    """(doc_id, hashes, mh0..mh{K-1}): densified OPH signature — same
    column contract as ``llm_dedup.signature_of``, so the banding and
    verify machinery applies unchanged."""
    pi = (f"transform(hashes, h -> "
          f"({OPH_A}L * h + {OPH_B}L) % {UHASH_P})")
    binned = docs.select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({shingle_hashes_spark(_SH_S)})"
        ).alias("hashes"),
    ).select(
        "doc_id", "hashes", F.expr(pi).alias("__pi")
    ).select(
        "doc_id",
        "hashes",
        *[
            # fused single pass per bin: array_min skips NULLs, so the
            # off-bin elements map to NULL instead of a filter+transform
            # double pass (measured ~25% off the signature build)
            F.expr(
                f"array_min(transform(__pi, "
                f"p -> if(p % {K_BINS} = {j}, p div {K_BINS}, "
                f"cast(null as bigint))))"
            ).alias(f"__b{j}")
            for j in range(K_BINS)
        ],
    )
    return binned.select(
        "doc_id",
        "hashes",
        *[
            F.expr(_coalesce_chain(lambda i: f"__b{i}", j)).alias(f"mh{j}")
            for j in range(K_BINS)
        ],
    )


def _candidates(sig: DataFrame) -> DataFrame:
    """Distinct banded candidate pairs of a signature relation.
    Shingle-less documents (all-NULL signature) are EXCLUDED before
    banding on BOTH engines: Spark's concat_ws would hash their NULL
    bands to md5('') and pair every such doc, while the oracle's
    ``||`` concatenation yields NULL keys that never join — filtering
    them out makes the two semantics identical (r16 self-review
    finding; such docs have no shingles to verify against anyway)."""
    buckets = band_buckets(sig.filter(F.col("mh0").isNotNull()))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
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


def _verified_pairs(sig: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact-Jaccard verify of candidate pairs against the signature
    relation's shingle-hash sets — shared by all three OPH queries."""
    sh = sig.select("doc_id", "hashes")
    return (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.expr(jaccard_spark("sa.hashes", "sb.hashes"))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_minhash_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the OPH signature: identical
    banding/bucket-join/verify to ``dedup_minhash_lsh`` — only the
    signature construction differs (1 permutation pass vs K rehash
    passes)."""
    sig = persist_once(oph_signature_of(build_corpus(spark, sf_dir)))
    return _verified_pairs(sig, _candidates(sig))


# --- DuckDB oracle ----------------------------------------------------------


def _duck_oph_sig(src: str = "corpus", name: str = "sigo") -> str:
    mins = ",\n         ".join(
        f"list_min(list_transform(pi, "
        f"p -> CASE WHEN p % {K_BINS} = {j} THEN p // {K_BINS} END))"
        f" AS b{j}"
        for j in range(K_BINS)
    )
    hs = ",\n         ".join(
        _coalesce_chain(lambda i: f"b{i}", j) + f" AS mh{j}"
        for j in range(K_BINS)
    )
    return f"""
{name}_sets AS (
  SELECT doc_id, list_distinct({shingle_hashes_duck(_SH_D)}) AS hashes
  FROM {src}
),
{name}_pi AS (
  SELECT doc_id, hashes,
         list_transform(hashes, h -> ({OPH_A} * h + {OPH_B}) % {UHASH_P})
           AS pi
  FROM {name}_sets
),
{name}_bins AS (
  SELECT doc_id, hashes,
         {mins}
  FROM {name}_pi
),
{name} AS (
  SELECT doc_id, hashes,
         {hs}
  FROM {name}_bins
)"""


def _duck_oph_bands(name: str = "sigo") -> str:
    from star_schema_etl_airflow_spark.plans.llm_dedup import (
        _N_BANDS,
    )
    from star_schema_etl_airflow_spark.functions.text import LSH_BAND_ROWS

    parts = []
    for b in range(_N_BANDS):
        row = " || ',' || ".join(
            f"mh{b * LSH_BAND_ROWS + r}" for r in range(LSH_BAND_ROWS)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band_idx, md5({row}) AS band_key "
            f"FROM {name} WHERE mh0 IS NOT NULL"
        )
    return "\nUNION ALL\n".join(parts)


DEDUP_MINHASH_OPH_ORACLE = f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_oph_sig()},
buckets AS (
{_duck_oph_bands()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       {jaccard_duck('sa.hashes', 'sb.hashes')} AS jaccard
FROM cand c
JOIN sigo sa ON c.doc_a = sa.doc_id
JOIN sigo sb ON c.doc_b = sb.doc_id
WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
"""

register(QuerySpec("dedup_minhash_oph", dedup_minhash_oph,
                   DEDUP_MINHASH_OPH_ORACLE, tags=("LLM-DEDUP",)))


# --- recall parity eval vs the injected truth (the dedup_eval twin) ---------


def dedup_minhash_oph_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``dedup_eval`` measurement with the OPH signature: recall
    against the SAME injected truth (exact shingle-Jaccard ≥ τ), so
    the OPH-vs-K-rehash recall comparison is a two-row read across the
    two eval queries."""
    from star_schema_etl_airflow_spark.plans.dedup_eval import (
        EVAL_DECIMALS,
        _injected_pairs,
    )

    sig = persist_once(oph_signature_of(build_corpus(spark, sf_dir)))
    cand = persist_once(_candidates(sig))
    predicted = persist_once(
        _verified_pairs(sig, cand).select("doc_a", "doc_b")
    )

    def relevant(offset: int) -> DataFrame:
        return persist_once(
            _injected_pairs(sig, offset)
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b")
        )

    rel_exact = relevant(EXACT_DUP_OFFSET)
    rel_near = relevant(NEAR_DUP_OFFSET)

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
        F.col(num).cast("double") / F.col(den).cast("double"),
        EVAL_DECIMALS,
    )
    return out.select(
        "n_relevant_exact", "n_relevant_near", "n_tp_exact", "n_tp_near",
        "n_candidates", "n_predicted",
        r("n_tp_exact", "n_relevant_exact").alias("recall_exact"),
        r("n_tp_near", "n_relevant_near").alias("recall_near"),
        r("n_predicted", "n_candidates").alias("cand_precision"),
    )


def _oph_eval_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.dedup_eval import (
        EVAL_DECIMALS,
    )

    def injected(name: str, offset: int) -> str:
        return f"""{name} AS (
  SELECT t.doc_a, t.doc_b
  FROM (
    SELECT doc_id - {offset} AS doc_a, doc_id AS doc_b, hashes AS hb
    FROM sigo
    WHERE doc_id >= {offset} AND doc_id < {offset} + {NEAR_DUP_OFFSET}
  ) t
  JOIN (SELECT doc_id AS doc_a, hashes AS ha FROM sigo) s USING (doc_a)
  WHERE {jaccard_duck('s.ha', 't.hb')} >= {JACCARD_THRESHOLD}
)"""

    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_oph_sig()},
buckets AS (
{_duck_oph_bands()}
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
  JOIN sigo sa ON c.doc_a = sa.doc_id
  JOIN sigo sb ON c.doc_b = sb.doc_id
  WHERE {jaccard_duck('sa.hashes', 'sb.hashes')} >= {JACCARD_THRESHOLD}
),
{injected('rel_exact', EXACT_DUP_OFFSET)},
{injected('rel_near', NEAR_DUP_OFFSET)},
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


register(QuerySpec("dedup_minhash_oph_eval", dedup_minhash_oph_eval,
                   _oph_eval_oracle(), tags=("LLM-DEDUP", "EVAL")))


# --- Arrow-lane signature twin ----------------------------------------------


def oph_signature_arrow(docs: DataFrame) -> DataFrame:
    """The OPH signature with the hash-min stage in the vectorized
    Arrow lane: the md5 shingle pass stays JVM-side (built-in, shared
    with every MinHash variant), then ONE ``mapInPandas`` kernel
    computes all K bins in a single ``np.minimum.at`` scatter and
    densifies with K vectorized rotation passes — the form
    ``tools/oph_curve.py`` measured ~K× faster than per-bin passes,
    and the one the paper's "one permutation" actually means.
    Output is BIT-IDENTICAL to :func:`oph_signature_of` (same integer
    arithmetic), so both implementations register against the SAME
    DuckDB oracle."""
    from pyspark.sql import types as T

    sets = docs.select(
        F.col("doc_id"),
        F.expr(
            f"array_distinct({shingle_hashes_spark(_SH_S)})"
        ).alias("hashes"),
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        sentinel = np.iinfo(np.int64).max
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    columns=["doc_id", "hashes"]
                    + [f"mh{j}" for j in range(K_BINS)]
                )
                continue
            arrs = [np.asarray(h, dtype=np.int64) for h in pdf["hashes"]]
            lens = np.array([len(a) for a in arrs])
            flat = (np.concatenate([a for a in arrs if len(a)])
                    if lens.sum() else np.empty(0, np.int64))
            doc_idx = np.repeat(np.arange(n), lens)
            p = (OPH_A * flat + OPH_B) % UHASH_P
            m = np.full(n * K_BINS, sentinel, dtype=np.int64)
            np.minimum.at(m, doc_idx * K_BINS + p % K_BINS, p // K_BINS)
            bins = m.reshape(n, K_BINS)
            res = bins.copy()
            need = bins == sentinel
            for t in range(1, K_BINS):
                src = np.roll(bins, -t, axis=1)     # column (j+t) % K
                ok = need & (src != sentinel)
                res[ok] = src[ok] + t * OPH_C
                need &= ~ok
            out = {"doc_id": pdf["doc_id"].values, "hashes": pdf["hashes"]}
            for j in range(K_BINS):
                col = pd.array(res[:, j], dtype="Int64")
                col[need[:, j]] = pd.NA        # shingle-less documents
                out[f"mh{j}"] = col
            yield pd.DataFrame(out)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("hashes", T.ArrayType(T.LongType()))]
        + [T.StructField(f"mh{j}", T.LongType())
           for j in range(K_BINS)]
    )
    return sets.mapInPandas(kernel, schema=schema)


def dedup_minhash_oph_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_minhash_oph`` with the Arrow-lane signature — registered
    against the IDENTICAL oracle, so the differential harness proves
    the two signature implementations (interpreted HOF vs vectorized
    numpy) bit-equal end to end."""
    from star_schema_etl_airflow_spark.functions.caching import (
        persist_once,
    )

    sig = persist_once(oph_signature_arrow(build_corpus(spark, sf_dir)))
    return _verified_pairs(sig, _candidates(sig))


register(QuerySpec("dedup_minhash_oph_arrow", dedup_minhash_oph_arrow,
                   DEDUP_MINHASH_OPH_ORACLE, tags=("LLM-DEDUP",)))
