"""SQ8 shortlist + exact re-rank: recall against the exact scan, and
the determinism of the code-domain scoring (exact integer dots)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.llm_quantize import (
    SQ_TOP_K,
    embed_sq8_rerank,
)
from star_schema_etl_airflow_spark.plans.llm_similarity import (
    embed_topk_cosine,
)

SF_DIR = "/root/testdata/sf0.01"


def test_sq8_rerank_recall_vs_exact(spark):
    """Int8 codes preserve direction almost losslessly per vector
    (max per-element error <= scale/2), so a 100-wide SQ8 shortlist
    re-ranked exactly should recover nearly all of the true top-10 —
    far stronger than the JL path's 0.7 floor on isotropic data."""
    exact = {
        (r.query_id, r.cand_id)
        for r in embed_topk_cosine(spark, SF_DIR).collect()
    }
    sq8 = {
        (r.query_id, r.cand_id)
        for r in embed_sq8_rerank(spark, SF_DIR).collect()
    }
    recall = len(exact & sq8) / len(exact)
    assert recall >= 0.9, f"SQ8 recall@{SQ_TOP_K} = {recall:.2f}"


def test_sq8_rerank_exact_cosines_and_shape(spark):
    """Survivors carry the EXACT cosine (identical to the brute-force
    scan's value for the same pair), ranks are 1..k per query."""
    exact = {
        (r.query_id, r.cand_id): r.cosine
        for r in embed_topk_cosine(spark, SF_DIR).collect()
    }
    rows = embed_sq8_rerank(spark, SF_DIR).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
        if (r.query_id, r.cand_id) in exact:
            assert r.cosine == exact[(r.query_id, r.cand_id)]
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= SQ_TOP_K


def test_sq8_shortlist_is_deterministic(spark):
    """Two independent builds of the query return identical pair sets
    (integer code-domain scoring has no float accumulation ambiguity)."""
    a = {(r.query_id, r.cand_id, r.rank)
         for r in embed_sq8_rerank(spark, SF_DIR).collect()}
    b = {(r.query_id, r.cand_id, r.rank)
         for r in embed_sq8_rerank(spark, SF_DIR).collect()}
    assert a == b


def test_sq8_zero_norm_vectors_never_enter_the_shortlist(spark, tmp_path):
    """An all-zero embedding quantizes to qnorm = 0, making the approx
    cosine NaN — and Spark orders NaN above all doubles DESC, so
    without the qnorm > 0 guard such a vector would occupy a shortlist
    slot for EVERY query.  Pin: zero vectors are excluded, output has
    no NaN, and every query still gets its top-k from real candidates."""
    import numpy as np

    from star_schema_etl_airflow_spark.plans.llm_similarity import (
        EMB_DIM,
        N_QUERIES,
    )

    rng = np.random.default_rng(13)
    n = N_QUERIES + 40
    rows = []
    for i in range(n):
        if i in (N_QUERIES, N_QUERIES + 7):  # two zero-vector candidates
            v = [0.0] * EMB_DIM
        else:
            v = [float(x) for x in rng.standard_normal(EMB_DIM)]
        rows.append((i, v, 0))
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))

    out = embed_sq8_rerank(spark, str(tmp_path)).collect()
    zero_ids = {N_QUERIES, N_QUERIES + 7}
    assert all(r.cand_id not in zero_ids for r in out)
    assert all(not math.isnan(r.cosine) for r in out)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert len(per_q) == N_QUERIES
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, SQ_TOP_K + 1))
