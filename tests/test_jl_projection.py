"""JL random projection: distance preservation (recall vs the exact
top-k), integer-exactness determinism, and the plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.jl_projection import (
    _SIGNS,
    JL_K,
    JL_TOP_K,
    embed_jl_topk,
    project_embeddings,
)
from star_schema_etl_airflow_spark.plans.llm_similarity import (
    EMB_DIM,
    N_QUERIES,
    embed_topk_cosine,
)

SF_DIR = "/root/testdata/sf0.01"


def test_projection_matches_numpy_fixed_point(spark):
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    rows = emb.select("vec_id", "embedding").collect()
    got = {r.vec_id: r for r in project_embeddings(emb).collect()}
    S = np.array(_SIGNS, dtype=np.int64)
    for r in rows:
        ei = np.floor(np.array(r.embedding, dtype=np.float64)
                      * 65536).astype(np.int64)
        want = S @ ei
        have = np.array([got[r.vec_id][f"p{k}"] for k in range(JL_K)])
        assert np.array_equal(want, have)


def test_signs_are_balanced_and_deterministic():
    S = np.array(_SIGNS)
    assert S.shape == (JL_K, EMB_DIM)
    assert set(np.unique(S)) == {-1, 1}
    # md5-derived: roughly balanced per projected component
    assert (np.abs(S.sum(axis=1)) <= EMB_DIM // 2).all()


def test_jl_topk_recall_vs_exact(spark):
    """Pure projected-space top-10 on ISOTROPIC RANDOM vectors (the
    adversarial case: neighbor margins are tiny) still beats chance by
    an order of magnitude: recall@10 >= 0.15 (chance ~10/n_cands ~=
    0.02 at sf0.01; measured 0.25)."""
    exact = {
        (r.query_id, r.cand_id)
        for r in embed_topk_cosine(spark, SF_DIR).collect()
    }
    jl = {
        (r.query_id, r.cand_id)
        for r in embed_jl_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & jl) / len(exact)
    assert recall >= 0.15, f"JL recall@{JL_TOP_K} = {recall:.2f}"


def test_jl_rerank_recall_vs_exact(spark):
    """The production two-stage shape (integer shortlist -> exact
    cosine re-rank) recovers most true neighbors even on isotropic
    vectors: recall@10 >= 0.7 (measured 0.80 at sf0.01)."""
    from star_schema_etl_airflow_spark.plans.jl_projection import (
        embed_jl_rerank,
    )

    exact = {
        (r.query_id, r.cand_id)
        for r in embed_topk_cosine(spark, SF_DIR).collect()
    }
    two_stage = {
        (r.query_id, r.cand_id)
        for r in embed_jl_rerank(spark, SF_DIR).collect()
    }
    recall = len(exact & two_stage) / len(exact)
    assert recall >= 0.7, f"rerank recall@{JL_TOP_K} = {recall:.2f}"


def test_jl_topk_plan_broadcasts_queries_with_partial_limit(spark):
    plan = embed_jl_topk(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert any(
        "WindowGroupLimit" in line and "Partial" in line
        for line in plan.splitlines()
    ), plan


def test_projection_deterministic_under_repartition(spark):
    from star_schema_etl_airflow_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a = sorted(map(tuple, project_embeddings(emb).collect()))
    b = sorted(map(tuple, project_embeddings(emb.repartition(13)).collect()))
    assert a == b
