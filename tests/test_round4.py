"""Invariant tests for the round-4 operators: line-level dedup,
incremental dedup, SemDeDup, Naive Bayes classification, idf-weighted
sparse cosine, and triangle counting.  (Exact-value parity with the
DuckDB oracles is covered by the differential harness; these pin the
semantic properties that a hash match alone would not explain.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_lines_strips_boilerplate_keeps_content(spark):
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        FOOTER_LINE,
        HEADER_LINE,
        dedup_lines,
    )

    out = dedup_lines(spark, SF_DIR).cache()
    rows = out.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count()
    for r in rows:
        assert HEADER_LINE not in r["clean_text"]
        assert FOOTER_LINE not in r["clean_text"]
        # header always injected; footer on even doc_ids — both removed
        expected_removed = 1 + (1 if r["doc_id"] % 2 == 0 else 0)
        assert r["n_removed"] == expected_removed
        assert len(r["clean_text"]) > 0
    out.unpersist()


def test_dedup_incremental_drops_recrawls_keeps_new(spark):
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        BATCH_INTERNAL_DUP_OFFSET,
        BATCH_NEW_OFFSET,
        BATCH_RECRAWL_OFFSET,
        dedup_incremental,
    )

    out = dedup_incremental(spark, SF_DIR).collect()
    ids = {r["doc_id"] for r in out}
    # every recrawled exact copy is eliminated by the corpus anti-join
    assert not any(
        BATCH_RECRAWL_OFFSET <= i < BATCH_NEW_OFFSET for i in ids
    )
    # new content survives, canonicalized to the lowest batch id (+4M,
    # never its +5M internal duplicate)
    assert any(BATCH_NEW_OFFSET <= i < BATCH_INTERNAL_DUP_OFFSET for i in ids)
    assert not any(i >= BATCH_INTERNAL_DUP_OFFSET for i in ids)
    # internally-duplicated hashes report both batch copies
    dup_rows = [r for r in out if r["n_batch_copies"] == 2]
    assert len(dup_rows) > 0


def test_semdedup_drops_only_injected_neighbors(spark):
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        SEM_DUP_OFFSET,
        semdedup,
    )

    rows = semdedup(spark, SF_DIR).collect()
    originals = [r for r in rows if r["vec_id"] < SEM_DUP_OFFSET]
    dups = [r for r in rows if r["vec_id"] >= SEM_DUP_OFFSET]
    # base vectors are near-orthogonal → no original is ever dropped
    assert all(r["is_kept"] for r in originals)
    # the perturbed twins are cosine≈0.998 to their originals; any that
    # land in the original's cluster are dropped — expect most to be
    assert len(dups) > 0
    dropped = [r for r in dups if not r["is_kept"]]
    assert len(dropped) >= len(dups) * 0.8


def test_nb_classify_scores_every_doc(spark):
    from star_schema_etl_airflow_spark.plans.text_classify import nb_classify

    out = nb_classify(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert len(out) == docs.count()
    assert all(r["predicted_lang"] in langs for r in out)
    # log-probabilities: strictly negative, finite
    assert all(r["score"] < 0 for r in out)


def test_tfidf_pairs_find_exact_duplicates(spark):
    from star_schema_etl_airflow_spark.plans.llm_dedup import EXACT_DUP_OFFSET
    from star_schema_etl_airflow_spark.plans.text_classify import (
        tfidf_topk_pairs,
    )

    rows = tfidf_topk_pairs(spark, SF_DIR).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine_sim"] for r in rows}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact_ids = [
        r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 0).collect()
    ]
    assert exact_ids
    for i in exact_ids:
        assert pairs.get((i, i + EXACT_DUP_OFFSET)) == pytest.approx(1.0)


def test_triangles_consistent_with_edge_count(spark):
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        graph_triangles,
    )

    rows = graph_triangles(spark, SF_DIR).collect()
    total_corner_credits = sum(r["n_triangles"] for r in rows)
    # every triangle credits exactly 3 corners
    assert total_corner_credits % 3 == 0
    assert total_corner_credits > 0


def test_decontam_spans_are_maximal_and_cover_planted_leaks(spark):
    from star_schema_etl_airflow_spark.operators.decontaminate import (
        DECONTAM_NGRAM,
    )
    from star_schema_etl_airflow_spark.plans.llm_decontam import (
        decontam_spans,
    )

    rows = decontam_spans(spark, SF_DIR).collect()
    assert rows
    by_pair = {}
    for r in rows:
        assert r["span_tokens"] == r["span_end"] - r["span_start"]
        assert r["span_tokens"] >= DECONTAM_NGRAM
        by_pair.setdefault((r["train_id"], r["eval_id"]), []).append(
            (r["span_start"], r["span_end"])
        )
    # maximality: spans of one pair are disjoint with a real gap (else
    # the islands merge would have fused them)
    for spans in by_pair.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1


def test_k_anonymity_partitions_every_customer(spark):
    from star_schema_etl_airflow_spark.plans.governance_queries import (
        K_ANON,
        k_anonymity_audit,
    )

    rows = k_anonymity_audit(spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    assert sum(r["group_size"] for r in rows) == cust.count()
    for r in rows:
        assert r["is_k_anonymous"] == (r["group_size"] >= K_ANON)
        assert 1 <= r["l_diversity"] <= r["group_size"]


def test_histogram_covers_every_row(spark):
    from star_schema_etl_airflow_spark.plans.governance_queries import (
        HIST_BINS,
        hist_extendedprice,
    )

    rows = hist_extendedprice(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r["n"] for r in rows) == li.count()
    assert all(0 <= r["bucket"] <= HIST_BINS + 1 for r in rows)


def test_basket_pairs_canonical_and_supported(spark):
    from star_schema_etl_airflow_spark.plans.governance_queries import (
        MIN_SUPPORT,
        basket_pairs,
    )

    rows = basket_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["support"] >= MIN_SUPPORT


def test_tfidf_scaled_long_overflow_headroom():
    """The ×1e6 idf scale must leave generous shared-term headroom under
    a 2^62 accumulator cap: >10⁴ terms at a 1e9-doc corpus, >5×10³ even
    at 1e12 docs."""
    import math

    from star_schema_etl_airflow_spark.plans.text_classify import IDF_SCALE

    at_1e9 = (2 ** 62) / ((math.log(1e9) * IDF_SCALE) ** 2)
    at_1e12 = (2 ** 62) / ((math.log(1e12) * IDF_SCALE) ** 2)
    assert at_1e9 > 10_000
    assert at_1e12 > 5_000


def test_curation_v2_rollup_is_consistent(spark):
    from star_schema_etl_airflow_spark.plans.llm_pipeline2 import (
        GATE_MIN_TOKENS,
        curation_pipeline_v2,
    )

    rows = {r["split"]: r for r in curation_pipeline_v2(spark, SF_DIR).collect()}
    assert set(rows) <= {"train", "val"}
    assert "train" in rows
    for r in rows.values():
        assert r["n_docs"] > 0
        # every surviving doc passed the token gate
        assert r["total_tokens"] >= GATE_MIN_TOKENS * r["n_docs"]
        assert r["min_doc_id"] <= r["max_doc_id"]


def test_semdedup_eval_prices_the_cluster_scoping_trade(spark):
    """r14 verdict task 2: the recall eval-as-query.  At fixture scale
    every injected near-dup pair (original, +offset perturbed copy)
    lands in one k-means cell, so recall vs the LSH-bucketed truth is
    1.0; at sf0.1 k-means separates a few truth pairs (the documented
    SemDeDup cross-cluster miss).  Pin the invariants, not the exact
    sf0.1 recall (it re-measures in LOCAL_CORRECTNESS.md)."""
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import semdedup_eval

    row = semdedup_eval(spark, SF_DIR).collect()[0]
    assert row.n_truth > 0
    assert row.n_hit <= min(row.n_truth, row.n_caught)
    assert row.n_extra == row.n_caught - row.n_hit
    assert row.recall_semantic == 1.0          # sf0.001: no split pairs
    # every injected pair is caught: 100 originals % 5 == 0 -> 100 dups
    assert row.n_caught >= row.n_hit >= 92


def test_semdedup_incremental_probe_equals_full_recompute_subset(spark):
    """The delta probe against frozen clusters must find EXACTLY the
    (delta x at-rest) pairs a full cluster-scoped run over the union
    would find — same codebook => same cells, so the equality is
    structural; this pins it end to end.  Plus the delta semantics:
    every recrawl near-copy matches its source, no fresh vector
    matches anything."""
    import pyspark.sql.functions as F

    from star_schema_etl_airflow_spark.operators.kmeans import (
        assign_clusters,
        kmeans_fit,
    )
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        K,
        N_ITER,
    )
    from star_schema_etl_airflow_spark.plans.llm_dedup2 import (
        _EMB_DIM,
        _PERTURB2_S,
        _PERTURB_S,
        SEM_COS_DECIMALS,
        SEM_COS_THRESHOLD,
        SEM_DUP_OFFSET,
        SEM_FRESH_OFFSET,
        SEM_RECRAWL_OFFSET,
        semdedup_incremental,
    )
    from star_schema_etl_airflow_spark.functions.vecexpr import unrolled_dot

    got = {
        (r.delta_id, r.corpus_id)
        for r in semdedup_incremental(spark, SF_DIR).collect()
    }
    # semantics: every recrawl matches its own source...
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    recrawl_src = {
        r.vec_id for r in emb.filter(F.col("vec_id") % 7 == 0).collect()
    }
    for src in recrawl_src:
        assert (src + SEM_RECRAWL_OFFSET, src) in got
    # ...and no fresh vector matches anything
    assert not any(d >= SEM_FRESH_OFFSET for d, _c in got)

    # full recompute over (at-rest UNION delta), same codebook, cross
    # pairs only — must equal the probe exactly
    base = emb.select("vec_id", "embedding")
    _, codebook = kmeans_fit(base, K, N_ITER, dim=_EMB_DIM)
    at_rest = base.unionByName(
        base.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + SEM_DUP_OFFSET).alias("vec_id"),
            F.expr(_PERTURB_S).alias("embedding"),
        )
    )
    delta = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + SEM_RECRAWL_OFFSET).alias("vec_id"),
        F.expr(_PERTURB2_S).alias("embedding"),
    ).unionByName(
        base.filter(F.col("vec_id") % 11 == 0).select(
            (F.col("vec_id") + SEM_FRESH_OFFSET).alias("vec_id"),
            F.expr("reverse(embedding)").alias("embedding"),
        )
    )
    union = at_rest.unionByName(delta)
    norm = f"sqrt({unrolled_dot('embedding', 'embedding', _EMB_DIM)})"
    m = union.join(
        assign_clusters(union, codebook, dim=_EMB_DIM), "vec_id"
    ).withColumn("__norm", F.expr(norm))
    a, b = m.alias("a"), m.alias("b")
    dot = unrolled_dot("a.embedding", "b.embedding", _EMB_DIM)
    cos = f"round(({dot}) / (a.__norm * b.__norm), {SEM_COS_DECIMALS})"
    delta_ids = {r.vec_id for r in delta.select("vec_id").collect()}
    full = {
        (r.x, r.y)
        for r in a.join(b, F.col("a.cluster") == F.col("b.cluster"))
        .filter(F.expr(cos) >= SEM_COS_THRESHOLD)
        .select(F.col("a.vec_id").alias("x"), F.col("b.vec_id").alias("y"))
        .collect()
        if r.x in delta_ids and r.y not in delta_ids
    }
    assert got == full
