"""Semantics pins for the incremental retrieval probe
(plans/retrieval_incremental.py): the oracle sweep proves engine
equality; these pin what the probe MEANS — frozen-statistics scoring,
the k-deep-list sufficiency argument, and the delta-only plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans import retrieval_incremental as mod
from star_schema_etl_airflow_spark.plans.bm25 import (
    TOP_K,
    bm25_query_index,
    bm25_score_with_index,
)
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_output_shape_and_provenance(spark):
    rows = mod.retrieval_incremental(spark, SF_DIR).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert (r.doc_id % 2 == 1) == r.is_delta
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # the fixture delta is half the corpus: both sides should
        # populate the merged lists (a probe that only ever returns
        # at-rest rows — or only delta rows — is broken)
        assert any(r.is_delta for r in rs), q
        assert any(not r.is_delta for r in rs), q


def test_merge_equals_frozen_stats_full_scoring(spark):
    """The k-deep-list sufficiency claim, checked directly: merging the
    at-rest TOP_K with the delta scores equals ranking ALL docs (at-rest
    and delta alike) under the SAME frozen at-rest statistics.  (This is
    the exactness property; the drift from fully-rebuilt statistics is
    the documented deferred-refresh trade, not an error.)"""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    at_rest = docs.filter(F.col("doc_id") % 2 == 0)
    qidf = bm25_query_index(spark, at_rest).cache()
    full = bm25_score_with_index(docs, qidf)  # every doc, frozen stats
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, float(r.score))
        for r in full.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id",
                F.col("score").cast("double").alias("score"))
        .collect()
    )
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in mod.retrieval_incremental(spark, SF_DIR).collect()
    )
    assert got == want
    qidf.unpersist()


def test_probe_plan_tokenizes_only_the_delta(spark):
    """With the at-rest artifacts materialized (the production shape the
    curve tool emulates), the probe plan must not scan the corpus: the
    only file scan is the delta's."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    at_rest = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    # materialize the at-rest artifacts as standalone relations
    qidf = spark.createDataFrame(
        bm25_query_index(spark, at_rest).collect(),
        "query_id int, term string, w long, n_docs long, sum_dl long",
    )
    at_topk = spark.createDataFrame(
        mod._topk(bm25_score_with_index(at_rest, qidf))
        .select("query_id", "doc_id", "score").collect(),
        "query_id int, doc_id long, score decimal(38,9)",
    )
    probe = mod.bm25_delta_probe(delta, qidf, at_topk)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # every file scan is delta-side (pushed %2=1 filter); ZERO at-rest
    # scans (%2=0) anywhere in the plan.  (Scan COUNT is session-cache-
    # state dependent — tf/dl share persisted entries with other
    # queries — so the pin is on the filter, not the count.)
    assert plan.count("FileScan parquet") >= 1
    assert "% 2) = 1" in plan and "% 2) = 0" not in plan
    assert "CartesianProduct" not in plan
    # the frozen index joins broadcast — the delta is never shuffled
    # against a corpus-sized side
    assert "BroadcastHashJoin" in plan
