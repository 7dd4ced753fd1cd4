"""Retrieval-eval query (plans/retrieval_eval.py).

The sweep pins cross-engine value equality; these tests pin the metric
semantics: the injected discount literals against the textbook
formula, metric range invariants, and the full nDCG/recall wiring
against an independent Python recomputation from the engine's own
ranked lists and relevance set.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans import retrieval_eval as mod
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_discount_literals_match_textbook_formula():
    for r in range(1, mod.CUTOFF + 1):
        assert mod.DISCOUNTS[r] == round(1.0 / math.log2(r + 1), 9)
    # ideal-DCG prefix sums are cumulative and monotone
    acc = 0.0
    for n in range(1, mod.CUTOFF + 1):
        acc = round(acc + mod.DISCOUNTS[n], 9)
        assert mod._IDCG[n] == acc
    assert mod._IDCG[0] == 0.0


def test_metric_ranges_and_coverage(spark):
    rows = mod.retrieval_eval(spark, SF_DIR).collect()
    assert {r["ranker"] for r in rows} == {"bm25", "ql", "rrf"}
    for r in rows:
        assert 0.0 <= r["ndcg_at_10"] <= 1.0, r
        assert 0.0 <= r["recall_at_10"] <= 1.0, r
        assert r["hits_at_10"] <= min(mod.CUTOFF, r["n_relevant"]), r


def test_metrics_match_python_recomputation(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rel = {
        (r["query_id"], r["doc_id"])
        for r in mod._relevance(spark, docs).collect()
    }
    n_rel: dict[int, int] = {}
    for q, _ in rel:
        n_rel[q] = n_rel.get(q, 0) + 1

    lists = mod._ranked_lists(spark, docs).collect() + [
        r
        for r in (
            mod.retrieval_rrf(spark, SF_DIR)
            .select(F.lit("rrf").alias("ranker"), "query_id", "doc_id", "rank")
            .collect()
        )
    ]
    expect: dict[tuple[str, int], dict] = {}
    for r in lists:
        k = (r["ranker"], r["query_id"])
        e = expect.setdefault(k, {"dcg": 0.0, "hits": 0})
        if (r["query_id"], r["doc_id"]) in rel:
            e["dcg"] = round(e["dcg"] + mod.DISCOUNTS[r["rank"]], 9)
            e["hits"] += 1

    got = {
        (r["ranker"], r["query_id"]): r
        for r in mod.retrieval_eval(spark, SF_DIR).collect()
    }
    assert set(got) == {k for k in expect if n_rel.get(k[1], 0) > 0}
    for k, r in got.items():
        e = expect[k]
        n = n_rel[k[1]]
        assert r["hits_at_10"] == e["hits"], k
        assert r["n_relevant"] == n, k
        assert r["recall_at_10"] == pytest.approx(
            round(e["hits"] / n, 9), abs=1e-12
        ), k
        idcg = mod._IDCG[min(n, mod.CUTOFF)]
        assert r["ndcg_at_10"] == pytest.approx(
            round(e["dcg"] / idcg, 9), abs=1e-9
        ), k
