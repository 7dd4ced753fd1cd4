"""KMV bottom-k corpus-overlap sketches (plans/kmv_overlap.py).

The sweep pins estimator determinism (oracle computes the same
estimates); these tests pin what the oracle cannot: the estimates'
ACCURACY against exact set arithmetic, the exact-collapse path when a
pair's union fits in the sketch, sketch mergeability (the property
that makes KMV incremental), and the scale-shape of the plan.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans import kmv_overlap as mod
from star_schema_etl_airflow_spark.sources.fixtures import load_table

SF_DIR = "/root/testdata/sf0.01"


def _exact_pairs(sf_dir: str) -> dict[tuple[str, str], tuple[int, int]]:
    """(inter, union) of exact distinct-shingle sets per source pair."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    rows = con.execute(f"""
        WITH sh AS (
          SELECT DISTINCT source, s
          FROM (SELECT source,
                       unnest({mod._SH_D}) AS s FROM documents)
        ),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT x.source, y.source, COALESCE(i.i, 0),
               x.n + y.n - COALESCE(i.i, 0)
        FROM sizes x
        JOIN sizes y ON x.source < y.source
        LEFT JOIN inter i ON i.sa = x.source AND i.sb = y.source
    """).fetchall()
    con.close()
    return {(a, b): (i, u) for a, b, i, u in rows}


def test_estimates_track_exact_overlap(spark):
    exact = _exact_pairs(SF_DIR)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in mod.kmv_source_overlap(spark, SF_DIR).collect()
    }
    assert set(got) == set(exact)
    for pair, r in got.items():
        i, u = exact[pair]
        j = i / u
        # binomial σ of the match count at sketch size K, + 1/K quantization
        sigma = math.sqrt(max(j * (1 - j), 1e-6) / mod.K) + 1.0 / mod.K
        assert r["jaccard_est"] == pytest.approx(j, abs=6 * sigma), pair
        # KMV distinct-union σ ≈ u/√(K−2)
        assert r["union_est"] == pytest.approx(
            u, abs=6 * u / math.sqrt(mod.K - 2)
        ), pair


def test_small_union_collapses_to_exact(spark):
    """A pair whose true distinct union fits in the sketch reports the
    EXACT union, intersection, and Jaccard (k_used < K marks it)."""
    docs = spark.createDataFrame(
        [
            ("a", "w1 w2 w3 w4 w5 w6"),
            ("b", "w4 w5 w6 w7 w8 w9"),
        ],
        "source string, text string",
    )
    sig = mod.kmv_sketches(spark, docs)
    # 4 distinct 3-gram shingles per doc, 1 shared ("w4 w5 w6")
    out = (
        sig.groupBy().count().collect()
    )
    assert out[0]["count"] == 8
    # run the full operator via a temp parquet fixture
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.toPandas().to_parquet(os.path.join(d, "documents.parquet"))
        r = mod.kmv_source_overlap(spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert row["k_used"] == 7 and row["k_used"] < mod.K
    assert row["matches"] == 1
    assert row["union_est"] == 7
    assert row["inter_est"] == 1
    assert row["jaccard_est"] == pytest.approx(1 / 7, abs=1e-9)


def test_sketches_merge(spark):
    """bottom-K(bottom-K(half1) ∪ bottom-K(half2)) == bottom-K(all):
    the union-mergeability that makes the sketch incremental across
    ingest days."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", "text"
    )
    h1 = docs.filter(F.col("doc_id") % 2 == 0).drop("doc_id")
    h2 = docs.filter(F.col("doc_id") % 2 == 1).drop("doc_id")
    merged_in = mod.kmv_sketches(spark, h1).unionByName(
        mod.kmv_sketches(spark, h2)
    ).distinct()
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    merged = (
        merged_in.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= mod.K)
        .select("source", "h")
    )
    direct = mod.kmv_sketches(spark, docs.drop("doc_id"))
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


def test_incremental_merge_equals_at_rest_operator(spark):
    """The ingest path (old ∪ delta sketches → re-bottom-K → estimate)
    returns byte-identical rows to the at-rest operator — the Spark-side
    half of the mergeability theorem (the oracle pins the cross-engine
    half by reusing the full-rebuild SQL)."""
    sf = "/root/testdata/sf0.001"
    a = mod.kmv_source_overlap(spark, sf)
    b = mod.kmv_incremental_merge(spark, sf)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_sketch_build_plan_shape(spark):
    """The corpus-sized stage carries a map-side partial
    WindowGroupLimit (each partition forwards ≤K rows per source) and
    the operator plans no nested-loop or cartesian join."""
    df = mod.kmv_source_overlap(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
    assert "CartesianProduct" not in plan
    # the sketch feeding the four downstream branches must come from the
    # cache, so the corpus scan runs once
    assert "InMemoryTableScan" in plan
    # the source_a < source_b pair expansion over the tiny distinct-source
    # relation is the one permitted nested loop (sketch-sized, not
    # corpus-sized; it appears twice because the union duplicates the
    # pair subtree); the sketch join itself must be an equi hash join
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan


def test_pair_expansion_census_and_bound(spark, caplog):
    """The Θ(S²·K) pair stage is censused per call (no-silent-caps) and
    raises past the deployment bound; the guard itself is lossless —
    output with a huge bound equals output with the default."""
    import logging

    docs = spark.createDataFrame(
        [(s, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}")
         for s in ("a", "b", "c") for i in range(3)],
        "source string, text string",
    )
    sig = mod.kmv_sketches(spark, docs).cache()
    with caplog.at_level(logging.INFO, logger=mod.__name__):
        base = sorted(map(tuple, mod.pairwise_overlap(sig).collect()))
    assert any("kmv pairwise census: 3 sources -> 3 pairs" in r.message
               for r in caplog.records)
    # lossless: the bound only observes, never alters the estimates
    loose = sorted(
        map(tuple, mod.pairwise_overlap(sig, max_pair_rows=10**18).collect())
    )
    assert base == loose
    # loud past the bound: 3 pairs * 2K = 768 expanded rows > 10
    with pytest.raises(ValueError, match="exceeds the deployment bound"):
        mod.pairwise_overlap(sig, max_pair_rows=10)
    sig.unpersist()


def test_source_cardinality_tracks_exact_distinct(spark):
    """û = (K−1)/U(K) lands within the bottom-K estimator's error band
    (σ ≈ 1/√K ≈ 8.8% at K=128; pinned at 3σ) on the real fixture, and
    collapses to the exact count whenever k_used < K."""
    import duckdb

    from star_schema_etl_airflow_spark.functions.text import (
        md5_long_duck,
        shingles_duck,
        tokens_duck,
    )
    from star_schema_etl_airflow_spark.plans.kmv_overlap import (
        K,
        kmv_source_cardinality,
    )

    sf = "/root/testdata/sf0.01"
    truth = dict(duckdb.sql(f"""
        SELECT source, COUNT(DISTINCT {md5_long_duck('s')}) FROM (
          SELECT source, unnest({shingles_duck(tokens_duck('text'))}) AS s
          FROM '{sf}/documents.parquet'
        ) GROUP BY source
    """).fetchall())
    rows = kmv_source_cardinality(spark, sf).collect()
    assert {r.source for r in rows} == set(truth)
    for r in rows:
        if r.is_exact:
            assert r.k_used < K and r.distinct_est == truth[r.source]
        else:
            rel = abs(r.distinct_est - truth[r.source]) / truth[r.source]
            assert rel <= 3 / K ** 0.5, (r.source, r.distinct_est,
                                         truth[r.source], rel)
