"""PageRank operator invariants on known graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.pagerank import pagerank


def test_two_node_cycle_is_symmetric(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank(edges, n_iter=10).collect()}
    assert abs(ranks["a"] - 0.5) < 1e-9
    assert abs(ranks["b"] - 0.5) < 1e-9


def test_sink_attracts_mass_and_totals_bounded(spark):
    # star: everyone links to hub; hub is dangling (teleport-only decay)
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub")], ["src", "dst"]
    )
    rows = pagerank(edges, n_iter=5).collect()
    ranks = {r.node: r.rank for r in rows}
    assert ranks["hub"] > ranks["a"] == ranks["b"] == ranks["c"]
    total = sum(ranks.values())
    n, d = len(ranks), 0.85
    assert (1 - d) <= total <= 1.0 + 1e-9  # dangling mass decays, never grows
    assert all(r >= (1 - d) / n - 1e-12 for r in ranks.values())


def test_weighted_edges_shift_rank(spark):
    # a splits 3:1 between b and c -> b outranks c
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        ["src", "dst", "w"],
    )
    ranks = {r.node: r.rank for r in pagerank(edges, weight="w", n_iter=10).collect()}
    assert ranks["b"] > ranks["c"]
