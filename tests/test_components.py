"""Connected-components operator: crafted graphs with known components."""

from __future__ import annotations

from star_schema_etl_airflow_spark.operators.components import (
    connected_components,
)


def _run(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long") if nodes else None
    got = connected_components(e, nodes=n)
    return {(r.node, r.component) for r in got.collect()}


def test_chain_triangle_and_singleton(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # triangle 10-11-12, isolated node 99
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    got = _run(spark, edges, nodes=[1, 2, 3, 4, 10, 11, 12, 99])
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (99, 99),
    }


def test_long_chain_converges(spark):
    n = 20
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges)
    assert got == {(i, 0) for i in range(n + 1)}


def test_edge_only_vertex_set(spark):
    got = _run(spark, [(5, 7), (8, 9)])
    assert got == {(5, 5), (7, 5), (8, 8), (9, 8)}
