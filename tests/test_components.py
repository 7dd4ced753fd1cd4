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


# --- large-star / small-star (Kiveris et al.) -------------------------------

from star_schema_etl_airflow_spark.operators.components import (  # noqa: E402
    big_star_components,
)


def _run_star(spark, edges, nodes=None, stats=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long") if nodes else None
    got = big_star_components(e, nodes=n, stats=stats)
    return {(r.node, r.component) for r in got.collect()}


def test_bigstar_chain_triangle_and_singleton(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    got = _run_star(spark, edges, nodes=[1, 2, 3, 4, 10, 11, 12, 99])
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (99, 99),
    }


def test_bigstar_equals_simple_form_on_random_graphs(spark):
    """Result equality vs min-label propagation on seeded random graphs
    (the two algorithms share nothing but the contract)."""
    import random

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        nodes = list(range(n))
        assert _run_star(spark, edges, nodes=nodes) == _run(
            spark, edges, nodes=nodes
        )


def test_bigstar_long_chain_in_logarithmic_rounds(spark):
    """The adversarial case the simple form loses: a 64-node chain.
    Min-label propagation needs Theta(diameter) rounds; large/small-star
    must finish in O(log^2 n) — single digits here, and the labels must
    still agree."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    simple_stats, star_stats = {}, {}
    e = spark.createDataFrame(edges, "src long, dst long")
    simple = connected_components(e, stats=simple_stats, max_iter=100)
    star = big_star_components(e, stats=star_stats)
    assert {(r.node, r.component) for r in simple.collect()} == {
        (i, 0) for i in range(n)
    }
    assert {(r.node, r.component) for r in star.collect()} == {
        (i, 0) for i in range(n)
    }
    assert simple_stats["rounds"] >= n // 2          # Theta(diameter)
    assert star_stats["rounds"] <= 10                # O(log^2 n)


def test_bigstar_reversed_id_chain(spark):
    """Chain with DESCENDING ids (min at the far end) — the worst
    orientation for star contraction's min-pulling."""
    n = 33
    edges = [(i + 1, i) for i in range(n - 1)]
    got = _run_star(spark, edges)
    assert got == {(i, 0) for i in range(n)}


def test_bigstar_empty_edges_all_singletons(spark):
    e = spark.createDataFrame([], "src long, dst long")
    n = spark.createDataFrame([(3,), (8,)], "node long")
    got = big_star_components(e, nodes=n)
    assert {(r.node, r.component) for r in got.collect()} == {(3, 3), (8, 8)}
