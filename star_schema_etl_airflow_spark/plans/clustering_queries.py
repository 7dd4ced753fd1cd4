"""Oracle-checked k-means clustering over the ``embeddings`` fixture.

Two full Lloyd iterations (assign → update → assign → update) with the
determinism contract of ``operators/kmeans.py``; the DuckDB oracle unrolls
the same two iterations as generated CTEs, so the differential check
covers an *iterative ML algorithm* end-to-end: init, distance fold,
tie-breaking, exact-decimal centroid means, and re-assignment.

``KMEANS_CTES`` ends with ``a2`` (assignment after the 2nd iteration) and
``c2`` (the trained codebook) — the trained-IVF oracle
(plans/llm_similarity.py) composes on top of ``c2``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.functions.caching import persist_once

K = 8
N_ITER = 2
EMB_DIM = 64


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign, _ = kmeans_fit(emb, K, N_ITER, dim=EMB_DIM)
    return assign


def _dist_d(c: str) -> str:
    diff = f"(CAST(v.embedding[i] AS DOUBLE) - CAST({c}.embedding[i] AS DOUBLE))"
    return (
        f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> {diff} * {diff}))"
    )


def _assign_cte(name: str, cent_table: str) -> str:
    return f"""{name} AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id ORDER BY {_dist_d('c')}, c.cluster) AS rn
    FROM embeddings v CROSS JOIN {cent_table} c
  ) WHERE rn = 1
)"""


def _update_ctes(i: int, assign_name: str) -> str:
    return f"""ex{i} AS (
  SELECT a.cluster, d.i AS dim, CAST(v.embedding[d.i] AS DOUBLE) AS val
  FROM embeddings v
  JOIN {assign_name} a USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS i) d
),
m{i} AS (
  SELECT cluster, dim,
         CAST(SUM(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m
  FROM ex{i} GROUP BY 1, 2
),
c{i} AS (
  SELECT cluster, list(m ORDER BY dim) AS embedding FROM m{i} GROUP BY cluster
)"""


# CTE chain shared with the trained-IVF oracle (plans/llm_similarity.py):
# init → (assign → exploded dims → decimal-exact means → centroids) × 2.
def kmeans_ctes(limit_expr: str | int = K) -> str:
    """The Lloyd chain with a parameterizable init size: ``limit_expr``
    may be an int (the fixed ``K``) or a SQL scalar expression — the
    SemDeDup oracles pass a corpus-size-derived count so cluster count
    scales with the corpus (K ∝ n), matching the Spark side's
    ``sem_k``.  ``rn <= expr`` over the vec_id total order is exactly
    ``ORDER BY vec_id LIMIT k`` (vec_id is unique)."""
    return f"""init AS (
  SELECT vec_id AS cluster, embedding FROM (
    SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
    FROM embeddings
  ) WHERE rn <= ({limit_expr})
),
{_assign_cte('a1', 'init')},
{_update_ctes(1, 'a1')},
{_assign_cte('a2', 'c1')},
{_update_ctes(2, 'a2')}"""


KMEANS_CTES = kmeans_ctes()

KMEANS_ASSIGN_ORACLE = f"""
WITH {KMEANS_CTES}
SELECT vec_id, cluster FROM a2
"""

register(QuerySpec("kmeans_assign", kmeans_assign, KMEANS_ASSIGN_ORACLE,
                   headline=True, tags=("KMEANS",)))


# --- PageRank over the nation trade graph ----------------------------------

PR_ITER = 5
PR_DAMP = 0.85


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (``operators/pagerank.py``) over the nation
    trade graph: an edge customer-nation → supplier-nation per lineitem,
    weighted by line count.  5 damped power iterations, per-round
    rounding; the oracle unrolls the identical recurrence as CTEs."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.operators.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))
    sn = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    ranks = pagerank(edges, weight="w", n_iter=PR_ITER, damping=PR_DAMP)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def _pr_iter_cte(k: int) -> str:
    return f"""it{k} AS (
  SELECT n.node,
         round({1.0 - PR_DAMP} / (SELECT cnt FROM nn)
               + {PR_DAMP} * coalesce(s.mass, 0.0), 12) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.rank * e.share) AS mass
    FROM norm e JOIN it{k - 1} p ON e.src = p.node GROUP BY 1) s
  ON n.node = s.node
)"""


PAGERANK_ORACLE = f"""
WITH edges AS (
  SELECT n1.n_name AS src, n2.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  GROUP BY 1, 2
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT COUNT(*) AS cnt FROM nodes
), norm AS (
  SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS share FROM edges
), it0 AS (
  SELECT node, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes
), {", ".join(_pr_iter_cte(k) for k in range(1, PR_ITER + 1))}
SELECT node, round(rank, 9) AS rank FROM it{PR_ITER}
"""

register(QuerySpec("pagerank_trade_graph", pagerank_trade_graph,
                   PAGERANK_ORACLE, tags=("PAGERANK", "GRAPH")))


# --- triangle counting ------------------------------------------------------


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the undirected nation trade graph
    (same edge derivation as ``pagerank_trade_graph``).

    The classic shape: canonicalize each edge to (lo, hi), join edges to
    edges to enumerate wedges, close each wedge with a third edge probe,
    then credit each triangle to its three corners.  Scale note: at web
    scale the canonical order is by *degree* (low-degree endpoint first)
    so wedge fan-out is bounded by the small endpoint's degree
    (Suri/Vassilvitskii); on the 25-node nation graph lexicographic
    order suffices and keeps the oracle trivially mirrorable."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cname"))
    sn = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("sname"))
    und = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .filter(F.col("cname") != F.col("sname"))
        .select(
            F.least("cname", "sname").alias("a"),
            F.greatest("cname", "sname").alias("b"),
        )
        .distinct()
        # the edge list is tiny (≤ nations²) but sits downstream of the
        # full fact join — persist so the three wedge-join branches don't
        # re-run that join, and broadcast the closure sides (at web scale
        # the edge list is big: keep e1 shuffled, degree-orient, and let
        # e2/e3 be the bucketed sides instead)
    )
    und = persist_once(und)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tris = (
        e1.join(F.broadcast(e2), F.col("e1.b") == F.col("e2.a"))
        .join(
            F.broadcast(e3),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("nation"))
        .groupBy("nation")
        .agg(F.count("*").alias("n_triangles"))
    )


TRIANGLES_ORACLE = """
WITH und AS (
  SELECT DISTINCT least(n1.n_name, n2.n_name) AS a,
                  greatest(n1.n_name, n2.n_name) AS b
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE n1.n_name <> n2.n_name
),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS nation FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris
)
SELECT nation, COUNT(*) AS n_triangles FROM corners GROUP BY 1
"""

register(QuerySpec("graph_triangles", graph_triangles, TRIANGLES_ORACLE,
                   tags=("GRAPH",)))


# --- label-propagation communities ------------------------------------------

LPA_ITER = 3


def _source_backbone(spark: SparkSession, sf_dir: str):
    """``(backbone, nbrs)`` — the strong-edge source-overlap graph:
    exact shared-distinct-shingle pair weights, filtered to edges above
    the global mean weight, plus its symmetrized neighbor relation.
    Shared by the LPA query and the modularity audit."""
    from pyspark.sql import functions as F

    from star_schema_etl_airflow_spark.plans.kmv_overlap import (
        _H_S,
        _SH_S,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    hashes = persist_once(
        docs.select(
            "source",
            F.explode(F.expr(f"transform({_SH_S}, s -> {_H_S})")).alias("h"),
        )
        .distinct()
    )
    a = hashes.select(F.col("source").alias("sa"), "h")
    b = hashes.select(F.col("source").alias("sb"), "h")
    pairs = persist_once(
        a.join(b, "h")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    mean_w = pairs.agg(
        (F.sum("w").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("mw")
    )
    backbone = persist_once(
        pairs.crossJoin(F.broadcast(mean_w)).filter(
            F.col("w").cast("double") > F.col("mw")
        ).select("sa", "sb", "w")
    )
    nbrs = persist_once(
        backbone.select(F.col("sa").alias("node"), F.col("sb").alias("nbr"), "w")
        .unionByName(
            backbone.select(
                F.col("sb").alias("node"), F.col("sa").alias("nbr"), "w"
            )
        )
    )
    return backbone, nbrs


def _lpa(nbrs: DataFrame) -> DataFrame:
    """``(node, community)`` after ``LPA_ITER`` synchronous rounds."""
    from pyspark.sql import functions as F

    labels = nbrs.select("node").distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    for _ in range(LPA_ITER):
        votes = (
            nbrs.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("wsum"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("wsum")).alias("nw"), F.col("label"))
                ).getField("label").alias("label")
            )
            .localCheckpoint()
        )
    return labels.select("node", F.col("label").alias("community"))


def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    SOURCE-OVERLAP graph: nodes are corpus sources, edge weight is the
    exact count of distinct shingle hashes the two sources share, and
    only backbone edges (weight above the global mean — the standard
    disparity-filter simplification) propagate.  Each round every node
    adopts the label with the largest incident-weight sum among its
    neighbors (ties → lexicographically smallest label) — the
    deterministic variant of LPA (random-order async LPA is not
    differentially checkable).  ``LPA_ITER`` fixed rounds; init is
    label(v) = v.  The result groups sources that crawl the same
    content — the mixing/dedup planning view one level above
    ``kmv_source_overlap``'s pairwise estimates.

    Scale design: the corpus participates only through the distinct
    (source, hash) relation (one scan + distinct); the pairwise shared
    counts are an inverted-index self-join on the hash — per-hash
    fan-out is df², so at web scale the hash relation is DF-capped
    exactly as ``plans/winnow.py`` does (censused, not silent) or the
    KMV estimate replaces the exact count.  Each LPA round is one
    join of the source-bounded neighbor relation to the labels + an
    aggregatable ``min(struct)`` argmax (map-side combine, no
    windows); plans stay O(1) across rounds via ``localCheckpoint``."""
    _, nbrs = _source_backbone(spark, sf_dir)
    return _lpa(nbrs)


def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity audit of the LPA partition — community quality
    as a query (the graph twin of ``dedup_eval``/``retrieval_eval``):
    per community, Q_c = w_in/W − (deg_sum/2W)², where W is the total
    backbone weight, w_in the weight inside the community, deg_sum the
    community's weighted degree.  Σ_c Q_c is the partition's modularity
    (≈0 for random structure).  All inputs are exact integer sums; the
    two divisions are written with the identical expression tree on
    both engines.  Joins are node-keyed (source-bounded); the total is
    a 1-row broadcast."""
    from pyspark.sql import functions as F

    backbone, nbrs = _source_backbone(spark, sf_dir)
    lab = persist_once(_lpa(nbrs))
    wtot = backbone.agg(F.sum("w").cast("double").alias("W"))
    la = lab.select(F.col("node").alias("sa"), F.col("community"))
    lb = lab.select(F.col("node").alias("sb"),
                    F.col("community").alias("cb"))
    win = (
        backbone.join(la, "sa").join(lb, "sb")
        .filter(F.col("community") == F.col("cb"))
        .groupBy("community")
        .agg(F.sum("w").alias("w_in"))
    )
    deg = (
        nbrs.join(lab, "node")
        .groupBy("community")
        .agg(F.sum("w").alias("degree_sum"))
    )
    sizes = lab.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    return (
        sizes.join(deg, "community")
        .join(win, "community", "left")
        .crossJoin(F.broadcast(wtot))
        .select(
            "community",
            F.col("n_nodes").cast("int").alias("n_nodes"),
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("w_in"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round(
                F.coalesce(F.col("w_in"), F.lit(0)).cast("double")
                / F.col("W")
                - (F.col("degree_sum").cast("double")
                   / (F.lit(2.0) * F.col("W")))
                * (F.col("degree_sum").cast("double")
                   / (F.lit(2.0) * F.col("W"))),
                9,
            ).alias("mod_term"),
        )
    )


def _lpa_iter_cte(k: int) -> str:
    prev = "it0" if k == 1 else f"it{k - 1}"
    return f"""v{k} AS (
  SELECT n.node, p.label, SUM(n.w) AS wsum
  FROM nbrs n JOIN {prev} p ON n.nbr = p.node GROUP BY 1, 2
),
it{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (
             PARTITION BY node ORDER BY wsum DESC, label ASC) AS rn
    FROM v{k}
  ) WHERE rn = 1
)"""


def _lpa_ctes() -> str:
    from star_schema_etl_airflow_spark.functions.text import (
        md5_long_duck,
        shingles_duck,
        tokens_duck,
    )

    h_d = md5_long_duck("s")
    sh_d = shingles_duck(tokens_duck("text"))
    return f"""hashes AS (
  SELECT DISTINCT source, {h_d} AS h
  FROM (SELECT source, unnest({sh_d}) AS s FROM documents)
),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS w
  FROM hashes a JOIN hashes b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
mw AS (
  SELECT CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mw FROM pairs
),
backbone AS (
  SELECT sa, sb, w FROM pairs CROSS JOIN mw
  WHERE CAST(w AS DOUBLE) > mw
),
nbrs AS (
  SELECT sa AS node, sb AS nbr, w FROM backbone
  UNION ALL
  SELECT sb, sa, w FROM backbone
),
it0 AS (
  SELECT DISTINCT node, node AS label FROM nbrs
),
{", ".join(_lpa_iter_cte(k) for k in range(1, LPA_ITER + 1))}"""


def _lpa_oracle() -> str:
    return f"""
WITH {_lpa_ctes()}
SELECT node, label AS community FROM it{LPA_ITER}
"""


def _modularity_oracle() -> str:
    q = "CAST(degree_sum AS DOUBLE) / (2.0 * W)"
    return f"""
WITH {_lpa_ctes()},
lab AS (SELECT node, label AS community FROM it{LPA_ITER}),
wtot AS (SELECT CAST(SUM(w) AS DOUBLE) AS W FROM backbone),
win AS (
  SELECT la.community, SUM(e.w) AS w_in
  FROM backbone e
  JOIN lab la ON e.sa = la.node
  JOIN lab lb ON e.sb = lb.node AND la.community = lb.community
  GROUP BY 1
),
deg AS (
  SELECT la.community, SUM(n.w) AS degree_sum
  FROM nbrs n JOIN lab la ON n.node = la.node GROUP BY 1
),
sizes AS (
  SELECT community, COUNT(*) AS n_nodes FROM lab GROUP BY 1
)
SELECT s.community,
       CAST(s.n_nodes AS INTEGER) AS n_nodes,
       CAST(COALESCE(w.w_in, 0) AS BIGINT) AS w_in,
       CAST(d.degree_sum AS BIGINT) AS degree_sum,
       ROUND(CAST(COALESCE(w.w_in, 0) AS DOUBLE) / W
             - ({q}) * ({q}), 9) AS mod_term
FROM sizes s
JOIN deg d ON d.community = s.community
LEFT JOIN win w ON w.community = s.community
CROSS JOIN wtot
"""


register(QuerySpec("graph_communities", graph_communities, _lpa_oracle(),
                   tags=("GRAPH", "LPA")))
register(QuerySpec("community_modularity", community_modularity,
                   _modularity_oracle(), tags=("GRAPH", "LPA", "EVAL")))
