"""k-means‖ scalable init (Bahmani et al., "Scalable k-means++",
VLDB 2012) as an oracle-checked query, plus the trained-cells builder
the IVFADC variant ablation consumes.

Why this exists (r15 verdict task 4): ``kmeans_fit``'s init is the k
lowest vec_ids — deterministic but quality-blind, and the measured
trained-quantizer recall sat in the 0.16–0.31 band.  k-means‖ is the
canonical distributed answer: a few oversampling rounds draw ~l
candidates each with probability proportional to their squared
distance from the current candidate set, candidates are weighted by
Voronoi-cell size, and the weighted candidate set (control-plane
sized) is re-clustered to k.  Every step here is the published
algorithm with the randomness replaced by a seedable integer hash and
every aggregate exact (BIGINT distances over the fixed-point sv
vectors, DECIMAL(38,0) sums), so the whole init — sampling rounds
included — is differentially checkable.

Scale shape (100 TB): per oversampling round, one broadcast argmin
over the corpus (candidate set is ≈ 1 + rounds·l rows — never a
corpus-side shuffle of vectors) and a 1-row φ aggregate; the weighted
re-cluster touches only candidates.  This is exactly the paper's
``O(rounds)`` passes, each map-side, vs k-means++'s k sequential
passes.

Cited reference behavior: none in /root/reference (no clustering
there); published-algorithm parity only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.operators.kmeans import (
    KMPAR_HASH_A,
    KMPAR_HASH_B,
    KMPAR_HASH_M,
    lloyd_refine_sv,
    scalable_init,
)
from star_schema_etl_airflow_spark.plans.clustering_queries import (
    K,
    N_ITER,
)
from star_schema_etl_airflow_spark.plans.pq import _SV_S, _sv_duck
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

EMB_DIM = 64
KMPAR_L = 2 * K          # oversampling factor l (paper: l = Θ(k))
KMPAR_ROUNDS = 3         # oversampling rounds (paper: O(log ψ); ~5)
KMPAR_RELLOYD = 2        # weighted re-cluster iterations on candidates


def kmeans_scalable_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster): every vector assigned to its nearest of the
    ``K`` k-means‖ init centers — the init itself under differential
    check (sampling rounds, φ, weighting, weighted re-cluster)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    centers = scalable_init(
        emb, K, KMPAR_L, KMPAR_ROUNDS, dim=EMB_DIM, relloyd=KMPAR_RELLOYD
    )
    from star_schema_etl_airflow_spark.operators.kmeans import _mix_sqdist

    d = _mix_sqdist("a.sv", "b.c", EMB_DIM)
    return (
        emb.alias("a")
        .crossJoin(F.broadcast(centers.alias("b")))
        .select("a.vec_id", F.col("b.cluster").alias("cl"),
                F.expr(d).alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cl")).alias("best"))
        .select("vec_id", F.col("best.cl").alias("cluster"))
    )


# --- DuckDB oracle ----------------------------------------------------------

# exact BIGINT sqdist of two INT64 fixed-point lists (1-based)
_INT_D = (
    f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
    "i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])))"
)
# int-vs-double sqdist (candidate/vector vs mean center)
_MIX_D = (
    f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
    "i -> (CAST(({a})[i] AS DOUBLE) - ({b})[i]) "
    "* (CAST(({a})[i] AS DOUBLE) - ({b})[i])))"
)


def _accept_d(r: int, l: int) -> str:
    return (
        f"CAST(((v.vec_id + 1) * {KMPAR_HASH_A} + {r} * {KMPAR_HASH_B})"
        f" % {KMPAR_HASH_M} AS DOUBLE) "
        f"< (CAST({l} AS DOUBLE) * CAST(d.d2 AS DOUBLE) / p.phi) "
        f"* {KMPAR_HASH_M}.0"
    )


def kmpar_ctes(
    k: int = K,
    l: int = KMPAR_L,
    rounds: int = KMPAR_ROUNDS,
    relloyd: int = KMPAR_RELLOYD,
) -> str:
    """The full k-means‖ chain: ``ksv`` fixed-point vectors →
    oversampling rounds ``kc{r}`` → weights ``kcw`` → weighted Lloyd
    ``krc{j}`` — ends at ``krc{relloyd}`` (cluster, c DOUBLE list in
    sv scale), mirroring ``operators/kmeans.scalable_init``."""
    dcc = _INT_D.format(a="v.sv", b="c.sv")
    parts = [f"""ksv AS (
  SELECT vec_id, {_sv_duck('embedding')} AS sv FROM embeddings
)""", """kc0 AS (
  SELECT vec_id AS cid, sv FROM ksv ORDER BY vec_id LIMIT 1
)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""kd{r} AS (
  SELECT v.vec_id, MIN({dcc}) AS d2
  FROM ksv v CROSS JOIN kc{r - 1} c GROUP BY v.vec_id
)""")
        parts.append(f"""kphi{r} AS (
  SELECT CAST(SUM(CAST(d2 AS DECIMAL(38,0))) AS DOUBLE) AS phi
  FROM kd{r}
)""")
        parts.append(f"""kc{r} AS (
  SELECT cid, sv FROM kc{r - 1}
  UNION ALL
  SELECT v.vec_id AS cid, v.sv
  FROM ksv v JOIN kd{r} d ON d.vec_id = v.vec_id CROSS JOIN kphi{r} p
  WHERE d.d2 > 0 AND {_accept_d(r, l)}
)""")
    parts.append(f"""kw AS (
  SELECT cid, COUNT(*) AS w FROM (
    SELECT vec_id, cid FROM (
      SELECT v.vec_id, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id ORDER BY {dcc}, c.cid) AS rn
      FROM ksv v CROSS JOIN kc{rounds} c
    ) WHERE rn = 1
  ) GROUP BY cid
)""")
    parts.append(f"""kcw AS (
  SELECT c.cid, c.sv, COALESCE(kw.w, 0) AS w
  FROM kc{rounds} c LEFT JOIN kw ON kw.cid = c.cid
)""")
    parts.append(f"""krc0 AS (
  SELECT cid AS cluster,
         list_transform(sv, x -> CAST(x AS DOUBLE)) AS c
  FROM kcw ORDER BY cid LIMIT {k}
)""")
    dcd = _MIX_D.format(a="a.sv", b="b.c")
    for j in range(1, relloyd + 1):
        parts.append(f"""kra{j} AS (
  SELECT cid, sv, w, cl AS cluster FROM (
    SELECT a.cid, a.sv, a.w, b.cluster AS cl,
           ROW_NUMBER() OVER (
             PARTITION BY a.cid ORDER BY {dcd}, b.cluster) AS rn
    FROM kcw a CROSS JOIN krc{j - 1} b
  ) WHERE rn = 1
)""")
        parts.append(f"""krc{j} AS (
  SELECT cluster, list(m ORDER BY dim) AS c FROM (
    SELECT cluster, dim,
           CAST(SUM(CAST(sv[dim] AS DECIMAL(38,0)) * w) AS DOUBLE)
             / SUM(w) AS m
    FROM kra{j}
    CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS dim) dd
    GROUP BY cluster, dim
  ) GROUP BY cluster
)""")
    return ",\n".join(parts)


_FINAL = f"krc{KMPAR_RELLOYD}"

KMPAR_INIT_ORACLE = f"""
WITH {kmpar_ctes()}
SELECT vec_id, cluster FROM (
  SELECT v.vec_id, b.cluster,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY {_MIX_D.format(a='v.sv', b='b.c')}, b.cluster) AS rn
  FROM ksv v CROSS JOIN {_FINAL} b
) WHERE rn = 1
"""

register(QuerySpec("kmeans_scalable_init", kmeans_scalable_init,
                   KMPAR_INIT_ORACLE, tags=("KMEANS", "llm")))


# --- trained cells for the IVFADC variant ablation --------------------------


def kmpar_refine_ctes(n_iter: int = N_ITER) -> str:
    """Lloyd refinement rounds over ALL vectors from the k-means‖
    centers (``klc0`` = the init handoff): exact DECIMAL mean updates
    in the sv space, mirroring ``operators/kmeans.lloyd_refine_sv``."""
    parts = [f"""klc0 AS (
  SELECT cluster, c FROM {_FINAL}
)"""]
    for i in range(1, n_iter + 1):
        dcd = _MIX_D.format(a="a.sv", b="b.c")
        parts.append(f"""kla{i} AS (
  SELECT vec_id, sv, cl AS cluster FROM (
    SELECT a.vec_id, a.sv, b.cluster AS cl,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id ORDER BY {dcd}, b.cluster) AS rn
    FROM ksv a CROSS JOIN klc{i - 1} b
  ) WHERE rn = 1
)""")
        parts.append(f"""klc{i} AS (
  SELECT cluster, list(m ORDER BY dim) AS c FROM (
    SELECT cluster, dim,
           CAST(SUM(CAST(sv[dim] AS DECIMAL(38,0))) AS DOUBLE)
             / COUNT(*) AS m
    FROM kla{i}
    CROSS JOIN (SELECT unnest(range(1, {EMB_DIM} + 1)) AS dim) dd
    GROUP BY cluster, dim
  ) GROUP BY cluster
)""")
    return ",\n".join(parts)


def fit_scalable_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell, csv): IVF coarse cells from k-means‖ init + ``N_ITER``
    Lloyd refinement rounds, fixed-pointed back to INT64 (centers are
    already in the sv scale, so the PQ contract's floor(x·1e6 + 0.5)
    reduces to floor(c + 0.5))."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    centers = scalable_init(
        emb, K, KMPAR_L, KMPAR_ROUNDS, dim=EMB_DIM, relloyd=KMPAR_RELLOYD
    )
    _, cents = lloyd_refine_sv(emb, centers, N_ITER, dim=EMB_DIM)
    return cents.select(
        F.col("cluster").alias("cell"),
        F.expr("transform(c, x -> cast(floor(x + 0.5d) as bigint))")
        .alias("csv"),
    )


SCALABLE_CELLS_CTE = f"""cells AS (
  SELECT cluster AS cell,
         list_transform(c, x -> CAST(floor(x + 0.5) AS BIGINT)) AS csv
  FROM klc{N_ITER}
),"""
