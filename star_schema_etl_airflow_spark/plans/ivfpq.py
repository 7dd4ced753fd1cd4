"""IVFADC — the composed IVF + PQ index (Jégou et al., TPAMI 2011 §V):
coarse-quantize the corpus into inverted lists, product-quantize each
vector's RESIDUAL (vector − its cell centroid), and answer queries by
probing the nearest ``NPROBE`` cells with per-cell ADC lookup tables
over the residual codebook.  The repo ships the two halves separately
(``plans/llm_similarity.py`` IVF, ``plans/pq.py`` flat-PQ ADC); this is
the billion-scale composition — residual encoding is what lets a single
small codebook stay accurate across cells, and cell probing is what
keeps the scored set a fraction of the corpus.

Determinism: coordinates are fixed-pointed once (``floor(x·1e6+0.5)``,
the ``plans/pq.py`` contract) and EVERYTHING after — cell assignment,
residuals, encoding, ADC — is int64 arithmetic: exact under any
partitioning, either engine.  Residuals of scaled ints are scaled ints,
so the composition adds no new float edge.  Headroom: |coord| < 0.6 ⇒
scaled |sv| < 6e5, residual |r| < 1.2e6, per-subspace dist < 8·(2.4e6)²
≈ 4.6e13, ADC sum < 4e14 ≪ 2^63.

Deterministic training bands (data-defined, as FAISS seeds from the
first training points): coarse centroids are the ``NCELLS`` vectors at
``vec_id ∈ [N_QUERIES, N_QUERIES+NCELLS)``; the residual codebook's
``K_C`` entries per subspace are the residuals of the next ``K_C``
vectors.  The k-means-trained variant plugs in by swapping the centroid
relation (``embed_ann_ivf_trained`` shows the trained-codebook seam).

Scale design (100 TB of vectors):
- cells (NCELLS rows), the residual codebook (M·K_C rows) and the
  per-query probe/ADC tables (|q|·NPROBE·M·K_C rows) are control-plane
  sized and broadcast; the corpus is never on the build side.
- assignment + residual + encoding is ONE scan of the corpus followed by
  a (vec, subspace)-keyed argmin group-by with map-side combine — the
  FAISS ``add()`` pass.
- scoring joins codes to the broadcast ADC table on (cell, m, code):
  only candidates in probed cells match (inner join does the inverted-
  list pruning declaratively), and the per-query top-k window rides
  Catalyst's partial ``WindowGroupLimit`` — the exchange carries
  O(queries·k) rows per partition.

Reference parity: beyond-reference (LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.pq import (
    _sv_duck,
    _SQDIST_D,
    _SV_S,
    D_SUB,
    K_C,
    M_SUB,
    N_QUERIES,
    TOP_K,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

NCELLS = 8
NPROBE = 2
_CB_LO = N_QUERIES + NCELLS          # codebook training band
_CB_HI = N_QUERIES + NCELLS + K_C

# int64 sqdist over full 64-dim scaled vectors (cell assignment / probe)
_SQ64_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "0L, (acc, v) -> acc + v)"
)
# residual slice for subspace m (0-based m, 1-based slice)
_RSUB_S = (
    f"zip_with(slice(sv, m * {D_SUB} + 1, {D_SUB}), "
    f"slice(csv, m * {D_SUB} + 1, {D_SUB}), (x, y) -> x - y)"
)


SHORTLIST = 50   # ADC shortlist depth for the refine (re-rank) stage


_D_CELL = _SQ64_S.format(a="sv", b="csv")
_D_ENC = _SQ64_S.format(a="rsub", b="csub")


def _rsub_of(cand: DataFrame, cells: DataFrame) -> DataFrame:
    """(cand_id, cell, m, rsub): nearest-cell assignment (tie → lowest
    cell id, via an aggregatable ``min(struct)`` with map-side combine)
    and the per-subspace residual slices — per-VECTOR pure given
    ``cells``, which is what makes encoding incremental for free."""
    assigned = (
        cand.crossJoin(F.broadcast(cells))
        .select(
            "cand_id", "sv", "csv", "cell",
            F.struct(F.expr(_D_CELL).alias("d"), F.col("cell").alias("c"))
            .alias("dc"),
        )
        .groupBy("cand_id")
        .agg(
            F.min("dc").getField("c").alias("cell"),
            F.first("sv").alias("sv"),
        )
        .join(F.broadcast(cells), "cell")
    )
    return assigned.select(
        "cand_id", "cell",
        F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("m"),
        "sv", "csv",
    ).select("cand_id", "cell", "m", F.expr(_RSUB_S).alias("rsub"))


def _artifacts(emb: DataFrame, cells: DataFrame | None = None):
    """The frozen index artifacts: coarse ``cells`` and the residual
    codebook ``cb`` (the training band's residual subvectors, taken
    against whichever coarse quantizer is in force).  Both are
    control-plane sized; a deployment materializes them once per index
    version.  ``cells`` defaults to the deterministic band quantizer;
    the trained variant passes the scaled k-means codebook."""
    if cells is None:
        cells = (
            emb.filter(
                (F.col("vec_id") >= N_QUERIES)
                & (F.col("vec_id") < N_QUERIES + NCELLS)
            )
            .select(F.col("vec_id").alias("cell"), F.col("sv").alias("csv"))
        )
    band = emb.filter(
        (F.col("vec_id") >= _CB_LO) & (F.col("vec_id") < _CB_HI)
    ).withColumnRenamed("vec_id", "cand_id")
    cb = _rsub_of(band, cells).select(
        F.col("cand_id").alias("cid"), "m", F.col("rsub").alias("csub")
    )
    return cells, cb


# --- vectorized add() pass (r17, guide §4.1/§4.2) ---------------------------
#
# The assignment + residual + per-subspace encode was an interpreted HOF
# fold (``aggregate(zip_with(...))``) per (row, cell) and per
# (row, m, centroid) pair — NCELLS + M_SUB·K_C interpreted folds per
# corpus row, the dominant per-row cost of every IVFADC query.  The r16
# attempt to unroll those folds into Catalyst expressions regressed on
# PLANNING cost (~600-node trees, >1 s per call) and was reverted; the
# arithmetic belongs in numpy behind ONE Arrow boundary crossing, where
# planning cost is constant and the per-row work is vectorized.  The
# artifacts (cells, residual codebook, per-query ADC tables) are
# control-plane sized BY DESIGN (module docstring) so collecting them to
# the driver is cheap; everything stays int64 — numpy int64 arithmetic
# is exact at the documented headroom (ADC sums < 6e15 ≪ 2⁶³), and
# ``argmin`` over arrays sorted by id ascending reproduces the SQL
# ``min(struct(d, id))`` tie-break (first minimum = lowest id) exactly.


def _np_cells(cells: DataFrame):
    """(ids, C): the coarse quantizer collected into numpy arrays sorted
    by cell id ascending (argmin tie → lowest cell id)."""
    import numpy as np

    rows = sorted(cells.collect(), key=lambda r: r["cell"])
    ids = np.array([r["cell"] for r in rows], dtype=np.int64)
    C = np.array([list(r["csv"]) for r in rows], dtype=np.int64)
    return ids, C


def _np_assign(X, C):
    """Row index into ``C`` of each vector's nearest cell — exact int64
    L2, ties to the lowest row (= lowest id; ``C`` is sorted by id)."""
    return ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)


def _np_codebook(band_rows, ids, C):
    """(cids, sub): the residual codebook from the training band's
    (vec_id, sv) rows — numpy twin of ``_rsub_of`` on the band, sorted
    by cid ascending (argmin tie → lowest cid)."""
    import numpy as np

    rows = sorted(band_rows, key=lambda r: r["vec_id"])
    cids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    B = np.array([list(r["sv"]) for r in rows], dtype=np.int64)
    R = B - C[_np_assign(B, C)]
    sub = [
        np.ascontiguousarray(R[:, m * D_SUB:(m + 1) * D_SUB])
        for m in range(M_SUB)
    ]
    return cids, sub


def _np_encode(cand: DataFrame, ids, C, cids, sub) -> DataFrame:
    """The vectorized add() pass over ANY (cand_id, sv) relation: one
    Arrow crossing per corpus row, assignment/residual/encode in int64
    numpy.  Same output contract as the former fold-based encode —
    (cand_id, cell, m, code), one row per (vector, subspace)."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array([list(v) for v in pdf["sv"]], dtype=np.int64)
            a = _np_assign(X, C)
            cell = ids[a]
            R = X - C[a]
            cand_id = pdf["cand_id"].to_numpy(dtype=np.int64)
            frames = []
            for m in range(M_SUB):
                S = R[:, m * D_SUB:(m + 1) * D_SUB]
                d = ((S[:, None, :] - sub[m][None, :, :]) ** 2).sum(axis=2)
                frames.append(pd.DataFrame({
                    "cand_id": cand_id,
                    "cell": cell,
                    "m": np.full(n, m, dtype=np.int32),
                    "code": cids[d.argmin(axis=1)],
                }))
            yield pd.concat(frames, ignore_index=True)

    return cand.select("cand_id", "sv").mapInPandas(
        kernel, schema="cand_id long, cell long, m int, code long"
    )


def _np_qtab(qrows, ids, C, cids, sub, nprobe: int):
    """Probe + per-query ADC lookup tables, computed exactly on the
    driver (|q|·nprobe·M·K_C rows — control-plane sized by design):
    rows of (query_id, cell, m, cid, qdist).  Probe order ties break on
    (d, cell) ascending like the former window's orderBy."""
    import numpy as np

    out = []
    for r in sorted(qrows, key=lambda r: r["vec_id"]):
        qv = np.array(list(r["sv"]), dtype=np.int64)
        d = ((qv[None, :] - C) ** 2).sum(axis=1)
        for j in np.lexsort((ids, d))[:nprobe]:
            res = qv - C[j]
            for m in range(M_SUB):
                s = res[m * D_SUB:(m + 1) * D_SUB]
                dd = ((s[None, :] - sub[m]) ** 2).sum(axis=1)
                # one row per codebook entry of the probed (query, cell)
                for cid, qd in zip(cids, dd):
                    out.append((
                        int(r["vec_id"]), int(ids[j]), m,
                        int(cid), int(qd),
                    ))
    return out


def _encode(cand: DataFrame, cells: DataFrame, cb: DataFrame) -> DataFrame:
    """(cand_id, cell, code per subspace) — the FAISS ``add()`` pass
    for ANY (cand_id, sv) relation against frozen artifacts, given as
    the control-plane (cells, cb) DataFrames; collects both (tiny by
    contract) and runs the vectorized encode."""
    import numpy as np

    ids, C = _np_cells(cells)
    rows = sorted(cb.collect(), key=lambda r: (r["m"], r["cid"]))
    cids = np.array(sorted({r["cid"] for r in rows}), dtype=np.int64)
    sub = []
    for m in range(M_SUB):
        mr = [r for r in rows if r["m"] == m]
        assert [r["cid"] for r in mr] == list(cids), "ragged codebook"
        sub.append(np.array([list(r["csub"]) for r in mr], dtype=np.int64))
    return _np_encode(cand, ids, C, cids, sub)


def _adc_scores(spark: SparkSession, sf_dir: str, codes_of=None,
                nprobe: int = NPROBE, cells_of=None,
                rotate: str | None = None):
    """Shared IVFADC machinery: returns ``(adc, emb)`` where ``adc`` is
    the per-(query, candidate-in-probed-cell) asymmetric distance
    relation and ``emb`` the scaled-int vector relation (for refine).
    ``codes_of(emb, encode)`` overrides how the code table is built
    (the incremental-add path supplies a union of frozen + delta
    encodes; ``encode(cand)`` is the vectorized add() pass against this
    call's frozen artifacts); ``nprobe`` overrides the probe depth (the
    eval sweep); ``cells_of(spark, sf_dir)`` overrides the coarse
    quantizer (the k-means-trained variant); ``rotate`` is a Spark-SQL
    expression over a bound array column named ``sv`` applying an
    orthogonal-up-to-scale INT64 transform to every vector at load (the
    OPQ seam — ``plans/ivfpq_opq.py``; ``cells_of`` must rotate its
    centroids identically)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    if rotate is not None:
        emb = emb.select("vec_id", F.expr(rotate).alias("sv"))

    # ONE control-plane job collects queries + codebook band (+ the
    # band quantizer when no trained cells are supplied) — the three
    # deterministic head bands are contiguous by construction
    head = emb.filter(F.col("vec_id") < _CB_HI).collect()
    if cells_of is None:
        crows = [
            {"cell": r["vec_id"], "csv": r["sv"]}
            for r in head if N_QUERIES <= r["vec_id"] < _CB_LO
        ]
        ids = np.array(
            sorted(r["cell"] for r in crows), dtype=np.int64
        )
        C = np.array(
            [list(r["csv"]) for r in sorted(crows, key=lambda r: r["cell"])],
            dtype=np.int64,
        )
    else:
        ids, C = _np_cells(cells_of(spark, sf_dir))
    cids, sub = _np_codebook(
        [r for r in head if _CB_LO <= r["vec_id"] < _CB_HI], ids, C
    )

    def encode(cand: DataFrame) -> DataFrame:
        return _np_encode(cand, ids, C, cids, sub)

    if codes_of is None:
        cand = emb.filter(F.col("vec_id") >= N_QUERIES).withColumnRenamed(
            "vec_id", "cand_id"
        )
        codes = encode(cand)
    else:
        codes = codes_of(emb, encode)

    # --- search(): probe cells, ADC tables, score codes --------------------
    # the probe + per-query lookup tables are |q|·nprobe·M·K_C rows —
    # computed exactly on the driver and shipped as a broadcast literal
    # (replaces a window + explode + two joins of plan per call)
    qtab = spark.createDataFrame(
        _np_qtab(
            [r for r in head if r["vec_id"] < N_QUERIES],
            ids, C, cids, sub, nprobe,
        ),
        schema="query_id long, cell long, m int, cid long, qdist long",
    )

    adc = (
        codes.join(
            F.broadcast(qtab),
            (codes.cell == qtab.cell)
            & (codes.m == qtab.m)
            & (codes.code == qtab.cid),
        )
        .select("query_id", "cand_id", codes.cell, "qdist")
        .groupBy("query_id", "cand_id", "cell")
        .agg(F.sum("qdist").alias("adc_dist"))
    )
    return adc, emb


def embed_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper: rank probed-cell candidates by PQ asymmetric
    distance (the codes-only scan — no full vectors touched at query
    time)."""
    adc, _ = _adc_scores(spark, sf_dir)
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "cand_id", "cell", "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def embed_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC-R (Jégou et al. §VI "re-ranking with source coding"): the
    ADC shortlist (top ``SHORTLIST`` per query) is re-scored with EXACT
    int64 L2 on the full scaled vectors, and the final top-``TOP_K`` is
    ranked by the exact distance.  This is the production recall path —
    quantization error decides only shortlist membership, never the
    final order.

    Scale: the shortlist is |q|·SHORTLIST rows — control-plane sized and
    broadcast against ONE keyed lookup into the vector table (an
    equi-join on vec_id; at deployment the full-precision vectors are
    fetched from the same parquet the index was built from)."""
    adc, emb = _adc_scores(spark, sf_dir)
    return _refine(adc, emb)


def _refine(adc: DataFrame, emb: DataFrame) -> DataFrame:
    """The §VI refine stage on any ADC relation: ADC shortlist → exact
    int64 L2 re-rank → final top-``TOP_K`` (shared by the rerank query
    and the nprobe eval sweep)."""
    ws = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    short = (
        adc.withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= SHORTLIST)
        .drop("srank")
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qsv")
    )
    cv = emb.select(F.col("vec_id").alias("cand_id"), F.col("sv").alias("csv2"))
    d_exact = _SQ64_S.format(a="qsv", b="csv2")
    rer = (
        F.broadcast(short)
        .join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "cand_id", "cell", "adc_dist",
            F.expr(d_exact).alias("exact_dist"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy("exact_dist", "cand_id")
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "cand_id", "cell", "adc_dist", "exact_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


_SQ64_D = _SQDIST_D.format(n=64, a="{a}", b="{b}")
_RSUB_D = (
    f"list_transform(range(1, {D_SUB} + 1), "
    "i -> ({sv})[m * " + str(D_SUB) + " + i] - ({csv})[m * "
    + str(D_SUB) + " + i])"
)
_D8_D = _SQDIST_D.format(n=D_SUB, a="{a}", b="{b}")

IVFPQ_ORACLE = f"""
WITH sv AS (
  SELECT vec_id, {_sv_duck('embedding')} AS sv FROM embeddings
),
cells AS (
  SELECT vec_id AS cell, sv AS csv FROM sv
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + {NCELLS}
),
cdist AS (
  SELECT v.vec_id AS cand_id, c.cell,
         {_SQ64_D.format(a='v.sv', b='c.csv')} AS d
  FROM sv v CROSS JOIN cells c WHERE v.vec_id >= {N_QUERIES}
),
assigned AS (
  SELECT d.cand_id, MIN(d.cell) AS cell
  FROM cdist d
  JOIN (SELECT cand_id, MIN(d) AS md FROM cdist GROUP BY 1) b
    ON d.cand_id = b.cand_id AND d.d = b.md
  GROUP BY d.cand_id
),
rsub AS (
  SELECT a.cand_id, a.cell, g.m,
         {_RSUB_D.format(sv='v.sv', csv='c.csv')} AS rsub
  FROM assigned a
  JOIN sv v ON v.vec_id = a.cand_id
  JOIN cells c ON c.cell = a.cell
  CROSS JOIN (SELECT unnest(range(0, {M_SUB})) AS m) g
),
cb AS (
  SELECT cand_id AS cid, m, rsub AS csub FROM rsub
  WHERE cand_id >= {_CB_LO} AND cand_id < {_CB_HI}
),
edist AS (
  SELECT r.cand_id, r.cell, r.m, k.cid,
         {_D8_D.format(a='r.rsub', b='k.csub')} AS d
  FROM rsub r JOIN cb k USING (m)
),
codes AS (
  SELECT d.cand_id, d.cell, d.m, MIN(d.cid) AS code
  FROM edist d
  JOIN (SELECT cand_id, m, MIN(d) AS md FROM edist GROUP BY 1, 2) b
    ON d.cand_id = b.cand_id AND d.m = b.m AND d.d = b.md
  GROUP BY d.cand_id, d.cell, d.m
),
qdistc AS (
  SELECT v.vec_id AS query_id, c.cell, v.sv, c.csv,
         {_SQ64_D.format(a='v.sv', b='c.csv')} AS d
  FROM sv v CROSS JOIN cells c WHERE v.vec_id < {N_QUERIES}
),
probed AS (
  SELECT query_id, cell, sv, csv FROM (
    SELECT query_id, cell, sv, csv,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY d, cell) AS rn
    FROM qdistc
  ) WHERE rn <= {NPROBE}
),
qsub AS (
  SELECT p.query_id, p.cell, g.m,
         {_RSUB_D.format(sv='p.sv', csv='p.csv')} AS rsub
  FROM probed p CROSS JOIN (SELECT unnest(range(0, {M_SUB})) AS m) g
),
qtab AS (
  SELECT q.query_id, q.cell, q.m, k.cid,
         {_D8_D.format(a='q.rsub', b='k.csub')} AS qdist
  FROM qsub q JOIN cb k USING (m)
),
adc AS (
  SELECT t.query_id, c.cand_id, c.cell,
         CAST(SUM(t.qdist) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN qtab t ON t.cell = c.cell AND t.m = c.m AND t.cid = c.code
  GROUP BY 1, 2, 3
)
SELECT query_id, cand_id, cell, adc_dist,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_dist, cand_id) AS rank
  FROM adc
) WHERE rank <= {TOP_K}
"""

# the refine stage composes on the same CTE chain: shortlist by ADC,
# exact int64 L2 on the shortlist, final rank by exact distance
_CTES = IVFPQ_ORACLE.split("\nSELECT query_id,")[0]
IVFPQ_RERANK_ORACLE = f"""{_CTES},
short AS (
  SELECT query_id, cand_id, cell, adc_dist FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_dist, cand_id) AS srank
    FROM adc
  ) WHERE srank <= {SHORTLIST}
),
rer AS (
  SELECT s.query_id, s.cand_id, s.cell, s.adc_dist,
         {_SQ64_D.format(a='qv.sv', b='cv.sv')} AS exact_dist
  FROM short s
  JOIN sv qv ON qv.vec_id = s.query_id
  JOIN sv cv ON cv.vec_id = s.cand_id
)
SELECT query_id, cand_id, cell, adc_dist,
       CAST(exact_dist AS BIGINT) AS exact_dist,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY exact_dist, cand_id) AS rank
  FROM rer
) WHERE rank <= {TOP_K}
"""

def mat_ctes(sql: str) -> str:
    """Mark every CTE of an assembled oracle ``AS MATERIALIZED``
    (r14 verdict task 3, sweep cost): the IVFADC chains reference
    ``sv``/``cb``/``adc`` several times each, and DuckDB's inlining
    re-evaluates a non-materialized CTE per reference — the variant
    ablation paid its three full chains ~3× over.  Applied at
    REGISTRATION time only, so the raw building-block strings the
    oracle surgeries (`_trained_oracle`, `_suffixed_chain`) match
    against stay untouched.

    Guard: refuses SQL containing a WINDOW token ANYWHERE (not just
    line-leading — a clause split across lines as ``... WINDOW\\n
    w AS (...)`` would otherwise escape a line-anchored guard and be
    rewritten into invalid SQL): a line-leading ``w AS (PARTITION
    ...)`` inside one would be rewritten into a syntax error; none of
    the wrapped oracles uses WINDOW, and a future one should
    materialize at assembly time instead."""
    import re

    if re.search(r"(?i)\bWINDOW\b", sql):
        raise ValueError(
            "mat_ctes: SQL contains a WINDOW clause — line-anchored "
            "CTE rewriting would corrupt it; materialize at assembly "
            "time instead"
        )
    return re.sub(r"(?m)^(WITH )?(\s*)(\w+ AS) \(",
                  r"\1\2\3 MATERIALIZED (", sql)


register(QuerySpec("embed_ivfpq_topk", embed_ivfpq_topk,
                   mat_ctes(IVFPQ_ORACLE), tags=("llm", "ann")))
register(QuerySpec("embed_ivfpq_rerank", embed_ivfpq_rerank,
                   mat_ctes(IVFPQ_RERANK_ORACLE), tags=("llm", "ann")))


# --- incremental add() ------------------------------------------------------

IVFPQ_ADD_CUT = 300   # at-rest corpus: vec_id < CUT; delta batch: >= CUT
assert IVFPQ_ADD_CUT >= _CB_HI, "artifacts must come from the at-rest corpus"


def embed_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest path of a deployed IVFADC index (FAISS ``add()``):
    new vectors are encoded against the FROZEN artifacts (cells +
    residual codebook, trained on the at-rest corpus) and their codes
    appended to the at-rest code table — the corpus is never
    re-encoded.  Search is byte-identical to ``embed_ivfpq_topk``.

    The oracle is the FULL-REBUILD oracle ON PURPOSE (the
    ``kmv_incremental_merge`` convention): encoding is per-vector pure
    given (cells, cb), so append-encode must equal rebuild EXACTLY —
    checked differentially, which is what licenses maintaining the
    code table incrementally at 100 TB.  (Here the delta is the
    ``vec_id >= IVFPQ_ADD_CUT`` band — a deterministic stand-in for an
    ingest day; both encode passes run against the same frozen
    broadcast artifacts.)"""
    def codes_of(emb, encode):
        at_rest = emb.filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < IVFPQ_ADD_CUT)
        ).withColumnRenamed("vec_id", "cand_id")
        delta = emb.filter(
            F.col("vec_id") >= IVFPQ_ADD_CUT
        ).withColumnRenamed("vec_id", "cand_id")
        return encode(at_rest).unionByName(encode(delta))

    adc, _ = _adc_scores(spark, sf_dir, codes_of=codes_of)
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "cand_id", "cell", "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# same oracle ON PURPOSE: append-encode must equal full rebuild exactly
register(QuerySpec("embed_ivfpq_incremental", embed_ivfpq_incremental,
                   mat_ctes(IVFPQ_ORACLE),
                   tags=("llm", "ann", "INCREMENTAL")))


# --- nprobe recall/cost sweep -----------------------------------------------

EVAL_NPROBES = (1, 2, 4)


def ivfpq_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-quality evaluation as a query — the IVFADC twin of
    ``dedup_eval_banding``: for each probe depth, the scored-candidate
    volume (the query-time cost axis) and recall@k of the refined list
    against the EXACT int64 top-k (the quality axis).  The probe-depth
    table a deployment reads before fixing ``nprobe``.

    The exact baseline is the broadcast-query full scan (the repo's
    ``embed_topk_cosine`` shape, int64 L2 here) — corpus-linear, built
    once and shared by every config; each config reuses the frozen
    artifacts and differs only in the probe filter."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_SV_S).alias("sv")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qsv")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("sv").alias("csv2")
    )
    d_exact = _SQ64_S.format(a="qsv", b="csv2")
    we = Window.partitionBy("query_id").orderBy("d", "cand_id")
    from star_schema_etl_airflow_spark.functions.caching import persist_once

    exact = persist_once(
        F.broadcast(q).crossJoin(c)
        .select("query_id", "cand_id", F.expr(d_exact).alias("d"))
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id")
    )
    denom = float(N_QUERIES * TOP_K)
    out = None
    for p in EVAL_NPROBES:
        adc, emb_p = _adc_scores(spark, sf_dir, nprobe=p)
        adc = persist_once(adc)
        approx = _refine(adc, emb_p).select("query_id", "cand_id")
        row = (
            adc.agg(F.count(F.lit(1)).alias("n_scored"))
            .crossJoin(
                approx.join(exact, ["query_id", "cand_id"])
                .agg(F.count(F.lit(1)).alias("n_hits"))
            )
            .select(
                F.lit(p).cast("int").alias("nprobe"),
                F.col("n_scored").cast("long").alias("n_scored"),
                F.col("n_hits").cast("long").alias("n_hits"),
                F.round(
                    F.col("n_hits").cast("double") / F.lit(denom), 9
                ).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# oracle: the shared CTE chain (sv..codes, qdistc) + per-nprobe probe/
# ADC/refine chains + the exact full-scan baseline
_SHARED_CTES = _CTES[:_CTES.index("probed AS (")].rstrip().rstrip(",")


def _probe_chain_ctes(p: int) -> str:
    return f"""probed{p} AS (
  SELECT query_id, cell, sv, csv FROM (
    SELECT query_id, cell, sv, csv,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY d, cell) AS rn
    FROM qdistc
  ) WHERE rn <= {p}
),
qsub{p} AS (
  SELECT p.query_id, p.cell, g.m,
         {_RSUB_D.format(sv='p.sv', csv='p.csv')} AS rsub
  FROM probed{p} p CROSS JOIN (SELECT unnest(range(0, {M_SUB})) AS m) g
),
qtab{p} AS (
  SELECT q.query_id, q.cell, q.m, k.cid,
         {_D8_D.format(a='q.rsub', b='k.csub')} AS qdist
  FROM qsub{p} q JOIN cb k USING (m)
),
adc{p} AS (
  SELECT t.query_id, c.cand_id, c.cell,
         CAST(SUM(t.qdist) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN qtab{p} t ON t.cell = c.cell AND t.m = c.m AND t.cid = c.code
  GROUP BY 1, 2, 3
),
short{p} AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc_dist, cand_id) AS srank
    FROM adc{p}
  ) WHERE srank <= {SHORTLIST}
),
rer{p} AS (
  SELECT query_id, cand_id FROM (
    SELECT s.query_id, s.cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.query_id
             ORDER BY {_SQ64_D.format(a='qv.sv', b='cv.sv')}, s.cand_id
           ) AS rank
    FROM short{p} s
    JOIN sv qv ON qv.vec_id = s.query_id
    JOIN sv cv ON cv.vec_id = s.cand_id
  ) WHERE rank <= {TOP_K}
)"""


def _eval_cfg_select(p: int) -> str:
    denom = float(N_QUERIES * TOP_K)
    hits = (f"(SELECT COUNT(*) FROM rer{p} r JOIN exact e "
            f"ON r.query_id = e.query_id AND r.cand_id = e.cand_id)")
    return f"""
  SELECT CAST({p} AS INTEGER) AS nprobe,
         CAST((SELECT COUNT(*) FROM adc{p}) AS BIGINT) AS n_scored,
         CAST({hits} AS BIGINT) AS n_hits,
         ROUND(CAST({hits} AS DOUBLE) / {denom!r}, 9) AS recall"""


IVFPQ_EVAL_ORACLE = f"""{_SHARED_CTES},
exact AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_SQ64_D.format(a='q.sv', b='c.sv')}, c.vec_id
           ) AS rank
    FROM sv q CROSS JOIN sv c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
  ) WHERE rank <= {TOP_K}
),
{", ".join(_probe_chain_ctes(p) for p in EVAL_NPROBES)}
{" UNION ALL ".join(_eval_cfg_select(p) for p in EVAL_NPROBES)}
"""

register(QuerySpec("ivfpq_eval", ivfpq_eval, mat_ctes(IVFPQ_EVAL_ORACLE),
                   tags=("llm", "ann", "EVAL")))


# --- trained coarse quantizer (k-means cells) -------------------------------


_FROZEN: dict[tuple, DataFrame] = {}


def _fixture_fingerprint(sf_dir: str) -> tuple:
    """Cheap (mtime_ns, size) fingerprint of the embeddings fixture
    under ``sf_dir`` so a regenerated fixture invalidates frozen
    artifacts within one Spark application — without it, IVFADC
    queries would silently serve centroids trained on the OLD data
    while the DuckDB oracle reads the new files (a differential
    failure with a misleading cause)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        if os.path.isdir(path):
            parts = sorted(
                os.path.join(path, f) for f in os.listdir(path)
            )
            return tuple(
                (os.path.basename(p), os.stat(p).st_mtime_ns,
                 os.stat(p).st_size)
                for p in parts
            )
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:   # symlinked / virtual fixture dirs: no staleness
        return ("unstatable",)


def frozen_artifact(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Session-scoped frozen index artifact (r14 verdict task 3): the
    production IVFADC lifecycle trains a quantizer ONCE per index
    version and serves every subsequent index/search pass against the
    frozen result — re-deriving it inside each query call both
    mis-times the bench (train+index+search conflated in one figure)
    and multiplies sweep cost by the number of IVFADC-family queries.
    First call materializes via eager ``localCheckpoint`` (control-
    plane sized — a handful of centroid rows; survives
    ``catalog.clearCache``, so cache-isolated bench passes still reuse
    it, which is exactly the freeze semantics); later calls in the same
    application return the identical frozen relation, so output is
    bit-identical to rebuild by construction (the deterministic Lloyd
    fit would reproduce it anyway — pinned in tests)."""
    app = spark.sparkContext.applicationId
    k = (app,) + key
    if k not in _FROZEN:
        # evict artifacts of stopped applications: a long-lived Python
        # process cycling SparkSessions would otherwise pin dead
        # DataFrames under stale applicationId keys forever
        for stale in [x for x in _FROZEN if x[0] != app]:
            del _FROZEN[stale]
        _FROZEN[k] = build().localCheckpoint()
    return _FROZEN[k]


def _trained_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means codebook as the coarse quantizer: the repo's
    deterministic 2-iteration Lloyd fit (``operators/kmeans.py``, same
    run as ``kmeans_assign``) produces DOUBLE centroids that are
    bit-identical on both engines; fixed-pointing them (floor(x·1e6+.5),
    the ``plans/pq.py`` contract) yields INT64 cells, so everything
    downstream keeps the exact-arithmetic guarantee.  Frozen per
    (application, sf_dir): the fit runs once and every IVFADC variant
    (trained, OPQ, incremental, the variant ablation) shares it."""
    return frozen_artifact(
        spark, ("trained_cells", sf_dir, _fixture_fingerprint(sf_dir)),
        lambda: _fit_trained_cells(spark, sf_dir),
    )


def _fit_trained_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from star_schema_etl_airflow_spark.operators.kmeans import kmeans_fit
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        K as KM_K,
        N_ITER as KM_ITER,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    _, cents = kmeans_fit(emb, KM_K, KM_ITER, dim=64)
    return cents.select(
        F.col("cluster").alias("cell"), F.expr(_SV_S).alias("csv")
    )


def embed_ivfpq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with a TRAINED coarse quantizer — the full production
    pipeline (train → index → search) in one differential query: Lloyd
    k-means fits the cells, the residual codebook re-derives against
    them, candidates encode, queries probe — byte-identical machinery
    to ``embed_ivfpq_topk`` with only the cells relation swapped
    (the seam ``embed_ann_ivf_trained`` documents for flat IVF, now
    closed for the composed index).  The oracle chains the unrolled
    k-means CTEs (``plans/clustering_queries.py``) into the verified
    IVFADC chain."""
    adc, _ = _adc_scores(spark, sf_dir, cells_of=_trained_cells)
    wr = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "cand_id", "cell", "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _trained_oracle() -> str:
    from star_schema_etl_airflow_spark.plans.clustering_queries import (
        KMEANS_CTES,
    )

    band_cells = f"""cells AS (
  SELECT vec_id AS cell, sv AS csv FROM sv
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + {NCELLS}
),"""
    trained_cells = f"""cells AS (
  SELECT cluster AS cell, {_sv_duck('embedding')} AS csv FROM c2
),"""
    assert band_cells in IVFPQ_ORACLE
    body = IVFPQ_ORACLE.replace(band_cells, trained_cells)
    # splice the kmeans CTE chain in front of the (verified) IVFADC chain
    return body.replace("\nWITH sv AS (", f"\nWITH {KMEANS_CTES},\nsv AS (")


register(QuerySpec("embed_ivfpq_trained", embed_ivfpq_trained,
                   mat_ctes(_trained_oracle()),
                   tags=("llm", "ann", "KMEANS")))
