"""Z-order (Morton curve) layout effectiveness audit — how much scan a
multi-column predicate skips under a space-filling-curve clustering vs
the natural single-column (ingest-date) layout.

At 100 TB the dominant cost is the scan, and the dominant scan saver is
file/row-group min-max skipping (the mechanism operators/skipping.py
implements).  Skipping on ONE column falls out of date-partitioned
ingest for free; a predicate that also bounds a SECOND column (here
``l_extendedprice``) skips nothing on that axis unless the layout
interleaves both — which is exactly what Z-ordering does: sort by the
bit-interleaved key of both quantized columns, cut into equal key-range
files, and every file's min-max box becomes tight in BOTH dimensions.

This operator is the auditor for that decision: it lays the fact table
out both ways (value-range file cuts — the deterministic equivalent of
``repartitionByRange``'s sampled boundaries), computes each file's
min-max stats exactly as a parquet footer would hold them, applies the
standard interval-intersection pruning rule, and reports files/rows
scanned per layout for a fixed 2-D predicate.  Everything is
closed-form integer/IEEE arithmetic, so the DuckDB oracle reproduces it
exactly.

Quantization: 8 bits per dimension (day index ÷ 10, price ÷ 420 —
fixed literals clamped to [0, 255]); the 16-bit Morton key interleaves
x into even and y into odd bit positions.  A HILBERT key (order 8,
the classic xy→d rotation walk unrolled into 8 data-independent
projection steps — no loop, no UDF) is audited alongside: Hilbert's
consecutive positions are always grid-adjacent (Morton takes long
jumps at quadrant boundaries), so its key-range files have
tighter-or-equal min-max boxes on average.  64 files per layout:
linear cuts on ``x8 div 4`` (40-day ranges), the curves on
``key div 1024`` (the top 3 bits of each dimension).  The audited
winner is WRITABLE: ``sources/io.py::write_hilbert`` lays real parquet
files out by the same curve (shared step generator), and
``tests/test_zorder_layout.py`` pins that the written footers realize
the audit's predicted pruning.

Scale design: ONE corpus scan — each row emits its two (layout, file)
assignments through a 2-element explode, and the per-file stats are a
single groupBy(layout, file) with map-side partial aggregation; the
per-layout rollup then aggregates 128 rows.  No joins, no windows, no
driver-side iteration.  The same plan shape audits any candidate
layout list (add a struct to the array), which is how a table-layout
optimizer would A/B a clustering change before rewriting 100 TB.

Reference parity: beyond-reference (the reference relies on BigQuery's
implicit clustering; this makes the layout decision measurable).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table
from star_schema_etl_airflow_spark.sources.io import hilbert_steps

EPOCH = datetime.date(1995, 1, 1)   # fixture l_shipdate starts 1995-01-02
DAY_Q = 10                          # days per x-quantum (2500-day span → 250)
PRICE_Q = 420.0                     # price per y-quantum (105k span → 250)
BITS = 8
N_FILES = 64

# 2-D predicate: a ~3-month date window AND a price band
PRED_D1 = (datetime.date(1996, 3, 1) - EPOCH).days
PRED_D2 = (datetime.date(1996, 5, 31) - EPOCH).days
PRED_P1 = 30000.0
PRED_P2 = 40000.0


def _interleave(x: str, y: str, div: str) -> str:
    """16-bit Morton key: x in even, y in odd bit positions — pure
    integer div/mod so Spark (``div``) and DuckDB (``//``) agree."""
    terms = []
    for i in range(BITS):
        terms.append(f"(({x} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def morton16(x: int, y: int) -> int:
    """Python twin of :func:`_interleave` (test oracle)."""
    z = 0
    for i in range(BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


# --- Hilbert curve (order BITS, the locality upgrade over Morton) ----------
#
# The classic xy→d walk (Wikipedia's rot() formulation) is 8 data-
# independent steps of integer arithmetic and CASE rotations, so it
# unrolls into a staged projection chain both engines evaluate
# identically — no loops, no UDF.

_N = 1 << BITS  # 256


def _hilbert_steps(div: str) -> list[tuple[str, str, str]]:
    """Per-step (hd, hx, hy) replacement expressions over the previous
    step's columns of the same names — the shared generator that also
    powers the ``write_hilbert`` file writer (``sources/io.py``), so the
    audited layout and the written layout use the SAME curve."""
    return hilbert_steps(BITS, div)


def hilbert_d(x: int, y: int) -> int:
    """Python twin of :func:`_hilbert_steps` (test oracle)."""
    d = 0
    s = _N // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = _N - 1 - x
                y = _N - 1 - y
            x, y = y, x
        s //= 2
    return d


_CLAMP_S = (
    f"least({255}, greatest(0, cast(datediff(cast(l_shipdate as date), "
    f"date'{EPOCH.isoformat()}') as bigint) div {DAY_Q})) as x8",
    f"least({255}, greatest(0, cast(floor(l_extendedprice / {PRICE_Q}) "
    f"as bigint))) as y8",
)


def zorder_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    )
    # r16 optimization (guide §2.3 "decide with small rows" / §8): every
    # curve key and file assignment is a pure function of the quantized
    # cell (x8, y8) — a ≤256² relation — while min/max/count/matching
    # are grain-compatible aggregates.  So the corpus scan computes ONLY
    # the cheap quantization + per-cell partial stats (map-side combine,
    # ≤65,536 groups shuffled), and the 32-term Morton interleave, the
    # 8-step Hilbert walk and the ×3 layout explode run on the CELL
    # relation.  Before: all three ran per corpus row on a scan stage
    # whose parallelism is capped by the input's row-group count
    # (measured 3.65 s task time in ONE 3-task stage at sf0.1); after:
    # per-row work is datediff + two divisions, and the heavy key math
    # touches ≤65,536 rows regardless of corpus size — at 100 TB that is
    # the difference between 10¹² and 6.5·10⁴ Hilbert evaluations.
    # Aggregate-of-aggregate identities (min∘min, max∘max, sum∘count,
    # sum∘sum over exact ints) keep the result bit-identical.
    match = (
        (F.col("d") >= PRED_D1)
        & (F.col("d") <= PRED_D2)
        & (F.col("p") >= PRED_P1)
        & (F.col("p") <= PRED_P2)
    ).cast("long")
    cells = (
        li.select(
            F.expr(_CLAMP_S[0]),
            F.expr(_CLAMP_S[1]),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit(EPOCH.isoformat()).cast("date"),
            ).alias("d"),
            F.col("l_extendedprice").alias("p"),
        )
        .groupBy("x8", "y8")
        .agg(
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
            F.min("p").alias("min_p"),
            F.max("p").alias("max_p"),
            F.count("*").alias("rows"),
            F.sum(match).alias("matching"),
        )
    )
    base = (
        cells.withColumn("z16", F.expr(_interleave("x8", "y8", "div")))
        .withColumn("hx", F.col("x8"))
        .withColumn("hy", F.col("y8"))
        .withColumn("hd", F.lit(0).cast("bigint"))
    )
    for d_e, x_e, y_e in _hilbert_steps("div"):
        base = base.withColumns(
            {"hd": F.expr(d_e), "hx": F.expr(x_e), "hy": F.expr(y_e)}
        )

    stat_cols = ["min_d", "max_d", "min_p", "max_p", "rows", "matching"]
    assigned = base.select(
        *stat_cols,
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.expr(f"x8 div {256 // N_FILES}").alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"z16 div {65536 // N_FILES}").alias("file_id"),
                ),
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.expr(f"hd div {65536 // N_FILES}").alias("file_id"),
                ),
            )
        ).alias("a"),
    ).select(*stat_cols, "a.layout", "a.file_id")

    files = assigned.groupBy("layout", "file_id").agg(
        F.min("min_d").alias("min_d"),
        F.max("max_d").alias("max_d"),
        F.min("min_p").alias("min_p"),
        F.max("max_p").alias("max_p"),
        F.sum("rows").alias("rows"),
        F.sum("matching").alias("matching"),
    )
    scanned = (
        (F.col("max_d") >= PRED_D1)
        & (F.col("min_d") <= PRED_D2)
        & (F.col("max_p") >= PRED_P1)
        & (F.col("min_p") <= PRED_P2)
    ).cast("long")
    return files.groupBy("layout").agg(
        F.count("*").alias("files_total"),
        F.sum(scanned).alias("files_scanned"),
        F.sum("rows").alias("rows_total"),
        F.sum(F.col("rows") * scanned).alias("rows_scanned"),
        F.sum("matching").alias("rows_matching"),
    )


_X8_D = (
    f"LEAST(255, GREATEST(0, date_diff('day', DATE '{EPOCH.isoformat()}', "
    f"CAST(l_shipdate AS DATE)) // {DAY_Q}))"
)
_Y8_D = (
    f"LEAST(255, GREATEST(0, CAST(FLOOR(l_extendedprice / {PRICE_Q}) "
    f"AS BIGINT)))"
)

def _hilbert_ctes() -> str:
    """h1..h{BITS} chained CTEs rewriting (hd, hx, hy) per step."""
    out = []
    prev = "h0"
    for i, (d_e, x_e, y_e) in enumerate(_hilbert_steps("//"), start=1):
        out.append(
            f"h{i} AS (\n  SELECT d, p, x8, z16, {d_e} AS hd, "
            f"{x_e} AS hx, {y_e} AS hy FROM {prev}\n)"
        )
        prev = f"h{i}"
    return ",\n".join(out)


ZORDER_ORACLE = f"""
WITH base AS (
  SELECT {_X8_D} AS x8, {_Y8_D} AS y8,
         date_diff('day', DATE '{EPOCH.isoformat()}',
                   CAST(l_shipdate AS DATE)) AS d,
         l_extendedprice AS p
  FROM lineitem
),
keyed AS (
  SELECT d, p, x8, y8, {_interleave("x8", "y8", "//")} AS z16 FROM base
),
h0 AS (
  SELECT d, p, x8, z16, CAST(0 AS BIGINT) AS hd, x8 AS hx, y8 AS hy
  FROM keyed
),
{_hilbert_ctes()},
assigned AS (
  SELECT d, p, 'linear' AS layout, x8 // {256 // N_FILES} AS file_id
  FROM keyed
  UNION ALL
  SELECT d, p, 'zorder' AS layout, z16 // {65536 // N_FILES} AS file_id
  FROM keyed
  UNION ALL
  SELECT d, p, 'hilbert' AS layout, hd // {65536 // N_FILES} AS file_id
  FROM h{BITS}
),
files AS (
  SELECT layout, file_id,
         MIN(d) AS min_d, MAX(d) AS max_d,
         MIN(p) AS min_p, MAX(p) AS max_p,
         COUNT(*) AS rows,
         SUM(CASE WHEN d BETWEEN {PRED_D1} AND {PRED_D2}
                   AND p BETWEEN {PRED_P1} AND {PRED_P2}
                  THEN 1 ELSE 0 END) AS matching
  FROM assigned GROUP BY 1, 2
),
flagged AS (
  SELECT *, CASE WHEN max_d >= {PRED_D1} AND min_d <= {PRED_D2}
                  AND max_p >= {PRED_P1} AND min_p <= {PRED_P2}
                 THEN 1 ELSE 0 END AS scanned
  FROM files
)
SELECT layout,
       COUNT(*) AS files_total,
       CAST(SUM(scanned) AS BIGINT) AS files_scanned,
       CAST(SUM(rows) AS BIGINT) AS rows_total,
       CAST(SUM(rows * scanned) AS BIGINT) AS rows_scanned,
       CAST(SUM(matching) AS BIGINT) AS rows_matching
FROM flagged GROUP BY 1
"""

register(QuerySpec("zorder_skip_stats", zorder_skip_stats, ZORDER_ORACLE,
                   tags=("LAYOUT",)))
