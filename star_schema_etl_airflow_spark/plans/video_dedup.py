"""Video temporal near-duplicate detection — frame-sequence
fingerprints with banded candidate alignment (the last gap in the
multimodal dedup family: `video_frames` extracts frames, `image_*`
dedups stills; this composes them into sequence-level dedup, the
standard shape of published video copy-detection pipelines:
per-frame perceptual hash → temporal shingles → inverted-index
candidate join → alignment verify).

Pipeline:

1. **Frame sampling**: every ``VSEQ_DOC_MOD``-th document is a video
   of ``6 + doc_id % 3`` frames.  Frames are REAL 18×16 grayscale
   PNGs (deterministic pixels, the `image_dedup` formula keyed by a
   per-frame motif) decoded by the production ``_png_decode`` inside
   an Arrow ``mapInPandas`` kernel — the frame-sample-in-object-store
   shape a real pipeline has after ffmpeg sampling (the AVI container
   walk itself is differentially covered by ``video_frames``).
2. **Per-frame dHash**: the shared integer-exact 64-bit dHash
   (`image_dedup.dhash_bands_from_png`), carried as a band string.
3. **Temporal shingles**: w=2 consecutive frame hashes, md5-keyed —
   robust to the corpus's injected temporal misalignment (every other
   same-motif copy starts one frame later) because a one-frame shift
   preserves all interior shingles.
4. **Candidates**: inverted-index join on the shingle key (distinct
   (video, shingle) — never all-pairs), counting shared shingles at
   generation time (no second verify join).
5. **Verify**: shingle-set Jaccard ≥ ``VSEQ_SIM``.

Corpus structure (closed-form, mirrored by the oracle): videos share
a motif *base* (same base ⇒ same frame sequence), with a brightness
shift (dHash-invariant) and a one-frame temporal offset on alternating
copies.  The base count is CORPUS-SIZE-DERIVED (``vseq_bases``:
≈ one base per 22 documents, floor 23) — the SemDeDup K∝n lesson
applied at design time: motif diversity grows with a real corpus, so
per-shingle bucket occupancy stays flat and candidate volume grows
LINEARLY in corpus size (measured in ``tools/video_curve.py``; with
bases held fixed the same join is quadratic).

Scale shape: hashing is map-only Arrow; the only shuffles are the
distinct on (video, shingle) and the shingle-keyed count join — both
fixed-width keys; per-bucket skew is bounded by the flat occupancy the
curve pins.

Cited reference behavior: none in /root/reference (no multimodal
surface); published-method parity (frame-fingerprint shingling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.plans.image_dedup import (
    BAND_BITS,
    CELL,
    DHASH_BANDS,
    GRID_H,
    GRID_W,
    IMG_H,
    IMG_W,
    PAT_MOD,
    SHIFT_MOD,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

VSEQ_DOC_MOD = 2        # every 2nd document is a video
VSEQ_MIN_FRAMES = 6     # n_frames = VSEQ_MIN_FRAMES + doc_id % VSEQ_VAR
VSEQ_VAR = 3
VSEQ_BASE_FLOOR = 23    # minimum motif-base count
VSEQ_DOCS_PER_BASE = 22  # bases ≈ n_docs / 22 → flat copies-per-base
MOTIF_P = 2147483647    # motif range (Mersenne 2^31-1)
MIX_M = 2147483648      # 2^31 — mix modulus
MIX_A = 2654435761      # Knuth multiplicative constants
MIX_B = 1103515245
VSEQ_SIM = 0.25         # shingle-Jaccard verify threshold
SIM_DECIMALS = 9


def vseq_bases(n_docs: int) -> int:
    """Corpus-size-derived motif-base count (K∝n: flat bucket
    occupancy ⇒ linear candidate growth), forced ODD so it is coprime
    with the video sampling stride (``VSEQ_DOC_MOD`` = 2): an even
    base count would let even doc_ids reach only half the residues,
    silently doubling copies-per-base (caught by the ×4 curve
    anchor)."""
    b = max(VSEQ_BASE_FLOOR, n_docs // VSEQ_DOCS_PER_BASE)
    return b + (1 - b % 2)


def _copy_ordinal(doc_id: int, base_mod: int) -> int:
    """Ordinal of this copy within its base group.  Derived from
    ``doc_id // (VSEQ_DOC_MOD · base_mod)`` — NOT ``doc_id //
    base_mod``: the latter is parity-coupled with the even-doc_id
    sampling stride (base_mod is odd, so every sampled copy of a base
    shares the same ``(doc_id // base_mod) % 2``), which would silence
    the temporal-offset feature entirely (caught by
    ``tests/test_video_dedup.py``)."""
    return doc_id // (VSEQ_DOC_MOD * base_mod)


def _frame_motif(doc_id: int, f: int, base_mod: int) -> int:
    off = _copy_ordinal(doc_id, base_mod) % 2
    return ((doc_id % base_mod) * 1000003
            + (f + off) * 10007) % MOTIF_P


def _cell_base(motif: int, gx: int, gy: int) -> int:
    """Per-cell pseudo-random luminance in [0, PAT_MOD): a two-round
    multiplicative-xor mix of (motif, gx, gy).  A gradient formula
    (the image_dedup pattern) caps at a few hundred distinct dHashes
    and re-introduces quadratic cross-base collisions once the
    corpus-derived base count passes it; the mix gives ~one distinct
    hash PER base (measured: 50k/50k), which is what keeps candidate
    growth linear.  All-integer, identical in Spark SQL and DuckDB."""
    h = (motif + gx * 131 + gy * 137) * MIX_A % MIX_M
    h = ((h ^ (h >> 15)) * MIX_B) % MIX_M
    return (h ^ (h >> 12)) % PAT_MOD


def _frame_png(motif: int, shift: int) -> bytes:
    """The 18×16 frame image for a (motif, shift) pair — the single
    pixel-synthesis path shared by the at-rest kernel and the delta
    kernel (a formula change must hit both or the recrawl-matches-
    source property silently breaks at probe time)."""
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_encode,
    )

    px = bytearray()
    for y in range(IMG_H):
        gy = y // CELL
        for x in range(IMG_W):
            gx = x // CELL
            px.append(_cell_base(motif, gx, gy) + shift)
    return _png_encode(bytes(px), IMG_W, IMG_H, color_type=0)


def _synth_frame_png(doc_id: int, f: int, base_mod: int) -> bytes:
    return _frame_png(
        _frame_motif(doc_id, f, base_mod),
        _copy_ordinal(doc_id, base_mod) % SHIFT_MOD,
    )


def _frame_hash_kernel(base_mod: int):
    def kernel(batches):
        import pandas as pd

        from star_schema_etl_airflow_spark.plans.image_dedup import (
            dhash_bands_from_png,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % VSEQ_DOC_MOD != 0:
                    continue
                n = VSEQ_MIN_FRAMES + doc_id % VSEQ_VAR
                for f in range(n):
                    bands = dhash_bands_from_png(
                        _synth_frame_png(doc_id, f, base_mod)
                    )
                    rows.append(
                        (doc_id, f, "_".join(str(b) for b in bands))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "f", "h"])

    return kernel


def video_frame_hashes(docs: DataFrame, base_mod: int) -> DataFrame:
    """(doc_id, f, h): per-frame dHash strings via the production PNG
    decode (Arrow map-only)."""
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        _spread,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("f", T.IntegerType()),
        T.StructField("h", T.StringType()),
    ])
    return _spread(docs.select("doc_id")).mapInPandas(
        _frame_hash_kernel(base_mod), schema=schema
    )


def video_sequence_pairs(docs: DataFrame, base_mod: int) -> DataFrame:
    """(vid_a, vid_b, n_shared, sim): temporal near-dup pairs via the
    shingle inverted index — shared-shingle counts are produced BY the
    candidate join's groupBy (one shuffle, no re-verify join)."""
    from star_schema_etl_airflow_spark.functions.caching import (
        persist_once,
    )

    sh = persist_once(_shingles_of(video_frame_hashes(docs, base_mod)))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pa, pb = sh.alias("a"), sh.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("vid_a"),
            F.col("b.doc_id").alias("vid_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("vid_a"),
                      F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("vid_b"),
                      F.col("n_sh").alias("nb"))
    return (
        cand.join(sa, "vid_a").join(sb, "vid_b")
        .select(
            "vid_a", "vid_b", F.col("n_shared").cast("long")
            .alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
                .cast("double"),
                SIM_DECIMALS,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= VSEQ_SIM)
    )


def video_dedup_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base_mod = vseq_bases(docs.count())
    return video_sequence_pairs(docs, base_mod)


# --- DuckDB oracle (closed-form pixel/cell formula, same shingle join) ------


_BASE_MOD_SQL = (
    f"(SELECT b + (1 - b % 2) FROM (SELECT GREATEST({VSEQ_BASE_FLOOR}, "
    f"(SELECT COUNT(*) FROM documents) // {VSEQ_DOCS_PER_BASE}) AS b))"
)

_BAND_COLS = ",\n         ".join(
    f"SUM(CASE WHEN bitpos >= {k * BAND_BITS} "
    f"AND bitpos < {(k + 1) * BAND_BITS} "
    f"THEN bit << (bitpos - {k * BAND_BITS}) ELSE 0 END) AS b{k}"
    for k in range(DHASH_BANDS)
)

VIDEO_DEDUP_ORACLE = f"""
WITH bm AS (SELECT {_BASE_MOD_SQL} AS m),
vids AS (
  SELECT doc_id,
         {VSEQ_MIN_FRAMES} + doc_id % {VSEQ_VAR} AS n,
         doc_id % bm.m AS base,
         (doc_id // ({VSEQ_DOC_MOD} * bm.m)) % 2 AS off,
         (doc_id // ({VSEQ_DOC_MOD} * bm.m)) % {SHIFT_MOD} AS shift
  FROM documents, bm
  WHERE doc_id % {VSEQ_DOC_MOD} = 0
),
vf AS (
  SELECT doc_id, f.f,
         (base * 1000003 + (f.f + off) * 10007) % {MOTIF_P} AS motif,
         shift
  FROM vids, LATERAL unnest(range(0, n)) AS f(f)
),
vmix AS (
  SELECT doc_id, f, gy, gx, shift,
         ((xor(h1, h1 >> 15) * {MIX_B}) % {MIX_M}) AS h2
  FROM (
    SELECT doc_id, f, gy.g AS gy, gx.g AS gx, shift,
           ((motif + gx.g * 131 + gy.g * 137) * {MIX_A}) % {MIX_M} AS h1
    FROM vf,
         generate_series(0, {GRID_W - 1}) gx(g),
         generate_series(0, {GRID_H - 1}) gy(g)
  )
),
vcells AS (
  SELECT doc_id, f, gy, gx,
         {CELL * CELL} * (xor(h2, h2 >> 12) % {PAT_MOD} + shift) AS cell
  FROM vmix
),
vbits AS (
  SELECT a.doc_id, a.f, (a.gy * {GRID_W - 1} + a.gx) AS bitpos,
         CASE WHEN a.cell > b.cell THEN 1 ELSE 0 END AS bit
  FROM vcells a
  JOIN vcells b ON a.doc_id = b.doc_id AND a.f = b.f
               AND a.gy = b.gy AND b.gx = a.gx + 1
  WHERE a.gx < {GRID_W - 1}
),
vhash AS (
  SELECT doc_id, f,
         {_BAND_COLS}
  FROM vbits GROUP BY doc_id, f
),
vh AS (
  SELECT doc_id, f,
         b0::VARCHAR || '_' || b1::VARCHAR || '_' || b2::VARCHAR
           || '_' || b3::VARCHAR AS h
  FROM vhash
),
vsh AS (
  SELECT DISTINCT a.doc_id, md5(a.h || '|' || b.h) AS shingle
  FROM vh a JOIN vh b ON a.doc_id = b.doc_id AND b.f = a.f + 1
),
vsizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM vsh GROUP BY doc_id
),
vcand AS (
  SELECT a.doc_id AS vid_a, b.doc_id AS vid_b, COUNT(*) AS n_shared
  FROM vsh a JOIN vsh b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.vid_a, c.vid_b, CAST(c.n_shared AS BIGINT) AS n_shared,
       ROUND(CAST(c.n_shared AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - c.n_shared AS DOUBLE),
             {SIM_DECIMALS}) AS sim
FROM vcand c
JOIN vsizes sa ON sa.doc_id = c.vid_a
JOIN vsizes sb ON sb.doc_id = c.vid_b
WHERE ROUND(CAST(c.n_shared AS DOUBLE)
            / CAST(sa.n_sh + sb.n_sh - c.n_shared AS DOUBLE),
            {SIM_DECIMALS}) >= {VSEQ_SIM}
"""

register(QuerySpec("video_dedup_sequence", video_dedup_sequence,
                   VIDEO_DEDUP_ORACLE, tags=("LLM-dedup", "multimodal")))


# --- incremental (delta-vs-corpus) probe ------------------------------------

# The recurring-crawl shape (the dedup_incremental / semdedup_incremental
# conventions): a delta batch of newly-ingested videos is probed against
# the AT-REST corpus's standing shingle index — the corpus side is one
# standing relation (at deployment: a stored inverted index, bucketed by
# shingle), never re-paired against itself, and only the delta is hashed
# fresh.  Synthetic delta, closed-form on both engines:
#  - re-ingested copies of every 6th at-rest video (id + 6M) with a NEW
#    brightness shift and a flipped one-frame temporal offset (ordinal
#    + 1) — the probe must match them to their sources;
#  - genuinely-new videos for every 10th (id + 7M): a salted motif
#    stream no at-rest video shares — must match nothing.

VDELTA_RECRAWL_OFFSET = 6_000_000
VDELTA_FRESH_OFFSET = 7_000_000
VDELTA_RECRAWL_MOD = 6
VDELTA_FRESH_MOD = 10
FRESH_SALT = 999_983


def _delta_frame_hash_kernel(base_mod: int):
    def kernel(batches):
        import pandas as pd

        from star_schema_etl_airflow_spark.plans.image_dedup import (
            dhash_bands_from_png,
        )
        png = _frame_png

        for pdf in batches:
            rows = []
            for src in pdf["doc_id"]:
                src = int(src)
                if src % VSEQ_DOC_MOD != 0:
                    continue
                n = VSEQ_MIN_FRAMES + src % VSEQ_VAR
                cop = _copy_ordinal(src, base_mod)
                if src % VDELTA_RECRAWL_MOD == 0:
                    off = (cop + 1) % 2           # flipped offset
                    shift = (cop + 1) % SHIFT_MOD  # new brightness
                    for f in range(n):
                        motif = ((src % base_mod) * 1000003
                                 + (f + off) * 10007) % MOTIF_P
                        bands = dhash_bands_from_png(png(motif, shift))
                        rows.append((
                            src + VDELTA_RECRAWL_OFFSET, f,
                            "_".join(str(b) for b in bands),
                        ))
                if src % VDELTA_FRESH_MOD == 0:
                    off = cop % 2
                    shift = cop % SHIFT_MOD
                    for f in range(n):
                        motif = ((src % base_mod) * 1000003
                                 + (f + off) * 10007
                                 + FRESH_SALT) % MOTIF_P
                        bands = dhash_bands_from_png(png(motif, shift))
                        rows.append((
                            src + VDELTA_FRESH_OFFSET, f,
                            "_".join(str(b) for b in bands),
                        ))
            yield pd.DataFrame(rows, columns=["doc_id", "f", "h"])

    return kernel


def _shingles_of(frames: DataFrame) -> DataFrame:
    a, b = frames.alias("fa"), frames.alias("fb")
    return (
        a.join(
            b,
            (F.col("fa.doc_id") == F.col("fb.doc_id"))
            & (F.col("fb.f") == F.col("fa.f") + 1),
        )
        .select(
            F.col("fa.doc_id").alias("doc_id"),
            F.expr("md5(concat(fa.h, '|', fb.h))").alias("shingle"),
        )
        .distinct()
    )


def video_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(delta_id, corpus_id, n_shared, sim): delta videos probed
    against the at-rest shingle index — delta × at-rest pairs ONLY
    (no at-rest self-pairing, no corpus re-pairing), the standing-
    index join a recurring crawl runs."""
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.functions.caching import (
        persist_once,
    )
    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        _spread,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base_mod = vseq_bases(docs.count())
    at_rest = persist_once(
        _shingles_of(video_frame_hashes(docs, base_mod))
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("f", T.IntegerType()),
        T.StructField("h", T.StringType()),
    ])
    delta_frames = _spread(docs.select("doc_id")).mapInPandas(
        _delta_frame_hash_kernel(base_mod), schema=schema
    )
    delta = persist_once(_shingles_of(delta_frames))
    na = at_rest.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nc"))
    nd = delta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nd"))
    d, c = delta.alias("d"), at_rest.alias("c")
    cand = (
        d.join(c, F.col("d.shingle") == F.col("c.shingle"))
        .groupBy(
            F.col("d.doc_id").alias("delta_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        cand
        .join(nd.select(F.col("doc_id").alias("delta_id"), "nd"),
              "delta_id")
        .join(na.select(F.col("doc_id").alias("corpus_id"), "nc"),
              "corpus_id")
        .select(
            "delta_id", "corpus_id",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("nd") + F.col("nc") - F.col("n_shared"))
                .cast("double"),
                SIM_DECIMALS,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= VSEQ_SIM)
    )


VIDEO_INCR_ORACLE = f"""
WITH bm AS (SELECT {_BASE_MOD_SQL} AS m),
vids AS (
  SELECT doc_id,
         {VSEQ_MIN_FRAMES} + doc_id % {VSEQ_VAR} AS n,
         doc_id % bm.m AS base,
         (doc_id // ({VSEQ_DOC_MOD} * bm.m)) AS cop
  FROM documents, bm
  WHERE doc_id % {VSEQ_DOC_MOD} = 0
),
allf AS (
  SELECT doc_id, f.f,
         (base * 1000003 + (f.f + cop % 2) * 10007) % {MOTIF_P} AS motif
  FROM vids, LATERAL unnest(range(0, n)) AS f(f)
  UNION ALL
  SELECT doc_id + {VDELTA_RECRAWL_OFFSET}, f.f,
         (base * 1000003 + (f.f + (cop + 1) % 2) * 10007) % {MOTIF_P}
  FROM vids, LATERAL unnest(range(0, n)) AS f(f)
  WHERE doc_id % {VDELTA_RECRAWL_MOD} = 0
  UNION ALL
  SELECT doc_id + {VDELTA_FRESH_OFFSET}, f.f,
         (base * 1000003 + (f.f + cop % 2) * 10007 + {FRESH_SALT})
           % {MOTIF_P}
  FROM vids, LATERAL unnest(range(0, n)) AS f(f)
  WHERE doc_id % {VDELTA_FRESH_MOD} = 0
),
vmix AS (
  SELECT doc_id, f, gy, gx,
         ((xor(h1, h1 >> 15) * {MIX_B}) % {MIX_M}) AS h2
  FROM (
    SELECT doc_id, f, gy.g AS gy, gx.g AS gx,
           ((motif + gx.g * 131 + gy.g * 137) * {MIX_A}) % {MIX_M} AS h1
    FROM allf,
         generate_series(0, {GRID_W - 1}) gx(g),
         generate_series(0, {GRID_H - 1}) gy(g)
  )
),
vcells AS (
  SELECT doc_id, f, gy, gx,
         {CELL * CELL} * (xor(h2, h2 >> 12) % {PAT_MOD}) AS cell
  FROM vmix
),
vbits AS (
  SELECT a.doc_id, a.f, (a.gy * {GRID_W - 1} + a.gx) AS bitpos,
         CASE WHEN a.cell > b.cell THEN 1 ELSE 0 END AS bit
  FROM vcells a
  JOIN vcells b ON a.doc_id = b.doc_id AND a.f = b.f
               AND a.gy = b.gy AND b.gx = a.gx + 1
  WHERE a.gx < {GRID_W - 1}
),
vhash AS (
  SELECT doc_id, f,
         {_BAND_COLS}
  FROM vbits GROUP BY doc_id, f
),
vh AS (
  SELECT doc_id, f,
         b0::VARCHAR || '_' || b1::VARCHAR || '_' || b2::VARCHAR
           || '_' || b3::VARCHAR AS h
  FROM vhash
),
vsh AS (
  SELECT DISTINCT a.doc_id, md5(a.h || '|' || b.h) AS shingle
  FROM vh a JOIN vh b ON a.doc_id = b.doc_id AND b.f = a.f + 1
),
atr AS (SELECT * FROM vsh WHERE doc_id < {VDELTA_RECRAWL_OFFSET}),
dlt AS (SELECT * FROM vsh WHERE doc_id >= {VDELTA_RECRAWL_OFFSET}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM vsh GROUP BY doc_id),
vcand AS (
  SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
         COUNT(*) AS n_shared
  FROM dlt d JOIN atr c ON d.shingle = c.shingle
  GROUP BY 1, 2
)
SELECT v.delta_id, v.corpus_id, CAST(v.n_shared AS BIGINT) AS n_shared,
       ROUND(CAST(v.n_shared AS DOUBLE)
             / CAST(sd.n_sh + sc.n_sh - v.n_shared AS DOUBLE),
             {SIM_DECIMALS}) AS sim
FROM vcand v
JOIN sizes sd ON sd.doc_id = v.delta_id
JOIN sizes sc ON sc.doc_id = v.corpus_id
WHERE ROUND(CAST(v.n_shared AS DOUBLE)
            / CAST(sd.n_sh + sc.n_sh - v.n_shared AS DOUBLE),
            {SIM_DECIMALS}) >= {VSEQ_SIM}
"""

register(QuerySpec("video_dedup_incremental", video_dedup_incremental,
                   VIDEO_INCR_ORACLE, tags=("LLM-dedup", "multimodal")))
