"""Perceptual-hash image near-duplicate join (dHash over decoded PNGs).

The text side of the dedup family (exact / MinHash / SimHash / PPJoin /
SemDeDup) has no multimodal counterpart in the repo until now, yet a
training-data pipeline dedupes images with exactly this recipe: decode
→ downscale to a tiny luminance grid → difference hash (dHash: one bit
per adjacent-cell comparison, Krawetz's variant of Charikar-style
sketches) → hamming-banded self-join.  The hash is invariant to uniform
brightness shifts (differences are unchanged) and robust to small local
edits (each cell touches ≤ 2 bits), which is what makes it a *near*-dup
key where a byte hash is an exact-dup key.

Pipeline (all sizes in cells, integer-exact end to end):

1. read a REAL 18×16 grayscale PNG blob per document from the
   materialized ``media(doc_id, png, wav)`` parquet table
   (``sources/media_fixture.py`` — pixels are a deterministic
   function of ``doc_id``, so the DuckDB oracle stays closed-form)
   and decode it with the production decoder
   (``sources/multimodal._png_decode``): parquet binary column →
   Arrow batch → decode, the read path a 100 TB pipeline stresses.
   Callers without stored media (the amplified curation corpus)
   fall back to in-kernel synthesis of the identical bytes;
2. area-reduce to a 9×8 grid of 2×2-block SUMS (integer sums, not
   float means — equal block sizes make the comparison identical and
   keep both engines bit-exact);
3. dHash: bit(gx, gy) = cell(gx, gy) > cell(gx+1, gy) for gx ∈ 0..7,
   gy ∈ 0..7 → 64 bits, packed as four 16-bit bands;
4. candidates: band-equality self-join (the ``dedup_simhash`` banding
   shape — never all-pairs).  With 4 disjoint bands and a hamming
   threshold of 3, the pigeonhole principle makes recall EXACT: ≤ 3
   differing bits cannot touch all 4 bands, so every qualifying pair
   shares at least one band verbatim;
5. verify: full 64-bit hamming distance ≤ 3 on candidates.

Scale shape: the hash extraction is a map-only Arrow ``mapInPandas``
over the binary column (embarrassingly parallel; at corpus scale the
blobs arrive pre-split and the fixture repartition is dropped); the
self-join shuffles on (band_idx, band_key) — 4 rows per image — and the
verify joins back a 4-int relation.  No stage is ever quadratic in the
corpus; bucket skew (many images sharing a band) is near-dup skew the
same salting/AQE story as the text dedups.

Reference parity note: the reference (Airflow + BigQuery star-schema
ETL) has no multimodal surface; this operator extends the engine's
LLM-curation family (SURVEY.md "beyond the reference" scope).

Synthetic corpus structure (closed-form, shared with the oracle):

    base  = doc_id % 41        -- 41 visual motifs
    shift = (doc_id // 41) % 17 -- uniform brightness offset (hash-invariant)
    bump  = doc_id % 3 == 0     -- +30 on the top-left 2×2 block (≤ 1 bit)
    pixel(x, y) = (base*7 + (x//2)*13 + (y//2)*29) % 200 + shift [+ bump]

so every (base)-group collapses to ≤ 2 hash variants within hamming 1
of each other — genuine near-dup clusters with known structure — while
distinct bases are (deterministically) far apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.registry import QuerySpec, register

GRID_W, GRID_H = 9, 8          # dHash grid (9 cols → 8 comparisons/row)
CELL = 2                       # pixels per cell edge → 18×16 image
IMG_W, IMG_H = GRID_W * CELL, GRID_H * CELL
N_BASES = 41                   # distinct motifs in the synthetic corpus
SHIFT_MOD = 17                 # brightness shift range (hash-invariant)
PAT_MOD = 200                  # pattern value range (200+16+30 < 256)
BUMP = 30                      # per-pixel bump on cell (0,0) (≤ 1 bit)
DHASH_BANDS, BAND_BITS = 4, 16
HAMMING_T = 3                  # < DHASH_BANDS ⇒ pigeonhole-exact recall


def _synth_png(doc_id: int) -> bytes:
    """Deterministic grayscale PNG for ``doc_id`` (see module docstring
    for the closed-form pixel formula the oracle mirrors)."""
    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_encode,
    )

    base = doc_id % N_BASES
    shift = (doc_id // N_BASES) % SHIFT_MOD
    bump = BUMP if doc_id % 3 == 0 else 0
    px = bytearray()
    for y in range(IMG_H):
        gy = y // CELL
        for x in range(IMG_W):
            gx = x // CELL
            v = (base * 7 + gx * 13 + gy * 29) % PAT_MOD + shift
            if gx == 0 and gy == 0:
                v += bump
            px.append(v)
    return _png_encode(bytes(px), IMG_W, IMG_H, color_type=0)


def _dhash_kernel(batches):
    """Arrow batch kernel: blob (or synthesized fallback) → decode
    (production decoder) → integer area-reduce → 64-bit dHash as four
    16-bit bands.

    When the batch carries a ``png`` binary column (the materialized
    ``media`` fixture — ``sources/media_fixture.py``) the payload is
    the Arrow-delivered blob, exercising the parquet-binary → Arrow →
    decode path a real pipeline stresses; without it (the amplified
    curation corpus, whose offset doc_ids have no stored media) the
    kernel synthesizes the identical bytes from doc_id."""
    import pandas as pd

    for pdf in batches:
        rows = []
        blobs = pdf["png"] if "png" in pdf.columns else None
        for i, doc_id in enumerate(pdf["doc_id"]):
            doc_id = int(doc_id)
            blob = bytes(blobs.iloc[i]) if blobs is not None \
                else _synth_png(doc_id)
            rows.append((doc_id, *dhash_bands_from_png(blob)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
        )


def dhash_bands_from_png(blob: bytes) -> tuple[int, ...]:
    """Production decode → integer area-reduce → dHash as 4 bands —
    the per-image hash step, shared with the cross-modal cluster
    operator (``plans/curation_clusters.py``)."""
    import numpy as np

    from star_schema_etl_airflow_spark.sources.multimodal import (
        _png_decode,
    )

    img = _png_decode(blob)
    arr = (
        np.frombuffer(img["pixels"], dtype=np.uint8)
        .reshape(img["height"], img["width"])
        .astype(np.int64)
    )
    # 2×2 block sums: equal-sized blocks, so comparing sums is
    # comparing means without ever leaving integer arithmetic
    cells = arr.reshape(GRID_H, CELL, GRID_W, CELL).sum(axis=(1, 3))
    bits = (cells[:, :-1] > cells[:, 1:]).astype(np.int64)  # 8×8
    flat = bits.reshape(-1)  # bitpos = gy*8 + gx
    return tuple(
        int((flat[k * BAND_BITS:(k + 1) * BAND_BITS]
             << np.arange(BAND_BITS)).sum())
        for k in range(DHASH_BANDS)
    )


def dhash_of(docs: DataFrame) -> DataFrame:
    """dHash relation (doc_id, b0..b3) for ANY doc_id relation — the
    per-image decode+hash pass, reusable by the multimodal curation
    composition.  A ``png`` binary column, when present, is decoded as
    the payload (the media-fixture blob path); otherwise the payload is
    synthesized from doc_id (identical bytes by construction)."""
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        _spread,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"b{k}", T.LongType())
           for k in range(DHASH_BANDS)]
    )
    cols = ["doc_id"] + (["png"] if "png" in docs.columns else [])
    # feeds both the band explode and the two verify joins — one decode
    # pass per image, the llm_dedup persist_once pattern
    return persist_once(
        _spread(docs.select(*cols)).mapInPandas(
            _dhash_kernel, schema=schema)
    )


def _dhash_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet binary column → Arrow batch → production decode: the
    # registered query runs the blob-scan read path end to end
    from star_schema_etl_airflow_spark.sources.media_fixture import (
        load_media,
    )

    return dhash_of(load_media(spark, sf_dir).select("doc_id", "png"))


def image_dedup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All image pairs with dHash hamming distance ≤ 3 — EXACT (the
    banding is a pigeonhole-complete candidate generator, the verify is
    the full 64-bit distance), never all-pairs."""
    hashed = _dhash_relation(spark, sf_dir)
    return dhash_pairs(hashed)


def dhash_pairs(hashed: DataFrame) -> DataFrame:
    """Banded pair generation + full-width verify over a dHash relation."""
    band_pairs = ", ".join(f"{k}, b{k}" for k in range(DHASH_BANDS))
    buckets = hashed.select(
        "doc_id",
        F.expr(f"stack({DHASH_BANDS}, {band_pairs}) "
               "as (band_idx, band_key)"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    ha = hashed.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(DHASH_BANDS)],
    )
    hb = hashed.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(DHASH_BANDS)],
    )
    hamming = sum(
        F.expr(f"bit_count(a{k} ^ bb{k})") for k in range(DHASH_BANDS)
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= HAMMING_T)
        .select("id_a", "id_b", "hamming")
    )


def dhash_duck_ctes(src: str = "documents", p: str = "img") -> str:
    """Prefixed CTE chain computing the dHash relation
    ``{p}_hashes(doc_id, b0..b3)`` over ``src`` in DuckDB — the
    composable SQL twin of :func:`dhash_of` (used by this operator's
    oracle and by the multimodal curation composition)."""
    band_cols = ",\n         ".join(
        f"SUM(CASE WHEN bitpos >= {k * BAND_BITS} "
        f"AND bitpos < {(k + 1) * BAND_BITS} "
        f"THEN bit << (bitpos - {k * BAND_BITS}) ELSE 0 END) AS b{k}"
        for k in range(DHASH_BANDS)
    )
    return f"""{p}_cells AS (
  SELECT d.doc_id, gy.g AS gy, gx.g AS gx,
         {CELL * CELL} * ((((d.doc_id % {N_BASES}) * 7 + gx.g * 13
              + gy.g * 29) % {PAT_MOD})
             + ((d.doc_id // {N_BASES}) % {SHIFT_MOD}))
         + CASE WHEN d.doc_id % 3 = 0 AND gx.g = 0 AND gy.g = 0
                THEN {CELL * CELL * BUMP} ELSE 0 END AS cell
  FROM {src} d,
       generate_series(0, {GRID_W - 1}) gx(g),
       generate_series(0, {GRID_H - 1}) gy(g)
),
{p}_bits AS (
  SELECT a.doc_id, (a.gy * {GRID_W - 1} + a.gx) AS bitpos,
         CASE WHEN a.cell > b.cell THEN 1 ELSE 0 END AS bit
  FROM {p}_cells a
  JOIN {p}_cells b ON a.doc_id = b.doc_id AND a.gy = b.gy
              AND b.gx = a.gx + 1
  WHERE a.gx < {GRID_W - 1}
),
{p}_hashes AS (
  SELECT doc_id,
         {band_cols}
  FROM {p}_bits GROUP BY doc_id
)"""


def dhash_duck_hamming(p: str = "img") -> str:
    """SQL hamming-distance expression between aliases ``a``/``b`` of
    ``{p}_hashes`` rows."""
    return " + ".join(
        f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(DHASH_BANDS)
    )


def _oracle(src: str = "documents") -> str:
    """Closed-form DuckDB twin: the synthetic pixel formula is stated
    directly over a generate_series grid (the Spark side decodes real
    PNG bytes; the two meet at the integer cell sums), and the pair set
    is brute-force hamming ≤ 3 — legal for the oracle because the
    pigeonhole argument makes the banded operator exactly that set."""
    ham = dhash_duck_hamming()
    return f"""
WITH {dhash_duck_ctes(src)}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INTEGER) AS hamming
FROM img_hashes a JOIN img_hashes b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}
"""


register(QuerySpec("image_dedup_dhash", image_dedup_dhash, _oracle(),
                   tags=("LLM-dedup", "multimodal")))


# --- hamming-space k-NN retrieval over the perceptual hashes ---------------

KNN_K = 5
KNN_QUERY_MOD = 97    # every 97th doc is a query image


def image_knn_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest corpus images per query image in dHash hamming
    space — the multimodal member of the similarity-search family
    (brute cosine / LSH / IVF / PQ / SQ8 cover embeddings; this covers
    perceptual hashes).

    Semantics are multi-probe LSH retrieval: candidates are the images
    sharing ≥ 1 of the 4 hash bands with the query (the same
    pigeonhole banding as the dedup join — exhaustive within hamming
    ≤ 3, high-recall beyond), then EXACT 64-bit hamming re-rank with a
    deterministic (hamming, doc_id) tie-break and row_number ≤ k.  The
    banded candidate generation is part of the operator's definition —
    the oracle mirrors it — so the result is engine-exact, like
    ``embed_jl_rerank``'s shortlist contract.

    Scale shape (round 12 — the ×4→×32 curve caught the first
    implementation's quadratic): the naive plan joined QUERY band rows
    against CORPUS band rows, so its candidate width was Σ bucket
    POPULATIONS — on any corpus whose hash diversity grows slower than
    its size (this fixture: 41 motifs → ~82 distinct hashes at every
    scale; real crawls: logo/blank/boilerplate images), buckets hold
    Θ(N) docs and candidates grow Θ(N²) (measured: 1.8M pairs at ×4 →
    113M at ×32).  The committed plan does ALL candidate work in
    DISTINCT-HASH space — the r11 closure lesson (identity grouping
    for identity relations) applied to retrieval:

    1. group the corpus by its full 64-bit hash; per group keep the
       KNN_K+1 smallest doc_ids (one corpus-linear WindowGroupLimit
       shuffle — +1 because a query excludes itself from its own
       group, exposing the (k+1)-th member);
    2. band-join DISTINCT query hashes × DISTINCT corpus hashes
       (width = hash-pair candidates, not doc pairs) and score each
       hash pair's exact hamming once;
    3. expand: queries ⨝ their hash's candidate hash groups ⨝ that
       group's k+1 representatives — per-query width is bounded by
       (#candidate hash values × (k+1)), INDEPENDENT of bucket
       population — then the same (hamming, doc_id) re-rank ≤ k.

    Equivalence is exact, not approximate: candidacy (≥ 1 shared band)
    and hamming are functions of the hash VALUES alone, and within a
    hash group the (hamming, doc_id) order is doc_id order, so only a
    group's k+1 smallest doc_ids can ever reach a top-k — results are
    bit-identical to the naive plan (re-verified against the unchanged
    oracle at all 3 SFs; curve: re-rank input 112.5M → 335k rows at
    ×32 with count exponent 2.00 → 1.00, cold wall 36.3s → 2.4s,
    wall exponent 1.44 → 0.03 — SCALE_CURVE.md round 12)."""
    from pyspark.sql.window import Window

    from star_schema_etl_airflow_spark.sources.media_fixture import (
        load_media,
    )

    bcols = [f"b{k}" for k in range(DHASH_BANDS)]
    hashed = persist_once(
        dhash_of(load_media(spark, sf_dir).select("doc_id", "png")))

    # (1) per distinct hash: the k+1 smallest member doc_ids
    wg = Window.partitionBy(*bcols).orderBy("doc_id")
    reps = (
        hashed.withColumn("grn", F.row_number().over(wg))
        .filter(F.col("grn") <= KNN_K + 1)
        .select(*[F.col(b).alias(f"c{k}") for k, b in enumerate(bcols)],
                "doc_id")
    )

    # (2) hash-level banded candidates + exact hamming, computed once
    # per hash PAIR
    hgroups = hashed.select(*bcols).distinct()
    band_pairs = ", ".join(f"{k}, b{k}" for k in range(DHASH_BANDS))
    hbands = hgroups.select(
        *bcols,
        F.expr(f"stack({DHASH_BANDS}, {band_pairs}) "
               "as (band_idx, band_key)"),
    ).select(
        *[F.col(b).alias(f"c{k}") for k, b in enumerate(bcols)],
        "band_idx", "band_key",
    )
    qhashes = hashed.filter(F.col("doc_id") % KNN_QUERY_MOD == 0) \
        .select(*bcols).distinct()
    qbands = qhashes.select(
        *[F.col(b).alias(f"q{k}") for k, b in enumerate(bcols)],
        F.expr(f"stack({DHASH_BANDS}, "
               + ", ".join(f"{k}, b{k}" for k in range(DHASH_BANDS))
               + ") as (band_idx, band_key)"),
    )
    hamming = sum(
        F.expr(f"bit_count(q{k} ^ c{k})") for k in range(DHASH_BANDS)
    )
    hash_cand = (
        qbands.join(hbands, ["band_idx", "band_key"])
        .select(*[f"q{k}" for k in range(DHASH_BANDS)],
                *[f"c{k}" for k in range(DHASH_BANDS)])
        .distinct()
        .withColumn("hamming", hamming.cast("int"))
    )

    # (3) expand to (query, candidate doc) bounded by k+1 per hash pair
    queries = hashed.filter(F.col("doc_id") % KNN_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"),
        *[F.col(b).alias(f"q{k}") for k, b in enumerate(bcols)],
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "doc_id")
    return (
        queries.join(hash_cand, [f"q{k}" for k in range(DHASH_BANDS)])
        .join(reps, [f"c{k}" for k in range(DHASH_BANDS)])
        .filter(F.col("query_id") != F.col("doc_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "doc_id", "hamming", "rank")
    )


def _knn_oracle(src: str = "documents") -> str:
    """Banding-mirrored twin: the candidate set (≥ 1 shared band) is
    operator definition on both engines; the re-rank and tie-break are
    stated identically."""
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {k} AS band_idx, b{k} AS band_key "
        f"FROM img_hashes"
        for k in range(DHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(DHASH_BANDS)
    )
    return f"""
WITH {dhash_duck_ctes(src)},
bands AS (
{band_union}
),
cand AS (
  SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS doc_id
  FROM bands q JOIN bands c
    ON q.band_idx = c.band_idx AND q.band_key = c.band_key
  WHERE q.doc_id % {KNN_QUERY_MOD} = 0 AND q.doc_id <> c.doc_id
),
scored AS (
  SELECT cd.query_id, cd.doc_id,
         CAST({ham} AS INTEGER) AS hamming
  FROM cand cd
  JOIN img_hashes a ON a.doc_id = cd.query_id
  JOIN img_hashes b ON b.doc_id = cd.doc_id
)
SELECT query_id, doc_id, hamming, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY hamming, doc_id) AS rank
  FROM scored
) WHERE rank <= {KNN_K}
"""


register(QuerySpec("image_knn_dhash", image_knn_dhash, _knn_oracle(),
                   tags=("similarity", "multimodal")))
