"""Acoustic-fingerprint audio near-duplicate join (energy-profile hash
over decoded WAV/PCM).

The audio twin of ``plans/image_dedup.py``: a training-data pipeline
dedupes audio clips by a compact fingerprint of the signal's energy
envelope (the Haitsma–Kalker family reduces each frame to sign bits of
band-energy differences; this operator is the time-domain integer-exact
member of that family — frame ENERGY instead of spectral bands, so the
entire chain stays in integer arithmetic and the DuckDB oracle can
state it closed-form).

Pipeline:

1. read a REAL RIFF/WAVE blob per document from the materialized
   ``media(doc_id, png, wav)`` parquet table
   (``sources/media_fixture.py`` — 16-bit PCM deterministic in
   ``doc_id``, so the DuckDB oracle stays closed-form) and decode it
   with the production decoder (``sources/multimodal._wav_decode``):
   parquet binary column → Arrow batch → decode end to end.  Callers
   without stored media (the amplified curation corpus) fall back to
   in-kernel synthesis of the identical bytes;
2. frame the samples (33 frames × 8 samples) and take integer frame
   energies E(f) = Σ s²;
3. fingerprint: bit(f) = E(f) > E(f+1) for f ∈ 0..31 → 32 bits packed
   as four 8-bit bands.  A uniform GAIN g multiplies every energy by
   g², so the comparison bits — hence the fingerprint — are exactly
   gain-invariant, the acoustic analogue of dHash's brightness
   invariance;
4. candidates: band-equality self-join (never all-pairs); with 4
   disjoint bands and hamming threshold 3 the pigeonhole principle
   makes recall exact;
5. verify: full 32-bit hamming ≤ 3 on candidates.

Scale shape: identical to the image operator — map-only Arrow
``mapInPandas`` extraction, a 4-rows-per-clip band shuffle, a 4-int
verify join; nothing quadratic in the corpus.

Synthetic corpus structure (closed-form, shared with the oracle):

    base = doc_id % 37            -- 37 acoustic motifs
    gain = 1 + (doc_id // 37) % 3 -- uniform gain (fingerprint-invariant)
    bump = doc_id % 5 == 0        -- +40 on frame 0's samples (≤ 1 bit)
    sample(i) = gain * (((base*13 + (i//8)*37 + (i%8)*5) % 97) - 48)
                [+ bump on frame 0]

|sample| ≤ 3*48 + 40 < 2¹⁵, so the int16 PCM round-trip is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.registry import QuerySpec, register

FRAME = 8                      # samples per frame
N_FRAMES = 33                  # → 32 adjacent-energy comparisons
N_SAMPLES = FRAME * N_FRAMES
N_BASES = 37                   # distinct motifs in the synthetic corpus
GAIN_MOD = 3                   # gain ∈ {1, 2, 3} (fingerprint-invariant)
PAT_MOD, PAT_OFF = 97, 48      # core sample range [-48, 48]
BUMP = 40                      # frame-0 offset (≤ 1 fingerprint bit)
FP_BANDS, BAND_BITS = 4, 8
HAMMING_T = 3                  # < FP_BANDS ⇒ pigeonhole-exact recall

# Wide (64-bit) fingerprint — the corpus-scale remedy the r11 ADVICE
# birthday-bound analysis prescribes (identity-key collisions at 2⁻³²
# per pair become material near 93k distinct assets; 64 bits restores
# ~2⁻⁶⁰ for md5-derived keys).  SAME 264-sample clips, re-framed: 66
# frames × 4 samples → 65 adjacent-energy comparisons, first 64 kept,
# packed as four 16-bit bands.  Band width matched to corpus scale is
# the round-11 closure lesson (SCALE_CURVE.md): 16-bit bands hold
# ~N/65k random hashes per bucket where 8-bit bands hold ~N/256.
FRAME64, N_FRAMES64 = 4, 66    # same N_SAMPLES = 264
BAND_BITS64 = 16               # 4 bands × 16 bits = 64


def _synth_samples(doc_id: int) -> list[int]:
    base = doc_id % N_BASES
    gain = 1 + (doc_id // N_BASES) % GAIN_MOD
    bump = BUMP if doc_id % 5 == 0 else 0
    out = []
    for i in range(N_SAMPLES):
        s = gain * (((base * 13 + (i // FRAME) * 37 + (i % FRAME) * 5)
                     % PAT_MOD) - PAT_OFF)
        if i < FRAME:
            s += bump
        out.append(s)
    return out


def _fp_kernel(batches):
    """Arrow batch kernel: blob (or synthesized fallback) → decode
    (production decoder) → integer frame energies → 32-bit fingerprint
    as four 8-bit bands.  A ``wav`` binary column, when present, is the
    Arrow-delivered media-fixture blob (``sources/media_fixture.py``);
    without it the identical RIFF bytes are synthesized from doc_id
    (the amplified curation corpus has no stored media)."""
    import pandas as pd

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        WAV_RATE,
        _raw_wav_encode,
    )

    for pdf in batches:
        rows = []
        blobs = pdf["wav"] if "wav" in pdf.columns else None
        for i, doc_id in enumerate(pdf["doc_id"]):
            doc_id = int(doc_id)
            blob = bytes(blobs.iloc[i]) if blobs is not None \
                else _raw_wav_encode(_synth_samples(doc_id), WAV_RATE)
            rows.append((doc_id, *fp_bands_from_wav(blob)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
        )


def fp_bands_from_wav(blob: bytes) -> tuple[int, ...]:
    """Production decode → integer frame energies → fingerprint as 4
    bands — the per-clip hash step, shared with the cross-modal
    cluster operator (``plans/curation_clusters.py``)."""
    import struct

    import numpy as np

    from star_schema_etl_airflow_spark.sources.multimodal import (
        _wav_decode,
    )

    dec = _wav_decode(blob)
    vals = np.array(
        struct.unpack(f"<{dec['n_frames']}h", dec["frames"]),
        dtype=np.int64,
    )
    energy = (vals * vals).reshape(N_FRAMES, FRAME).sum(axis=1)
    bits = (energy[:-1] > energy[1:]).astype(np.int64)  # 32
    return tuple(
        int((bits[k * BAND_BITS:(k + 1) * BAND_BITS]
             << np.arange(BAND_BITS)).sum())
        for k in range(FP_BANDS)
    )


def fp64_bands_from_wav(blob: bytes) -> tuple[int, ...]:
    """Wide-fingerprint decode+hash: the SAME production decode, the
    same clip bytes, re-framed 66×4 → 64 comparison bits as four
    16-bit bands.  Shared with the cross-modal cluster operator's
    audio identity key (full 60-bit md5 keys fit without truncation)."""
    import struct

    import numpy as np

    from star_schema_etl_airflow_spark.sources.multimodal import (
        _wav_decode,
    )

    dec = _wav_decode(blob)
    vals = np.array(
        struct.unpack(f"<{dec['n_frames']}h", dec["frames"]),
        dtype=np.int64,
    )
    energy = (vals * vals).reshape(N_FRAMES64, FRAME64).sum(axis=1)
    bits = (energy[:-1] > energy[1:]).astype(np.int64)[:64]
    return tuple(
        int((bits[k * BAND_BITS64:(k + 1) * BAND_BITS64]
             << np.arange(BAND_BITS64)).sum())
        for k in range(FP_BANDS)
    )


def _fp64_kernel(batches):
    import pandas as pd

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        WAV_RATE,
        _raw_wav_encode,
    )

    for pdf in batches:
        rows = []
        blobs = pdf["wav"] if "wav" in pdf.columns else None
        for i, doc_id in enumerate(pdf["doc_id"]):
            doc_id = int(doc_id)
            blob = bytes(blobs.iloc[i]) if blobs is not None \
                else _raw_wav_encode(_synth_samples(doc_id), WAV_RATE)
            rows.append((doc_id, *fp64_bands_from_wav(blob)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
        )


def fingerprint64_of(docs: DataFrame) -> DataFrame:
    """Wide-fingerprint relation (doc_id, b0..b3 as 16-bit bands) —
    same contract as :func:`fingerprint_of`, 64-bit hash space."""
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        _spread,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"b{k}", T.LongType()) for k in range(FP_BANDS)]
    )
    cols = ["doc_id"] + (["wav"] if "wav" in docs.columns else [])
    return persist_once(
        _spread(docs.select(*cols)).mapInPandas(
            _fp64_kernel, schema=schema)
    )


def audio_dedup_fingerprint64(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All clip pairs with WIDE (64-bit) fingerprint hamming ≤ 3 —
    exact via the same pigeonhole-complete banding, over 16-bit bands
    whose buckets hold ~N/65k docs at corpus scale (vs ~N/256 for the
    8-bit bands — the measured difference between the r11 closure
    curve's 1.60 and 0.40 exponents)."""
    from star_schema_etl_airflow_spark.sources.media_fixture import (
        load_media,
    )

    hashed = fingerprint64_of(
        load_media(spark, sf_dir).select("doc_id", "wav"))
    return fingerprint_pairs(hashed)


def fingerprint_of(docs: DataFrame) -> DataFrame:
    """Fingerprint relation (doc_id, b0..b3) for ANY doc_id relation —
    the per-clip decode+hash pass, reusable by the multimodal curation
    composition.  A ``wav`` binary column, when present, is decoded as
    the payload (the media-fixture blob path); otherwise the payload is
    synthesized from doc_id (identical bytes by construction)."""
    from pyspark.sql import types as T

    from star_schema_etl_airflow_spark.plans.multimodal_queries import (
        _spread,
    )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"b{k}", T.LongType()) for k in range(FP_BANDS)]
    )
    cols = ["doc_id"] + (["wav"] if "wav" in docs.columns else [])
    return persist_once(
        _spread(docs.select(*cols)).mapInPandas(
            _fp_kernel, schema=schema)
    )


def _fp_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet binary column → Arrow batch → production decode: the
    # registered query runs the blob-scan read path end to end
    from star_schema_etl_airflow_spark.sources.media_fixture import (
        load_media,
    )

    return fingerprint_of(load_media(spark, sf_dir).select("doc_id", "wav"))


def audio_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All clip pairs with fingerprint hamming distance ≤ 3 — exact via
    pigeonhole-complete banding + full-width verify."""
    hashed = _fp_relation(spark, sf_dir)
    return fingerprint_pairs(hashed)


def fingerprint_pairs(hashed: DataFrame) -> DataFrame:
    """Banded pair generation + full-width verify over a fingerprint
    relation."""
    band_pairs = ", ".join(f"{k}, b{k}" for k in range(FP_BANDS))
    buckets = hashed.select(
        "doc_id",
        F.expr(f"stack({FP_BANDS}, {band_pairs}) as (band_idx, band_key)"),
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
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(FP_BANDS)],
    )
    hb = hashed.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(FP_BANDS)],
    )
    hamming = sum(
        F.expr(f"bit_count(a{k} ^ bb{k})") for k in range(FP_BANDS)
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= HAMMING_T)
        .select("id_a", "id_b", "hamming")
    )


def fp_duck_ctes(src: str = "documents", p: str = "aud",
                 frame: int = FRAME, band_bits: int = BAND_BITS) -> str:
    """Prefixed CTE chain computing the fingerprint relation
    ``{p}_fps(doc_id, b0..b3)`` over ``src`` in DuckDB — the composable
    SQL twin of :func:`fingerprint_of` (defaults) or
    :func:`fingerprint64_of` (``frame=FRAME64, band_bits=BAND_BITS64``).
    The synthetic sample stream is IDENTICAL in both framings (the same
    264-sample clip); only the energy grouping and the number of kept
    comparison bits (``FP_BANDS * band_bits``) differ.  Note the sample
    formula's frame structure stays keyed to the base framing (FRAME)
    — it describes the CLIP, not the fingerprint."""
    n_cmp = FP_BANDS * band_bits
    band_cols = ",\n         ".join(
        f"SUM(CASE WHEN f >= {k * band_bits} AND f < {(k + 1) * band_bits} "
        f"THEN bit << (f - {k * band_bits}) ELSE 0 END) AS b{k}"
        for k in range(FP_BANDS)
    )
    return f"""{p}_samples AS (
  SELECT d.doc_id, i.g AS i,
         (1 + (d.doc_id // {N_BASES}) % {GAIN_MOD})
           * ((((d.doc_id % {N_BASES}) * 13 + (i.g // {FRAME}) * 37
                + (i.g % {FRAME}) * 5) % {PAT_MOD}) - {PAT_OFF})
         + CASE WHEN d.doc_id % 5 = 0 AND i.g < {FRAME}
                THEN {BUMP} ELSE 0 END AS s
  FROM {src} d, generate_series(0, {N_SAMPLES - 1}) i(g)
),
{p}_energy AS (
  SELECT doc_id, i // {frame} AS f, SUM(s * s) AS e
  FROM {p}_samples GROUP BY doc_id, i // {frame}
),
{p}_bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM {p}_energy a
  JOIN {p}_energy b ON a.doc_id = b.doc_id AND b.f = a.f + 1
  WHERE a.f < {n_cmp}
),
{p}_fps AS (
  SELECT doc_id,
         {band_cols}
  FROM {p}_bits GROUP BY doc_id
)"""


def fp_duck_hamming(p: str = "aud") -> str:
    return " + ".join(
        f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(FP_BANDS)
    )


def _oracle(src: str = "documents") -> str:
    """Closed-form DuckDB twin: the synthetic sample formula squared and
    frame-summed (all integers), brute-force hamming ≤ 3 (legal because
    the banding is pigeonhole-complete — see the image_dedup oracle)."""
    ham = fp_duck_hamming()
    return f"""
WITH {fp_duck_ctes(src)}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INTEGER) AS hamming
FROM aud_fps a JOIN aud_fps b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}
"""


def _oracle64(src: str = "documents") -> str:
    ham = fp_duck_hamming()
    return f"""
WITH {fp_duck_ctes(src, "aud", frame=FRAME64, band_bits=BAND_BITS64)}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INTEGER) AS hamming
FROM aud_fps a JOIN aud_fps b ON a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_T}
"""


register(QuerySpec("audio_dedup_fingerprint", audio_dedup_fingerprint,
                   _oracle(), tags=("LLM-dedup", "multimodal")))
register(QuerySpec("audio_dedup_fingerprint64", audio_dedup_fingerprint64,
                   _oracle64(), tags=("LLM-dedup", "multimodal")))
