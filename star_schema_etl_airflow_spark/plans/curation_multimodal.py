"""Multimodal curation decision: text ∪ image ∪ audio near-dup flags.

The dedup family now spans three modalities (SimHash text, dHash
images, energy-fingerprint audio); a real curation pipeline combines
them into ONE keep/drop decision per document.  This composition uses
the union-drop policy: a document is dropped when ANY modality finds it
a near-duplicate of a lower-id document — each modality contributes a
drop set, never a transitive merge.  (A union *graph* with transitive
closure is deliberately NOT used here: the synthetic image and audio
motif keys are coprime residues of doc_id, so closure over their union
would — by CRT, and only as a fixture artifact — collapse the corpus
into one giant cluster.  Per-modality transitive clustering exists as
``dedup_clusters``; the cross-modal policy composes the *decisions*.)

Output: one row per corpus document —
  (doc_id, dup_text, dup_image, dup_audio, keep)
with ``keep = NOT (dup_text OR dup_image OR dup_audio)``.

Scale shape: three independent banded self-joins (none quadratic, see
the member operators) followed by three doc_id-keyed LEFT joins of
drop-id sets onto the corpus — each drop set is bounded by the corpus
size and carries a single long column.  Each modality's hash relation
is computed once (persist_once) and the decode kernels are map-only
Arrow passes.

Identity note: all three modalities run over the AMPLIFIED dedup corpus
(``build_corpus`` — the fixture plus exact/near text copies), so the
text modality has real work; the amplified copies get offset doc_ids
and therefore *different* synthetic media — exactly the realistic case
where a re-crawled page shares text but not assets, and the modality
flags genuinely disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.functions.caching import persist_once
from star_schema_etl_airflow_spark.plans.audio_dedup import (
    fingerprint_of,
    fingerprint_pairs,
    fp_duck_ctes,
    fp_duck_hamming,
)
from star_schema_etl_airflow_spark.plans.audio_dedup import (
    HAMMING_T as AUD_T,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    dhash_duck_ctes,
    dhash_duck_hamming,
    dhash_of,
    dhash_pairs,
)
from star_schema_etl_airflow_spark.plans.image_dedup import (
    HAMMING_T as IMG_T,
)
from star_schema_etl_airflow_spark.plans.llm_dedup import (
    CORPUS_DUCK,
    HAMMING_THRESHOLD,
    _duck_sim_bands,
    _duck_simhash,
    build_corpus,
    dedup_simhash,
)
from star_schema_etl_airflow_spark.registry import QuerySpec, register


def _drops(pairs: DataFrame, higher: str) -> DataFrame:
    """Distinct higher-id side of a (lower, higher) pair relation —
    the docs the keep-lowest policy drops."""
    return pairs.select(F.col(higher).alias("doc_id")).distinct()


def curation_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = persist_once(build_corpus(spark, sf_dir))
    ids = corpus.select("doc_id")

    text_drops = _drops(dedup_simhash(spark, sf_dir), "doc_b") \
        .withColumn("dup_text", F.lit(True))
    img_drops = _drops(dhash_pairs(dhash_of(ids)), "id_b") \
        .withColumn("dup_image", F.lit(True))
    aud_drops = _drops(fingerprint_pairs(fingerprint_of(ids)), "id_b") \
        .withColumn("dup_audio", F.lit(True))

    return (
        ids.join(text_drops, "doc_id", "left")
        .join(img_drops, "doc_id", "left")
        .join(aud_drops, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_text", F.lit(False)).alias("dup_text"),
            F.coalesce("dup_image", F.lit(False)).alias("dup_image"),
            F.coalesce("dup_audio", F.lit(False)).alias("dup_audio"),
        )
        .withColumn(
            "keep",
            ~(F.col("dup_text") | F.col("dup_image") | F.col("dup_audio")),
        )
    )


def _oracle() -> str:
    """The three member oracles composed over the shared corpus CTE.
    Image/audio drop sets are brute-force hamming (banding is
    pigeonhole-complete for threshold 3); the text drop set mirrors the
    SimHash banding exactly (its 48-bit/4-band scheme is NOT
    pigeonhole-complete at threshold 4, so candidate generation is part
    of the operator's definition on both engines)."""
    img_ham = dhash_duck_hamming()
    aud_ham = fp_duck_hamming()
    return f"""
WITH corpus AS ({CORPUS_DUCK}),
{_duck_simhash()},
simbuckets AS (
{_duck_sim_bands()}
),
text_drops AS (
  SELECT DISTINCT b.doc_id
  FROM simbuckets a JOIN simbuckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
),
{dhash_duck_ctes("corpus", "img")},
img_drops AS (
  SELECT DISTINCT b.doc_id
  FROM img_hashes a JOIN img_hashes b ON a.doc_id < b.doc_id
  WHERE {img_ham} <= {IMG_T}
),
{fp_duck_ctes("corpus", "aud")},
aud_drops AS (
  SELECT DISTINCT b.doc_id
  FROM aud_fps a JOIN aud_fps b ON a.doc_id < b.doc_id
  WHERE {aud_ham} <= {AUD_T}
)
SELECT c.doc_id,
       (t.doc_id IS NOT NULL) AS dup_text,
       (i.doc_id IS NOT NULL) AS dup_image,
       (a.doc_id IS NOT NULL) AS dup_audio,
       (t.doc_id IS NULL AND i.doc_id IS NULL AND a.doc_id IS NULL)
         AS keep
FROM corpus c
LEFT JOIN text_drops t ON c.doc_id = t.doc_id
LEFT JOIN img_drops i ON c.doc_id = i.doc_id
LEFT JOIN aud_drops a ON c.doc_id = a.doc_id
"""


register(QuerySpec("curation_multimodal", curation_multimodal, _oracle(),
                   tags=("LLM-PIPELINE", "multimodal")))
