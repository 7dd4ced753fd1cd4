"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the pattern a
training-data pipeline uses for image/audio/video columns at 100 TB.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub: ``decode_media`` raises ``NotImplementedError`` for
real decoding, and ``extract_features`` computes deterministic
byte-level features (size, md5, a fixed-stride byte sample) so the whole
Spark-side pipeline — schema, Arrow batch shape, partitioning, UDF
signature — is real and differentially testable (the md5/byte features
are reproducible in the DuckDB oracle over the same synthesized
payloads).

Scale design: payloads stay opaque binary end-to-end (no driver
collect); ``mapInPandas`` streams Arrow record batches through Python
with ~10-100× less overhead than row-at-a-time UDFs; heavy media work
would set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound
per-batch memory (payload_bytes × batch_rows) and repartition by size
class first so batches are uniform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from star_schema_etl_airflow_spark.sources.fixtures import load_table

MEDIA_TYPES = ("image", "audio", "video")
SAMPLE_STRIDE = 37  # fixed stride for the deterministic byte sample
SAMPLE_LEN = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    # '|'-joined sampled byte values: a scalar canonical form (the
    # differential harness canonicalizes through pandas, which cannot
    # hash list-typed cells); the per-byte list stays a kernel-internal
    # intermediate.
    T.StructField("byte_sample", T.StringType()),
])


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from the documents fixture: the text
    bytes play the opaque payload; media_type cycles deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_bytes_declared"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str):
    """Real decode (PIL / soundfile / video frames) — not available in
    this environment.  The function exists so the pipeline shape is
    complete; swap the body for the real codec in production."""
    raise NotImplementedError(
        f"no {media_type} codec in this environment; "
        "extract_features uses byte-level features instead"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Image resize — requires a codec (PIL); explicit stub."""
    raise NotImplementedError("no image codec in this environment")


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly spaced "frames" from each video payload.

    Without a video codec the frames are deterministic byte slices (the
    payload split into n equal chunks) — the *plumbing* (one input row →
    n output rows through an Arrow-batched iterator, binary in/binary
    out) is exactly what a real ffmpeg-backed sampler uses; only the
    slicing lambda changes."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            out = []
            for media_id, payload in zip(vids["media_id"], vids["payload"]):
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    chunk = payload[i * step:(i + 1) * step]
                    if chunk:
                        out.append((media_id, i, bytes(chunk)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction (the mapInPandas kernel)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": payloads.map(len).astype("int64"),
            "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            "byte_sample": payloads.map(
                lambda b: "|".join(
                    str(int(x)) for x in b[::SAMPLE_STRIDE][:SAMPLE_LEN]
                )
            ),
        })


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched mapInPandas."""
    return media.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media table → mapInPandas feature extraction (registered query)."""
    return extract_features(build_media_table(spark, sf_dir))
