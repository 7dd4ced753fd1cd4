"""Embedding scalar quantization — the storage/bandwidth step of a
large-scale vector pipeline (float32 → int8 is a 4× reduction; at 100 TB
of embeddings that is the difference between caching the corpus in
executor memory and not).

Per-vector symmetric int8 quantization, the form every ANN system
(FAISS ``SQ8``, ScaNN, Milvus) ships:

    scale = max(|x_i|) / 127
    q_i   = floor(x_i / scale + 0.5)        in [-127, 127]
    x̂_i  = q_i * scale                      (dequantized)

``floor(v + 0.5)`` is used instead of ``round(v)`` deliberately: both
engines implement ``floor`` exactly per IEEE-754, while ``round``
half-way tie policies differ between engines (HALF_UP vs banker's) —
the explicit form makes Spark and DuckDB bit-identical, so the oracle
check is exact, not tolerance-based.

Scale design: strictly map-only — no shuffle, no window, no join; the
whole operator is one projection inside whole-stage codegen (array
higher-order functions over the embedding column).  Runs at any corpus
size at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.fixtures import load_table

INT8_MAX = 127


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append ``scale`` (double), ``qvec`` (array<tinyint>), and
    ``max_abs_err`` (double, max per-element reconstruction error) to a
    frame with an array<float> ``vec_col``.  Map-only; zero vectors
    quantize to all-zero with scale 0."""
    amax = (
        f"aggregate({vec_col}, cast(0 as double), "
        f"(a, x) -> greatest(a, abs(cast(x as double))))"
    )
    return (
        df.withColumn("scale", F.expr(f"{amax} / {INT8_MAX}.0d"))
        .withColumn(
            "qvec",
            F.expr(
                f"transform({vec_col}, x -> cast(CASE WHEN scale = 0.0d "
                f"THEN 0.0d ELSE floor(cast(x as double) / scale + 0.5d) "
                f"END as tinyint))"
            ),
        )
        .withColumn(
            "max_abs_err",
            F.expr(
                f"CASE WHEN scale = 0.0d THEN 0.0d ELSE "
                f"aggregate({vec_col}, cast(0 as double), (a, x) -> "
                f"greatest(a, abs(cast(x as double) - "
                f"floor(cast(x as double) / scale + 0.5d) * scale))) END"
            ),
        )
    )


def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize the fixture embedding corpus; the error column doubles as
    the quality audit (max error is bounded by scale/2 by construction).

    ``qvec`` is emitted as a '|'-joined string of the int8 codes (the
    array form stays internal, see ``quantize_int8``): the differential
    harness canonicalizes through pandas, which cannot hash list cells."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return quantize_int8(emb).select(
        "vec_id",
        "scale",
        F.array_join(F.expr("transform(qvec, x -> cast(x as string))"), "|")
        .alias("qvec"),
        "max_abs_err",
    )


EMBED_QUANTIZE_ORACLE = f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / {INT8_MAX}.0 AS scale
  FROM embeddings
)
SELECT vec_id, scale,
       array_to_string(
         list_transform(embedding, x -> CAST(CAST(
           CASE WHEN scale = 0.0 THEN 0.0
                ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) END AS TINYINT)
           AS VARCHAR)),
         '|') AS qvec,
       CASE WHEN scale = 0.0 THEN 0.0 ELSE
         list_max(list_transform(embedding, x ->
           abs(CAST(x AS DOUBLE) -
               floor(CAST(x AS DOUBLE) / scale + 0.5) * scale)))
       END AS max_abs_err
FROM s
"""

register(QuerySpec("embed_quantize_int8", embed_quantize_int8,
                   EMBED_QUANTIZE_ORACLE, tags=("LLM-similarity", "quantize")))
