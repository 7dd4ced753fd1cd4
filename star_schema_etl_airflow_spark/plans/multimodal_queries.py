"""Oracle registration for the multimodal feature-extraction pipeline.

The Spark side goes binary-payload → Arrow ``mapInPandas`` → features
(sources/multimodal.py); the DuckDB oracle recomputes the same features
in SQL over the same synthesized payloads (the fixture text is pure
ASCII, so byte offsets == char offsets on the oracle side).  This gives
a *differential test of the Python/Arrow UDF plumbing itself* — batch
boundaries, schema mapping, binary round-trip — not just of SQL.
"""

from __future__ import annotations

from star_schema_etl_airflow_spark.registry import QuerySpec, register
from star_schema_etl_airflow_spark.sources.multimodal import (
    MEDIA_TYPES,
    SAMPLE_LEN,
    SAMPLE_STRIDE,
    multimodal_features,
)

_TYPES_SQL = "[" + ", ".join(f"'{t}'" for t in MEDIA_TYPES) + "]"

MULTIMODAL_FEATURES_ORACLE = f"""
SELECT doc_id AS media_id,
       {_TYPES_SQL}[CAST(doc_id % {len(MEDIA_TYPES)} AS INTEGER) + 1] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       array_to_string(list_transform(
         list_filter(range(0, {SAMPLE_LEN}),
                     k -> k * {SAMPLE_STRIDE} < octet_length(encode(text))),
         k -> CAST(ord(substr(text, k * {SAMPLE_STRIDE} + 1, 1)) AS BIGINT)
       ), '|') AS byte_sample
FROM documents
"""

register(QuerySpec("multimodal_features", multimodal_features,
                   MULTIMODAL_FEATURES_ORACLE, tags=("LLM-multimodal",)))
