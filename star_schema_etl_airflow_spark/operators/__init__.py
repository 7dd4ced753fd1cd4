"""Relational + pipeline operators the reference expresses as SQL/DML:
SCD Type 2 maintenance, point-in-time (as-of) joins, merge upserts —
plus the LLM-pipeline extensions (dedup, similarity, text analysis)."""
