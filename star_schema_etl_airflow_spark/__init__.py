"""star_schema_etl_airflow_spark — a PySpark-native star-schema analytics engine.

Re-implements the query and data-processing capabilities of the reference
``ferdianmaulana/Star-Schema-ETL-Airflow`` (a BigQuery + Airflow batch ELT
pipeline) as an idiomatic Spark engine:

- layered star schema (raw → core → datamart) over partitioned Parquet
- SCD Type 2 dimension maintenance as a set-based DataFrame transform
- generated date dimension
- point-in-time (as-of) fact joins
- datamart aggregation (sales summary, customer RFM analytics)
- config-driven pipeline runner with topological stage ordering
- large-scale extensions: dedup (exact/MinHash/SimHash/Jaccard), embedding
  similarity search, text analysis, multimodal plumbing, structured streaming

Everything is expressed with the DataFrame/SQL API so Catalyst owns the
physical plan (pushdown, pruning, join selection, AQE, codegen).
"""

__version__ = "0.1.0"

from star_schema_etl_airflow_spark.session import get_spark  # noqa: F401
