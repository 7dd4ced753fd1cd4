"""Source layer: parquet/CSV readers, schema registry, partitioned writers."""
