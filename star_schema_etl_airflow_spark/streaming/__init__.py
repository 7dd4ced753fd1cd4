from star_schema_etl_airflow_spark.streaming.ingest import (
    stream_events,
    streaming_tumbling,
)

__all__ = ["stream_events", "streaming_tumbling"]
