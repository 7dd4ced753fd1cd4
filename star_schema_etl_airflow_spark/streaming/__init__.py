from star_schema_etl_airflow_spark.streaming.ingest import (
    stream_events,
    streaming_tumbling,
)
from star_schema_etl_airflow_spark.streaming.stateful import user_profile_stream

__all__ = ["stream_events", "streaming_tumbling", "user_profile_stream"]
