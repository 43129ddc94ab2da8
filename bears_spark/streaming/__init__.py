from bears_spark.streaming.jobs import (
    read_events_stream,
    hourly_counts_stream,
    sessionize_stream,
    dedup_stream,
)

__all__ = ["read_events_stream", "hourly_counts_stream", "sessionize_stream", "dedup_stream"]
