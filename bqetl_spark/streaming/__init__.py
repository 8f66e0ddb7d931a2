from bqetl_spark.streaming.events import stream_event_counts

__all__ = ["stream_event_counts"]
