from bqetl_spark.streaming.events import stream_dedup_events, stream_event_counts
from bqetl_spark.streaming.stateful import stream_user_totals

__all__ = ["stream_event_counts", "stream_dedup_events", "stream_user_totals"]
