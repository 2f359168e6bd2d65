from pysparkflow.streaming.events import (
    events_stream,
    run_stream_dedup_batchlike,
    run_stream_join_batchlike,
    run_windowed_counts_batchlike,
    stream_stream_purchase_join,
    windowed_event_counts,
)

__all__ = [
    "events_stream",
    "windowed_event_counts",
    "run_windowed_counts_batchlike",
    "stream_stream_purchase_join",
    "run_stream_join_batchlike",
    "run_stream_dedup_batchlike",
]
