from pysparkflow.streaming.events import run_windowed_counts_batchlike, windowed_event_counts

__all__ = ["windowed_event_counts", "run_windowed_counts_batchlike"]
