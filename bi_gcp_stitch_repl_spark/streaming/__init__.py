from .jobs import incremental_merge_stream, session_counts, tumbling_counts

__all__ = ["incremental_merge_stream", "session_counts", "tumbling_counts"]
