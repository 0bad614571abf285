from .jobs import (
    click_attribution_stream,
    dedup_stream,
    incremental_merge_stream,
    session_counts,
    tumbling_counts,
)

__all__ = [
    "click_attribution_stream",
    "dedup_stream",
    "incremental_merge_stream",
    "session_counts",
    "tumbling_counts",
]
