from .jobs import (
    click_attribution_stream,
    dedup_stream,
    events_stream,
    incremental_merge_stream,
    near_dedup_stream,
    running_user_totals,
    scd2_dimension_stream,
    session_counts,
    tumbling_counts,
    user_ledger_tws,
    versioned_append_stream,
)

__all__ = [
    "click_attribution_stream",
    "dedup_stream",
    "events_stream",
    "incremental_merge_stream",
    "near_dedup_stream",
    "running_user_totals",
    "scd2_dimension_stream",
    "session_counts",
    "tumbling_counts",
    "user_ledger_tws",
    "versioned_append_stream",
]
