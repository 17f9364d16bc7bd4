from .events import (
    read_events_stream,
    run_available_now,
    session_windows,
    stateful_user_totals,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "session_windows",
    "stateful_user_totals",
    "stream_dedup",
    "tumbling_counts",
]
