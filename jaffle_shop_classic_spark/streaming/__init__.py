from .windows import (
    dedup_within_watermark,
    running_user_stats_stream,
    run_stream_to_batch,
    session_window_stream,
    stream_events,
    tumbling_counts_stream,
)

__all__ = [
    "dedup_within_watermark",
    "running_user_stats_stream",
    "run_stream_to_batch",
    "session_window_stream",
    "stream_events",
    "tumbling_counts_stream",
]
