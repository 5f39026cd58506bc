from parqueryd_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
]
