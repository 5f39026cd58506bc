from parqueryd_spark.streaming.cdc import stream_apply_cdc
from parqueryd_spark.streaming.dedup import read_index, stream_near_dedup
from parqueryd_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "read_index",
    "stream_apply_cdc",
    "run_stream_to_memory",
    "stream_near_dedup",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
]
