from myasynstreamjoin_spark.streaming.feedback import adaptive_count_stream
from myasynstreamjoin_spark.streaming.stateful import stateful_min_count
from myasynstreamjoin_spark.streaming.windowed import (
    run_stream_to_table,
    stream_events,
    stream_min_count_per_window,
)

__all__ = [
    "stream_events",
    "stream_min_count_per_window",
    "run_stream_to_table",
    "stateful_min_count",
    "adaptive_count_stream",
]
