from bistro_spark.streaming.incremental import IncrementalRunner
from bistro_spark.streaming.sink import IdempotentParquetSink
from bistro_spark.streaming.windows import (
    session_window_accu,
    sliding_window_accu,
    tumbling_window_accu,
)

__all__ = [
    "IncrementalRunner",
    "IdempotentParquetSink",
    "session_window_accu",
    "sliding_window_accu",
    "tumbling_window_accu",
]
