from flox_spark.streaming.stream import (
    groupby_reduce_stream,
    groupby_session_stream,
    stream_dedup_exact,
)
from flox_spark.streaming.stateful import stream_ffill

__all__ = [
    "groupby_reduce_stream",
    "groupby_session_stream",
    "stream_dedup_exact",
    "stream_ffill",
]
