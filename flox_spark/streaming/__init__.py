from flox_spark.streaming.stream import groupby_reduce_stream, groupby_session_stream
from flox_spark.streaming.stateful import stream_ffill

__all__ = ["groupby_reduce_stream", "groupby_session_stream", "stream_ffill"]
