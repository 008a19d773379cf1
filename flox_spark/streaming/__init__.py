from flox_spark.streaming.stream import groupby_reduce_stream, groupby_session_stream

__all__ = ["groupby_reduce_stream", "groupby_session_stream"]
