from flox_spark.streaming.stream import (
    groupby_reduce_stream,
    groupby_reduce_stream_salted,
    groupby_corr_stream,
    doc_perplexity_stream,
    groupby_describe_stream,
    groupby_entropy_stream,
    groupby_kurtosis_stream,
    groupby_skew_stream,
    outlier_fences_stream,
    groupby_session_stream,
    stream_decontaminate_spans,
    stream_dedup_against,
    stream_dedup_exact,
    groupby_value_counts_stream,
    winsorize_bounds_stream,
)
from flox_spark.streaming.stateful import stream_ffill
from flox_spark.streaming.enrich import stream_asof_enrich
from flox_spark.streaming.sessions import stream_session_stats, stream_sessionize
from flox_spark.streaming.neardup import minhash_band_keys, stream_minhash_neardup
from flox_spark.streaming.ewm import stream_ewm_mean
from flox_spark.streaming.packing import stream_pack_sequences

__all__ = [
    "groupby_reduce_stream",
    "groupby_reduce_stream_salted",
    "groupby_corr_stream",
    "doc_perplexity_stream",
    "groupby_describe_stream",
    "groupby_entropy_stream",
    "groupby_kurtosis_stream",
    "groupby_skew_stream",
    "outlier_fences_stream",
    "groupby_session_stream",
    "stream_decontaminate_spans",
    "stream_dedup_against",
    "stream_dedup_exact",
    "groupby_value_counts_stream",
    "winsorize_bounds_stream",
    "stream_ffill",
    "minhash_band_keys",
    "stream_asof_enrich",
    "stream_minhash_neardup",
    "stream_ewm_mean",
    "stream_pack_sequences",
    "stream_session_stats",
    "stream_sessionize",
]
