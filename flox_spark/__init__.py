"""flox_spark — a PySpark-native grouped-reduction engine.

Re-implements the query surface of xarray-contrib/flox (grouped
reductions and grouped scans with precise NaN-skipping, missing-group
fill, dtype promotion, and binning semantics) on top of Spark
DataFrames, and extends it with large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics studied from /root/reference (flox); see SURVEY.md.
Architecture is Spark-first: every reduction is a ``groupBy().agg()``
of built-in JVM expressions (whole-stage-codegen), every scan is a
window expression, and reindexing to expected groups is a broadcast
left join.  None of flox's dask machinery (tree combine, cohorts,
blockwise rechunk) is ported — Catalyst/AQE plays that role.
"""

from flox_spark.aggregations import Aggregation, REDUCTIONS, SCANS, Scan, ScanContext, pandas_aggregation
from flox_spark.core import bin_column, groupby_reduce, groupby_reduce_multi
from flox_spark.corr import groupby_corr
from flox_spark.resample import (
    resample_reduce,
    resample_upsample,
    time_bucket,
    time_weighted_mean,
)
from flox_spark.rolling import groupby_rolling
from flox_spark.scan import groupby_ewm, groupby_scan
from flox_spark.scan_blocked import groupby_scan_blocked
from flox_spark.options import set_options, get_options
from flox_spark.pivot import groupby_pivot
from flox_spark.rank import groupby_rank
from flox_spark.ewm_blocked import groupby_ewm_blocked
from flox_spark.rank_blocked import groupby_rank_blocked
from flox_spark.shift_blocked import groupby_shift_blocked
from flox_spark.stats import (
    fillna_group,
    flag_outliers,
    groupby_describe,
    groupby_entropy,
    groupby_kurtosis,
    groupby_skew,
    groupby_value_counts,
    winsorize_group,
    groupby_ntile,
)
from flox_spark.transform import groupby_apply, groupby_transform, standardize
from flox_spark.weighted import groupby_reduce_weighted
from flox_spark.salting import diagnose_skew, groupby_reduce_salted

__all__ = [
    "groupby_corr",
    "groupby_pivot",
    "diagnose_skew",
    "groupby_ewm_blocked",
    "groupby_rank",
    "groupby_rank_blocked",
    "groupby_shift_blocked",
    "time_weighted_mean",
    "groupby_reduce",
    "bin_column",
    "groupby_reduce_multi",
    "groupby_reduce_weighted",
    "groupby_reduce_salted",
    "groupby_describe",
    "groupby_entropy",
    "groupby_kurtosis",
    "groupby_skew",
    "groupby_value_counts",
    "winsorize_group",
    "groupby_ntile",
    "fillna_group",
    "flag_outliers",
    "groupby_transform",
    "groupby_apply",
    "standardize",
    "groupby_ewm",
    "groupby_scan",
    "groupby_scan_blocked",
    "groupby_rolling",
    "Aggregation",
    "pandas_aggregation",
    "REDUCTIONS",
    "SCANS",
    "set_options",
    "get_options",
    "resample_reduce",
    "resample_upsample",
    "time_bucket",
    "Scan",
    "ScanContext",
]

__version__ = "0.1.0"
