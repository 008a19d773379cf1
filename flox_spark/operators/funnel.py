"""Two-step funnel conversion (A then B within T).

Event-analytics staple: of the entities that did step A, how many did
step B within the window, and how fast.  Built by composing
``asof_join`` (forward direction + tolerance) with a grouped
aggregate — the whole funnel is one union + one sorted window pass +
one group-sized aggregation, never a per-entity range join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flox_spark.operators.asof import asof_join

__all__ = ["funnel_conversion"]


def funnel_conversion(
    events: DataFrame,
    *by: str,
    ts: str = "ts",
    start: Column,
    step: Column,
    within_seconds: float,
    round_to: int = 6,
) -> DataFrame:
    """Per-entity funnel stats: every ``start`` event joined to the
    first ``step`` event at-or-after it (same entity, within the
    window).  Equal timestamps count as converted (the DuckDB/pandas
    as-of convention).

    Returns one row per entity with ``n_start``, ``n_converted``,
    ``conversion_rate`` and the mean conversion delay in seconds
    (NULL when nothing converted)."""
    left = events.filter(start).select(*by, F.col(ts))
    right = events.filter(step).select(*by, F.col(ts).alias("__step_ts"))
    j = asof_join(
        left,
        right,
        *by,
        left_ts=ts,
        right_ts="__step_ts",
        right_cols=[],
        direction="forward",
        tolerance_seconds=within_seconds,
    )
    conv = F.col("asof___step_ts").isNotNull()
    delay_s = (F.unix_micros(F.col("asof___step_ts")) - F.unix_micros(F.col(ts))) / 1e6
    return (
        j.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_start"),
            F.sum(conv.cast("long")).alias("n_converted"),
            F.round(F.avg(conv.cast("double")), round_to).alias("conversion_rate"),
            F.round(F.avg(F.when(conv, delay_s)), round_to).alias("mean_delay_s"),
        )
    )
