"""Mergeable distinct-count sketches and heavy hitters.

The 100 TB pre-aggregation pattern: you cannot afford to re-scan a
petabyte to answer "distinct users last quarter", so you build a
small MERGEABLE sketch per (group, partition-unit) once, persist it,
and answer every later rollup by unioning sketches.  Spark 3.5+
ships Apache DataSketches HLL as SQL aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole pattern stays JVM-side and codegen-friendly — no UDFs.

Key property (tested): HLL union is register-wise max, so unioning
per-day sketches gives the IDENTICAL estimate to sketching the raw
union — pre-aggregation loses nothing.

``heavy_hitters`` is the exact companion: corpus-frequency analysis
(hot tokens, hot URLs, boilerplate shingles) as a two-level
aggregation.  Map-side partial aggregation bounds the shuffle at
one row per (distinct item, task), and the threshold/top-k filter
prunes on the reduce side; the ``WindowGroupLimit`` top-k variant
keeps even the sort bounded.  Exact by construction — at any scale
the only risk is distinct-item cardinality, which the ``min_count``
threshold prunes before any sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "build_distinct_sketches",
    "rollup_distinct",
    "heavy_hitters",
]


def build_distinct_sketches(
    df: DataFrame,
    *by: str,
    col: str,
    lgk: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """One HLL sketch (binary, ~2^lgk bytes) per group over ``col``.
    Persist this instead of raw data for later distinct rollups."""
    return df.groupBy(*by).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(sketch_col)
    )


def rollup_distinct(
    sketches: DataFrame,
    *by: str,
    sketch_col: str = "distinct_sketch",
    out: str = "approx_distinct",
) -> DataFrame:
    """Union per-group sketches up to a coarser grouping and estimate.
    ``by`` empty -> one global row."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col), F.lit(True))
    ).alias(out)
    if by:
        return sketches.groupBy(*by).agg(agg)
    return sketches.agg(agg)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int | None = None,
    top: int | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact frequent items: rows ``(by..., item, n)`` for items
    appearing at least ``min_count`` times (and/or the ``top`` most
    frequent per group).  Output sorted by descending count within
    group.  At least one of ``min_count``/``top`` is required — an
    unbounded full frequency table is the one shape that doesn't
    scale."""
    if min_count is None and top is None:
        raise ValueError("need min_count and/or top (unbounded output)")
    keys = list(by or [])
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count is not None:
        counts = counts.filter(F.col("n") >= min_count)
    if top is not None:
        if keys:
            w = Window.partitionBy(*keys).orderBy(F.desc("n"), F.col("item"))
            counts = (
                counts.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") <= top)
                .drop("__rk")
            )
        else:
            # global top-k: orderBy().limit() compiles to
            # TakeOrderedAndProject (distributed partial top-k per
            # partition); an unpartitioned window would funnel every
            # distinct item through ONE task
            counts = counts.orderBy(F.desc("n"), F.col("item")).limit(top)
    return counts.orderBy(*keys, F.desc("n"), F.col("item"))
