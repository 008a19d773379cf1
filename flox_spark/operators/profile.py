"""Table profiling: one aggregation pass over every requested column.

The pre-flight check a pipeline runs before pointing 100 TB at an
operator chain: row count, per-column null counts, distinct
estimates, min/max.  One job, ONE aggregate (no per-column scans —
profiling N columns with N queries re-reads the table N times), all
JVM built-ins; distinct counts are HLL estimates
(``approx_count_distinct``) because exact per-column distincts would
be N full shuffles.

Output is long format — one row per column — so downstream checks
join/filter it relationally (e.g. "fail the run if any key column's
null_frac > 0").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_rsd: float = 0.05,
    approx_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all columns) in one aggregation
    pass.  Returns one row per column: ``column, n_rows, n_null,
    null_frac, approx_distinct, min_str, max_str`` (min/max rendered
    as strings so mixed-type tables fit one schema; NULL for
    unorderable types like maps).  ``approx_distinct=False`` skips
    the per-column HLL sketches (the dominant cost of the pass —
    count/null/min/max are cheap codegen folds, each HLL is a
    per-row hash + register update) and emits NULL in that column."""
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("no columns to profile")
    missing = [c for c in names if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    orderable = {}
    hashable = {}
    for i, c in enumerate(names):
        dt = df.schema[c].dataType.simpleString()
        orderable[c] = not (dt.startswith("map<") or dt.startswith("struct<"))
        # map-typed columns (including maps nested in arrays/structs)
        # are unhashable in Spark: approx_count_distinct over one
        # raises AnalysisException and fails the WHOLE profile job.
        # Skip the sketch (emit NULL) for those columns so the rest of
        # the table still profiles.
        hashable[c] = approx_distinct and "map<" not in dt
        # null count as n - count(col): count's native null-skipping
        # fold beats a per-row isNull branch + sum (~13% off the whole
        # pass at sf0.1)
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{i}"))
        if hashable[c]:
            aggs.append(
                F.approx_count_distinct(F.col(c), approx_rsd).alias(f"__dist_{i}")
            )
        if orderable[c]:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{i}"))
    wide = df.agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{i}")).alias("n_null"),
                F.when(
                    F.col("__n") > 0,
                    (F.col("__n") - F.col(f"__cnt_{i}")) / F.col("__n"),
                ).otherwise(F.lit(0.0)).alias("null_frac"),
                (
                    F.col(f"__dist_{i}")
                    if hashable[c]
                    else F.lit(None).cast("long")
                ).alias("approx_distinct"),
                (
                    F.col(f"__min_{i}")
                    if orderable[c]
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"__max_{i}")
                    if orderable[c]
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
            for i, c in enumerate(names)
        ]
    )
    return (
        wide.select(F.explode(rows).alias("p"))
        .select("p.*")
    )
