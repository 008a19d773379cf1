"""Categorical feature encoding — the tabular-ML preprocessing verbs
(label ids, frequency encoding) as pure DataFrame ops.

Beyond the reference's surface (BASELINE.json north star).  Target
(mean) encoding is already covered by ``groupby_transform`` (the
group-stat broadcast-join pattern); these add the two non-target
encoders every feature pipeline needs.

Scale posture: every mapping/count frame is CATEGORY-cardinality
sized, built with one aggregate over the facts and broadcast-joined
back (AQE falls back to a shuffle join only for genuinely huge
vocabularies).  The dense-id window runs on the mapping frame only —
a single task over distinct values, never over facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frequency_encode", "label_encode"]


def label_encode(
    df: DataFrame,
    col: str,
    out: str | None = None,
    start: int = 0,
    order: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Dense integer ids for each distinct value of ``col``: returns
    ``(encoded_df, mapping)`` where mapping is the (value, id) frame
    (persist it to encode future batches identically).

    ``order``: ``"value"`` assigns ids in sort order of the value
    (deterministic across runs/partitionings — the reproducibility
    default) or ``"frequency"`` (most frequent value gets the lowest
    id, ties broken by value — the embedding-table-locality choice).
    NULL values encode to NULL (no id burned).

    The id window is a single-task sort — over the DISTINCT values
    only, i.e. mapping-sized; the encode itself is a broadcast join."""
    if order not in ("value", "frequency"):
        raise ValueError(f"order must be value|frequency, got {order!r}")
    out = out or f"{col}_id"
    if order == "value":
        base = df.select(col).filter(F.col(col).isNotNull()).distinct()
        w = Window.orderBy(F.col(col))
    else:
        base = (
            df.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.orderBy(F.col("__n").desc(), F.col(col))
    mapping = base.select(
        F.col(col), (F.row_number().over(w) - 1 + start).alias(out)
    )
    encoded = df.join(F.broadcast(mapping), [col], "left")
    return encoded, mapping


def frequency_encode(
    df: DataFrame,
    col: str,
    out: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Replace-with-frequency encoding: each row gains its category's
    occurrence count (``normalize=False``) or fraction of the
    non-NULL rows (``normalize=True``) — the classic high-cardinality
    categorical signal.  NULL categories get a NULL encoding.

    One count aggregate (category-sized) + a broadcast join; the
    total for normalization is a window SUM over the counts frame,
    never a driver collect."""
    out = out or f"{col}_freq"
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    if normalize:
        tot = F.sum("__n").over(Window.partitionBy())
        counts = counts.select(
            F.col(col), (F.col("__n") / tot).cast("double").alias(out)
        )
    else:
        counts = counts.select(F.col(col), F.col("__n").alias(out))
    return df.join(F.broadcast(counts), [col], "left")
