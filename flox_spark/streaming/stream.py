"""Structured Streaming grouped reductions.

The reference has no streaming surface at all (SURVEY §2.5); this is
the Spark-native extension of the same declarative registry onto
unbounded data: the identical aggregate expressions from
``flox_spark.aggregations`` run inside a watermarked event-time
window — Spark's incremental state store plays the role that
flox's chunk/combine tree plays for static chunks.

Works on any streaming DataFrame (``spark.readStream...``).  At
scale: state is partitioned by (window, keys); the watermark bounds
state size; late rows beyond it are dropped — the standard Spark
semantics, surfaced with flox-style func names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flox_spark.aggregations import REDUCTIONS, AggContext, Aggregation


def _build_expr(df: DataFrame, func: str | Aggregation, value: str, fk: dict | None) -> Column:
    if isinstance(func, str):
        if func not in REDUCTIONS:
            raise ValueError(f"unknown reduction {func!r}")
        agg = REDUCTIONS[func]
    else:
        agg = func
    if agg.needs_order or agg.two_stage:
        raise ValueError(
            f"{agg.name} needs a total order or multiple passes — not available "
            "on an unbounded stream; use the batch engine on a sink table"
        )
    ctx = AggContext(value=F.col(value), dt=df.schema[value].dataType, kwargs=dict(fk or {}))
    return agg.build(ctx)


def groupby_reduce_stream(
    df: DataFrame,
    *by: str,
    func: str | Aggregation,
    value: str,
    time_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    finalize_kwargs: dict | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Windowed grouped reduction on an event-time stream: the
    streaming analog of ``groupby_reduce`` with a tumbling (or
    sliding) window as an implicit extra grouper.

    Returns a streaming DataFrame with columns
    (window_start, window_end, *by, <alias>); attach your own
    ``writeStream`` sink/trigger/output-mode.
    """
    expr = _build_expr(df, func, value, finalize_kwargs)
    out_name = alias or (func if isinstance(func, str) else func.name)
    win = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    keys = [F.col(b) for b in by]
    wdf = df.withWatermark(time_col, watermark)
    res = wdf.groupBy(win.alias("__w"), *keys).agg(expr.alias(out_name))
    return res.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *by,
        out_name,
    )


def stream_dedup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen document per
    normalized-content fingerprint, across micro-batches.

    Spark-first: the fingerprint is the same md5 projection as the
    batch ``dedup_exact`` and the cross-batch memory is Spark's own
    ``dropDuplicates`` state store — no custom state code.  With a
    ``time_col`` the watermark bounds state (fingerprints older than
    the horizon are forgotten — the standard streaming-dedup trade);
    without one, state grows with distinct content (exact forever-
    dedup, bounded by content cardinality).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    out = df.withColumn("fp", F.md5(norm))
    if time_col is not None:
        # dropDuplicatesWithinWatermark: state entries expire once
        # older than the watermark horizon (bounded state)
        return out.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    return out.dropDuplicates(["fp"])


def groupby_session_stream(
    df: DataFrame,
    *by: str,
    func: str | Aggregation,
    value: str,
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    finalize_kwargs: dict | None = None,
    alias: str | None = None,
) -> DataFrame:
    """Session-window variant: groups rows separated by less than
    ``gap`` into one session per key (F.session_window)."""
    expr = _build_expr(df, func, value, finalize_kwargs)
    out_name = alias or (func if isinstance(func, str) else func.name)
    win = F.session_window(F.col(time_col), gap)
    wdf = df.withWatermark(time_col, watermark)
    res = wdf.groupBy(win.alias("__w"), *[F.col(b) for b in by]).agg(expr.alias(out_name))
    return res.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *by,
        out_name,
    )
