"""Document chunking and embedding pooling.

The two halves of the long-document story a training pipeline needs
around ``pack_sequences``:

- ``chunk_documents``: split each document into overlapping
  fixed-token-budget windows (the standard context-window prep
  before tokenization/embedding).  Pure array expressions — a
  ``sequence`` of window starts exploded against a ``slice`` of the
  token array; zero UDFs, zero shuffles, scales as a projection.
- ``average_embeddings``: mean-pool chunk embeddings back to one
  vector per document (the classic chunk->embed->pool retrieval
  recipe).  posexplode + avg per (doc, dim) + rebuild: one shuffle,
  map-side partials collapse each task to <= |docs|*dim rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents", "average_embeddings"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """One row per (document, window): ``chunk_id`` (0-based), the
    window's ``chunk_text`` (whitespace-token window re-joined) and
    its ``n_tokens``.  Windows start every ``max_tokens - overlap``
    tokens; the final window may be short; empty/NULL documents emit
    no rows.  Tokens are preserved VERBATIM (case, punctuation —
    this is training-data prep, not dedup normalization); the one
    transform is that whitespace runs between tokens collapse to
    single spaces on re-join (chunks concatenated with the overlap
    removed reproduce the token stream exactly)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    base = (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n"))
    )
    starts = F.sequence(
        F.lit(0),
        # last window start: the largest multiple of stride < n
        (F.floor((F.col("__n") - 1) / stride) * stride).cast("int"),
        F.lit(stride),
    )
    out = (
        base.select(
            F.col(id_col),
            F.col("__toks"),
            F.col("__n"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(max_tokens), F.col("__n") - F.col("__start")).alias(
                "n_tokens"
            ),
        )
    )
    return out


def average_embeddings(
    df: DataFrame,
    *by: str,
    vec_col: str = "embedding",
    out: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Element-wise mean of vectors per group (chunk->doc pooling).
    NULL vectors are skipped; groups with only NULL vectors emit a
    NULL vector (they stay in the output — dropping them would
    silently lose docs from downstream joins).  ``dim`` VALIDATES:
    any non-NULL vector of a different length fails the job
    (``assert_true``) — silently averaging a ragged subset is exactly
    the pooled-embedding corruption this parameter exists to stop."""
    work = df
    if dim is not None:
        # the assertion lives INSIDE the vector column (when(assert
        # .isNull(), vec)) so column pruning can't optimize it away:
        # evaluating the vector evaluates the check
        check = F.assert_true(
            F.col(vec_col).isNull() | (F.size(F.col(vec_col)) == dim),
            F.concat(
                F.lit(f"average_embeddings: expected dim {dim}, got "),
                F.size(F.col(vec_col)).cast("string"),
            ),
        )
        work = work.withColumn(vec_col, F.when(check.isNull(), F.col(vec_col)))
    groups = work.select(*by).distinct()
    pooled = (
        work.filter(F.col(vec_col).isNotNull())
        .select(*by, F.posexplode(F.col(vec_col)).alias("__pos", "__x"))
        .groupBy(*by, "__pos")
        .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
        .groupBy(*by)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__m")))
            ).alias("__pm")
        )
        .select(
            *by, F.transform(F.col("__pm"), lambda s: s["__m"]).alias(out)
        )
    )
    return groups.join(pooled, list(by), "left")
