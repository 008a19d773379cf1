"""Streaming incremental MinHash near-duplicate detection.

Signatures are row-local array folds (the shared universal-hash
construction in ``operators/dedup.py`` — a document is one row and
the per-seed min ignores duplicate shingles), so the signature stage
is completely stateless on a stream and provably equal to the batch
path (``tests/test_stream_neardup.py::test_rowlocal_equals_batch_buckets``).

Only the LSH bucket memory is stateful: ``applyInPandasWithState``
keyed by (band, bucket key) stores exactly one value per bucket — the
first-seen doc id (the bucket representative).  Each arriving doc is
emitted with the representative of every band bucket it lands in;
``rep_id != doc_id`` flags a near-duplicate candidate.  State size is
fixed per bucket (one id + count, no growth with duplicates), bounded
overall by the number of distinct band keys — the streaming analog of
the batch design where ``max_bucket`` bounds the quadratic join.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


__all__ = ["minhash_band_keys", "stream_minhash_neardup"]


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    extra_cols: list[str] | None = None,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Row-local (id, band, bkey) rows — no shuffle, no state; works
    identically on batch and streaming frames.  Uses the shared
    universal-hash minhash construction (``operators/dedup.py``:
    one base hash per shingle, seeds derived by affine mixes, all
    mins in one fold); ``hash_impl="md5"`` is the oracle-reproducible
    path, "xxhash64" (default) the native production hash.

    STAGED projections matter here (the round-2 lesson, re-verified
    every time it is touched): tokens, shingles, halves and the min
    fold each live in their OWN select — inlining any of them into
    the next stage's lambda re-evaluates it per element (the inline
    tokenizer alone was ~40% of signature cost; an early naive
    one-select form measured 11x slower at sf0.1)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands ({bands}); "
            "a remainder would silently drop hashes and change the LSH threshold"
        )
    r = num_hashes // bands
    extra = list(extra_cols or [])
    # same reserved-name guard band_buckets/minhash_signatures apply:
    # an extra column named band/bkey/__t etc. would silently clobber
    # pipeline-internal/output columns instead of erroring
    from flox_spark.operators.dedup import _check_carry

    _check_carry(extra, num_hashes)
    if not df.isStreaming:
        # fan out single-file scans before the CPU-bound hashing (a
        # streaming frame already shuffles into the stateful operator),
        # then assemble through ONE parameterized spark.sql call (r14;
        # bit-identical to the staged Column pipeline below, which
        # remains the streaming path — see _minhash_pipeline_sql)
        from flox_spark.operators.dedup import _minhash_pipeline_sql
        from flox_spark.plans import ensure_parallelism

        return _minhash_pipeline_sql(
            ensure_parallelism(df),
            id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            bands=bands, shingle_k=shingle_k, hash_impl=hash_impl,
            unit="word", carry=tuple(extra), out="band_keys",
        )
    from flox_spark.operators.dedup import (
        _minhash_halves,
        _shingles_from_tokens,
        _word_tokens,
        minhash_min_exprs,
        minhash_seed_cols,
    )

    hp = _minhash_halves(hash_impl)  # validates hash_impl
    base = df.select(
        F.col(id_col), *extra, _word_tokens(F.col(text_col)).alias("__t")
    )
    base = base.select(
        F.col(id_col),
        *extra,
        _shingles_from_tokens(F.col("__t"), shingle_k).alias("__sh"),
    )
    base = base.select(
        F.col(id_col), *extra, F.transform(F.col("__sh"), hp).alias("__hp")
    )
    base = base.select(
        F.col(id_col), *extra, *minhash_min_exprs("__hp", num_hashes)
    )
    base = base.select(
        F.col(id_col),
        *extra,
        *minhash_seed_cols("__mins", num_hashes, prefix="__mh"),
    )
    from flox_spark.operators.dedup import band_key

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_key(hash_impl, [F.col(f"__mh{b * r + j}") for j in range(r)]).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return base.select(F.col(id_col), *extra, F.explode(band_structs).alias("bb")).select(
        id_col, *extra, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def stream_minhash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    order_col: str | None = None,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Streaming near-dup flags: one output row per (doc, band) with
    the band bucket's first-seen representative.

    ``order_col`` (defaults to ``id_col``) breaks in-batch ties so
    "first seen" is deterministic.  Returns a streaming DataFrame
    (append mode) with columns (id, band, bkey, rep_id); a doc is a
    near-dup candidate iff any band row has ``rep_id != id``.
    """
    order = order_col or id_col
    extra = [order] if order != id_col else None
    keys = minhash_band_keys(
        df, id_col, text_col, num_hashes, bands, shingle_k, extra, hash_impl
    )

    id_type = df.schema[id_col].dataType
    out_schema = (
        StructType()
        .add(id_col, id_type)
        .add("band", "integer")
        .add("bkey", "string")
        .add("rep_id", id_type)
    )
    state_schema = StructType().add("rep", id_type).add("n", "long")

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rep, seen = (state.get[0], state.get[1]) if state.exists else (None, 0)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(order, kind="mergesort")
        if rep is None:
            rep = rows[id_col].iloc[0]
        out = rows[[id_col, "band", "bkey"]].copy()
        out["rep_id"] = rep
        state.update((rep, seen + len(rows)))
        yield out

    return keys.groupBy("band", "bkey").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
