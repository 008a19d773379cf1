"""Streaming sequence packing: bin a document FIREHOSE into fixed
token budgets online.

The streaming twin of batch ``operators.packing.pack_sequences``
(its per-partition first-fit with partition-shared bins maps 1:1 onto
per-SHARD first-fit with bins carried in the state store): training
pipelines that tokenize-and-pack as data arrives — rather than in a
nightly batch — keep exactly this structure, a bounded set of open
bins per shard whose residual capacities persist across micro-batches.

State design (the 100 TB considerations):

- state is per SHARD, not per doc: O(n_shards x max_open_bins) longs
  total, independent of stream length.  ``n_shards`` bounds write
  parallelism the same way the batch operator's partition count does;
  shard ids come from a hash of ``id_col`` so replays are
  deterministic.
- the open-bin list is CAPPED (``max_open_bins``): batch FFD's bin
  list dies with the task, a stream's would grow forever (every
  nearly-full bin lingers).  Past the cap the bins with the LEAST
  remaining capacity are retired — already-emitted assignments stay
  valid (bin ids come from a monotone per-shard counter, never from
  list position), the retired bins simply accept no more rows.  The
  packing-quality cost is bounded by the cap: a retired bin wastes at
  most its residual, and first-fit keeps residuals small on all but
  one bin per shard (the same half-full property the batch invariant
  oracle pins).
- arrival order is the stream's: within a micro-batch rows pack
  first-fit-DECREASING exactly like one batch-operator Arrow batch,
  across micro-batches the bins carry over — so a stream replayed as
  ONE batch packs identically to the batch operator with one
  partition per shard and one Arrow batch per micro-batch.

Invariants shared with the batch twin (pinned in
``tests/test_stream_packing.py``): every row assigned exactly once,
non-oversize bin loads <= budget ACROSS batches, oversize ==
(tokens > budget), bin ids globally unique.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructType

__all__ = ["stream_pack_sequences"]

_SHARD_STRIDE = 1 << 40  # matches batch _PID_STRIDE: shard * stride + local id


def stream_pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    id_col: str | None = None,
    n_shards: int = 1,
    max_open_bins: int = 1024,
) -> DataFrame:
    """Assign each streamed row a globally-unique ``bin_id`` whose
    per-bin token sum stays <= ``budget`` across micro-batches
    (singleton oversize rows excepted, flagged ``oversize``).

    ``id_col``/``n_shards``: rows are sharded by
    ``pmod(xxhash64(id_col), n_shards)`` — each shard packs
    independently with its own open-bin state (parallelism x state
    isolation, like the batch operator's partitions).  ``n_shards=1``
    (default) packs the whole stream against one bin list; pass an
    ``id_col`` when raising ``n_shards``.

    Works on batch frames too (same code path semantics via the
    stateless fallback in tests) — but the batch operator is the right
    tool there; this exists for ``readStream`` sources."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if token_col not in df.columns:
        raise ValueError(
            f"stream_pack_sequences: no {token_col!r} column; compute "
            "token counts first (operators.token_count adds one)"
        )
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_shards > 1 and id_col is None:
        raise ValueError("n_shards > 1 needs id_col to shard deterministically")
    if max_open_bins < 1:
        raise ValueError("max_open_bins must be >= 1")

    shard = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("long")
        if n_shards > 1
        else F.lit(0).cast("long")
    )
    work = df.withColumn("__shard", shard)
    cols = list(df.columns)

    out_schema = StructType(list(work.schema.fields))
    out_schema = out_schema.add("bin_id", LongType()).add("oversize", "boolean")
    state_schema = (
        StructType()
        .add("rem", ArrayType(LongType()))
        .add("bid", ArrayType(LongType()))
        .add("n_alloc", LongType())
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        # the batch twin's vectorized shape (operators/packing.py):
        # residual capacities live in a numpy array so each placement
        # is ONE C-side compare+argmax over the open bins instead of a
        # Python list scan — the per-row python first-fit was the
        # measured throughput bound (~15k rows/s/box, SCALE.md r12)
        import numpy as np

        shard_id = int(key[0])
        if state.exists:
            rem0, bid0 = list(state.get[0]), list(state.get[1])
            n_alloc = int(state.get[2])
        else:
            rem0, bid0, n_alloc = [], [], 0
        n_bins = len(rem0)
        cap = max(1024, n_bins)
        rem = np.zeros(cap, dtype=np.int64)
        bid = np.zeros(cap, dtype=np.int64)
        rem[:n_bins] = rem0
        bid[:n_bins] = bid0
        for pdf in pdfs:
            if not len(pdf):
                continue
            if pdf[token_col].isna().any():
                n_bad = int(pdf[token_col].isna().sum())
                raise ValueError(
                    f"stream_pack_sequences: {n_bad} rows have NULL "
                    f"{token_col!r}; fill or filter before packing"
                )
            pdf = pdf.reset_index(drop=True)
            # the batch twin's EXACT sort (pandas mergesort desc) so a
            # single-batch replay stays bit-identical tie-break for
            # tie-break
            order = pdf[token_col].sort_values(
                ascending=False, kind="mergesort"
            ).index.to_numpy()
            toks = pdf[token_col].to_numpy(dtype=np.int64)
            bins = np.zeros(len(pdf), dtype=np.int64)
            overs = np.zeros(len(pdf), dtype=bool)
            for idx in order:
                t = toks[idx]
                if t > budget:
                    bins[idx] = n_alloc  # singleton, never in state
                    overs[idx] = True
                    n_alloc += 1
                    continue
                i = -1
                if n_bins:
                    ok = rem[:n_bins] >= t  # first-fit over open bins
                    if ok.any():
                        i = int(ok.argmax())
                if i >= 0:
                    rem[i] -= t
                    bins[idx] = bid[i]
                else:
                    if n_bins == len(rem):
                        rem = np.resize(rem, 2 * len(rem))
                        bid = np.resize(bid, 2 * len(bid))
                    rem[n_bins] = budget - t
                    bid[n_bins] = n_alloc
                    bins[idx] = n_alloc
                    n_bins += 1
                    n_alloc += 1
            if n_alloc >= _SHARD_STRIDE:
                # the documented "bin ids globally unique" invariant
                # dies silently past the stride (ids would collide
                # into the next shard's range) — fail loudly instead,
                # mirroring the explicit open-bin cap.  2^40 bins per
                # shard is ~decades of stream at any realistic rate.
                raise RuntimeError(
                    "stream_pack_sequences: per-shard bin counter "
                    f"reached the shard stride (2^40 = {_SHARD_STRIDE}); "
                    "bin ids would collide across shards.  Restart the "
                    "stream with a fresh checkpoint (bin ids reset) or "
                    "raise n_shards to spread allocation."
                )
            pdf["bin_id"] = shard_id * _SHARD_STRIDE + bins
            pdf["oversize"] = overs
            yield pdf
        if n_bins > max_open_bins:
            # retire the fullest bins (least remaining): emitted
            # assignments stay valid, they just accept no more rows.
            # stable argsort == the old sorted(key=-rem) tie-break
            # (equal residuals keep the older bin)
            keep = np.sort(
                np.argsort(-rem[:n_bins], kind="stable")[:max_open_bins]
            )
            rem_keep, bid_keep = rem[keep], bid[keep]
        else:
            rem_keep, bid_keep = rem[:n_bins], bid[:n_bins]
        state.update((rem_keep.tolist(), bid_keep.tolist(), n_alloc))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        work.groupBy("__shard")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
        .select(*cols, "bin_id", "oversize")
    )
