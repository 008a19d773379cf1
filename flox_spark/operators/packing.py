"""Sequence packing: bin documents into fixed token budgets.

Training-data pipelines pack variable-length documents into
fixed-size context windows ("sequence packing") to avoid padding
waste.  Bin packing is NP-hard and inherently sequential globally, so
the distributed design is two-level:

- **batch-local first-fit-decreasing (FFD) with partition-shared
  bins** via ``mapInPandas``: each Arrow batch is sorted desc by
  tokens and placed first-fit into the partition's shared bin list
  (capacities persist across batches), then EMITTED immediately — so
  peak Python-worker memory is ONE Arrow batch plus the capacity
  list, never the whole partition (the 100 TB requirement; a
  concat-the-partition pack would OOM on a fat partition).  FFD
  guarantees <= 11/9 OPT + 1 bins per batch; sharing bins across
  batches keeps the cross-batch waste to partially-filled bins only,
  and the efficiency test pins the realized bound.
- **zero shuffles**: bin ids are made globally unique by prefixing
  the task's partition id, read from ``TaskContext`` INSIDE the
  Python worker — not via a ``spark_partition_id()`` projection,
  which evaluates to 0 for every row on LocalRelation inputs
  (driver-side local data) and silently collided bins across tasks.
  An optional ``repartition`` fan-out first balances skewed inputs
  (that one exchange is the only one).

Docs exceeding the budget get a singleton bin and ``oversize=true``
(callers chunk or drop them).  The operator is an iterative
algorithm, not relational — the bin ASSIGNMENT has no SQL-oracle
form, but the invariants of a correct packing do: every bin within
budget, every doc placed exactly once, oversize flags consistent,
and the bin count inside the first-fit bound (at most one bin at
<= half capacity per partition).  They are pinned both in
``tests/test_packing.py`` and in the driver's DuckDB invariant
oracle (``__spark_entry__.oracle_sql()['pack_sequences']``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

__all__ = ["pack_sequences"]

_PID_STRIDE = 1 << 40  # bins per partition headroom; pid * stride + local id


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    repartition: int | None = None,
    strategy: str = "first_fit",
) -> DataFrame:
    """Assign each row a ``bin_id`` such that each bin's token sum is
    <= ``budget`` (singleton oversize rows excepted, flagged).

    ``strategy``: ``"first_fit"`` (FFD — place in the first open bin
    that fits) or ``"best_fit"`` (BFD — place in the TIGHTEST open bin
    that fits; same 11/9 OPT + 1 worst case, usually fewer
    partially-filled bins because placements do not fragment the loose
    bins first).  Both are decreasing (batch sorted desc by tokens)
    and share bins across the partition's batches.

    Adds ``bin_id`` (long, globally unique) and ``oversize``
    (boolean).  Row set and values are otherwise unchanged."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if token_col not in df.columns:
        # fail at build time with the fix, not as an executor-side
        # pandas KeyError mid-job
        raise ValueError(
            f"pack_sequences: no {token_col!r} column; compute token "
            "counts first (operators.token_count adds one)"
        )
    if strategy not in ("first_fit", "best_fit"):
        raise ValueError(f"strategy must be first_fit|best_fit, got {strategy!r}")
    best = strategy == "best_fit"
    work = df.repartition(repartition) if repartition else df

    out_schema = StructType(list(work.schema.fields))
    out_schema = out_schema.add("bin_id", LongType()).add("oversize", "boolean")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bins are shared across the partition's batches; each batch
        # is packed (first/best-fit-decreasing within the batch) and
        # emitted immediately.  Residual capacities live in a numpy
        # array so each placement is one vectorized compare over the
        # open bins instead of a Python scan.
        import numpy as np
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        rem = np.empty(1024, dtype=np.int64)
        n_bins = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if pdf[token_col].isna().any():
                n_bad = int(pdf[token_col].isna().sum())
                raise ValueError(
                    f"pack_sequences: {n_bad} rows have NULL {token_col!r}; "
                    "fill or filter token counts before packing"
                )
            pdf = pdf.reset_index(drop=True)
            order = pdf[token_col].sort_values(ascending=False, kind="mergesort").index
            bin_of = pd.Series(0, index=pdf.index, dtype="int64")
            oversize = pd.Series(False, index=pdf.index)
            for idx in order:
                t = int(pdf.at[idx, token_col])
                if t > budget:
                    if n_bins == len(rem):
                        rem = np.resize(rem, 2 * len(rem))
                    rem[n_bins] = 0  # singleton, no residual capacity
                    bin_of.at[idx] = n_bins
                    oversize.at[idx] = True
                    n_bins += 1
                    continue
                i = -1
                if n_bins:
                    d = rem[:n_bins] - t
                    ok = d >= 0
                    if ok.any():
                        if best:
                            d2 = np.where(ok, d, np.iinfo(np.int64).max)
                            i = int(d2.argmin())
                        else:
                            i = int(ok.argmax())
                if i >= 0:
                    rem[i] -= t
                    bin_of.at[idx] = i
                else:
                    if n_bins == len(rem):
                        rem = np.resize(rem, 2 * len(rem))
                    rem[n_bins] = budget - t
                    bin_of.at[idx] = n_bins
                    n_bins += 1
            pdf["bin_id"] = pid * _PID_STRIDE + bin_of
            pdf["oversize"] = oversize
            yield pdf

    return work.mapInPandas(pack, out_schema)
