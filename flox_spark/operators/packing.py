"""Sequence packing: bin documents into fixed token budgets.

Training-data pipelines pack variable-length documents into
fixed-size context windows ("sequence packing") to avoid padding
waste.  Bin packing is NP-hard and inherently sequential globally, so
the distributed design is two-level:

- **partition-local first-fit-decreasing (FFD)** via ``mapInPandas``:
  each partition packs its own documents (sort desc by tokens, place
  each into the first bin with room).  FFD guarantees <= 11/9 OPT + 1
  bins per partition; partition-local packing costs at most one
  partially-filled bin per partition vs a global pack — negligible
  when partitions hold thousands of documents.
- **zero shuffles**: bin ids are made globally unique by prefixing
  ``spark_partition_id``.  An optional ``repartition`` fan-out first
  balances skewed inputs (that one exchange is the only one).

Docs exceeding the budget get a singleton bin and ``oversize=true``
(callers chunk or drop them).  The operator is an iterative
algorithm, not relational — it has no SQL-oracle form; correctness is
invariant-tested (every bin within budget, every doc placed exactly
once, bin count near the LP lower bound) in ``tests/test_packing.py``.
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
) -> DataFrame:
    """Assign each row a ``bin_id`` such that each bin's token sum is
    <= ``budget`` (singleton oversize rows excepted, flagged).

    Adds ``bin_id`` (long, globally unique) and ``oversize``
    (boolean).  Row set and values are otherwise unchanged."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    work = df.repartition(repartition) if repartition else df
    work = work.withColumn("__pid", F.spark_partition_id())

    out_schema = StructType(list(work.schema.fields))
    out_schema = out_schema.add("bin_id", LongType()).add("oversize", "boolean")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [p for p in batches if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf[token_col].isna().any():
            n_bad = int(pdf[token_col].isna().sum())
            raise ValueError(
                f"pack_sequences: {n_bad} rows have NULL {token_col!r}; "
                "fill or filter token counts before packing"
            )
        # FFD: place largest first; bins[i] = remaining capacity
        order = pdf[token_col].sort_values(ascending=False, kind="mergesort").index
        remaining: list[int] = []
        bin_of = pd.Series(0, index=pdf.index, dtype="int64")
        oversize = pd.Series(False, index=pdf.index)
        for idx in order:
            t = int(pdf.at[idx, token_col])
            if t > budget:
                remaining.append(0)  # singleton, no residual capacity
                bin_of.at[idx] = len(remaining) - 1
                oversize.at[idx] = True
                continue
            for i, cap in enumerate(remaining):
                if cap >= t:
                    remaining[i] = cap - t
                    bin_of.at[idx] = i
                    break
            else:
                remaining.append(budget - t)
                bin_of.at[idx] = len(remaining) - 1
        pid = int(pdf["__pid"].iloc[0])
        pdf["bin_id"] = pid * _PID_STRIDE + bin_of
        pdf["oversize"] = oversize
        yield pdf

    return work.mapInPandas(pack, out_schema).drop("__pid")
