"""Custom stateful streaming operators via ``applyInPandasWithState``.

The declarative window aggregations in ``stream.py`` cover every
registry reduction; this module is the escape hatch for operators
that need explicit carry state across micro-batches.  The flagship
example is ``stream_ffill``: flox's ffill scan
(flox/aggregations.py:855-864) lifted onto an unbounded stream — the
"last seen non-missing value per key" IS the carry state that flox's
Blelloch scan threads between chunks (flox/dask.py:576-663); here the
state store holds it between micro-batches.

Ordering caveat (inherent to streaming fills): rows are filled in
event-time order *within* each micro-batch, and state carries across
batches in arrival order.  With in-order sources (file streams,
log-compacted topics) this equals the batch ffill; late data beyond
the current batch is filled with the state as of its arrival.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stream_ffill(
    df: DataFrame,
    *by: str,
    value: str,
    time_col: str,
    alias: str = "ffill",
) -> DataFrame:
    """Forward-fill ``value`` within each key group on a streaming
    DataFrame, carrying the last non-missing value across
    micro-batches through the state store.

    Returns a streaming DataFrame with the input columns plus
    ``alias``; attach your own writeStream (append mode).
    """
    in_schema: StructType = df.schema
    value_field = in_schema[value]
    out_schema = StructType(list(in_schema.fields)).add(alias, value_field.dataType)
    state_schema = StructType().add("last", value_field.dataType)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(time_col, kind="mergesort")
        filled = []
        for v in rows[value]:
            if pd.notna(v):
                last = v
            filled.append(last)
        rows[alias] = filled
        state.update((last,))
        yield rows

    return (
        df.groupBy(*by)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
