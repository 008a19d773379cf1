"""Streaming as-of enrichment: attach the latest-seen right-side
value to each event, across micro-batches.

The streaming twin of batch ``asof_join(direction="backward")``
(operators/asof.py): there the union + sorted window finds the latest
right row at-or-before each left row; on an unbounded stream the
"latest right row per entity" IS carry state, held in the state store
by ``applyInPandasWithState`` — the same reformulation that turned
flox's scan carries into ``stream_ffill``.

Ordering caveat (same as ``stream_ffill``): rows are matched in
event-time order within each micro-batch, and state carries across
batches in arrival order.  With in-order sources this equals the
batch as-of join (asserted in ``tests/test_stream_enrich.py``); late
right rows enrich only events that arrive after them.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

__all__ = ["stream_asof_enrich"]


def stream_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    *by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Enrich the ``left`` stream with the latest ``right`` row per
    entity (equal timestamps match, right-before-left, as in the
    batch join).  Both inputs may be streaming or batch frames of the
    same SparkSession.

    Returns left's columns plus ``asof_<right_ts>`` and
    ``right_cols`` (NULL until the entity's first right row)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    l = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right (0) sorts before left at ties
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)

    out_schema = StructType(
        [left.schema[c] for c in left.columns]
    ).add(f"asof_{right_ts}", right.schema[right_ts].dataType)
    for c in right_cols:
        out_schema = out_schema.add(c, right.schema[c].dataType)
    state_schema = StructType().add("rts", right.schema[right_ts].dataType)
    for c in right_cols:
        state_schema = state_schema.add(f"s_{c}", right.schema[c].dataType)

    lcols = list(left.columns)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur = list(state.get) if state.exists else [None] * (1 + len(right_cols))
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks)
        # NULL-timestamp left rows: batch asof_join sorts NULLs first so
        # they never match any right row — emit NULL enrichment, and keep
        # them out of the stateful sort (pandas would put NaT LAST and
        # hand them the latest state, diverging from batch)
        null_ts = rows["__ts"].isna()
        null_left = rows[null_ts & (rows["__side"] == 1)]
        rows = rows[~null_ts]
        out_rows = [
            [d[f"__l_{c}"] for c in lcols] + [None] * (1 + len(right_cols))
            for d in null_left.to_dict("records")
        ]
        rows = rows.sort_values(["__ts", "__side"], kind="mergesort")
        # dict records, not itertuples: pandas renames the __-prefixed
        # columns to positional _N fields in namedtuples
        for d in rows.to_dict("records"):
            if d["__side"] == 0:
                cur = [d["__ts"]] + [d[f"__r_{c}"] for c in right_cols]
            else:
                out_rows.append([d[f"__l_{c}"] for c in lcols] + list(cur))
        state.update(tuple(cur))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=list(out_schema.fieldNames()))

    return u.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
