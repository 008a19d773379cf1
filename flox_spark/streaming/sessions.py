"""Streaming row-level sessionization.

``groupby_session_stream`` (stream.py) covers session ROLLUPS via the
native ``session_window`` aggregation; this module assigns a session
id to EVERY event on the stream — the streaming twin of batch
``operators.sessions.sessionize``.  The carry state per entity is
just (last event time, session counter): an event more than ``gap``
after its predecessor increments the counter (the strict-``>``
closed-interval rule shared by both batch paths and session_window).

In-order sources reproduce the batch ids exactly (asserted in
``tests/test_stream_sessions.py``); late events beyond the previous
batch are assigned against the state as of their arrival — the same
caveat as ``stream_ffill`` / ``stream_asof_enrich``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructType

__all__ = ["stream_sessionize"]


def stream_sessionize(
    df: DataFrame,
    *by: str,
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    alias: str = "session_id",
) -> DataFrame:
    """Add a 0-based per-entity ``session_id`` to a streaming frame,
    carrying (last ts, counter) in the state store."""
    gap_us = int(round(gap_seconds * 1_000_000))
    if gap_us <= 0:
        raise ValueError("gap_seconds must be positive")

    out_schema = StructType(list(df.schema.fields)).add(alias, LongType())
    state_schema = StructType().add("last_ts", df.schema[ts].dataType).add("sid", LongType())
    cols = list(df.columns)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_ts, sid = (state.get[0], state.get[1]) if state.exists else (None, -1)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(ts, kind="mergesort")
        sids = []
        for t in rows[ts]:
            if last_ts is None or (t - last_ts).total_seconds() * 1_000_000 > gap_us:
                sid += 1
            last_ts = t
            sids.append(sid)
        rows[alias] = pd.array(sids, dtype="int64")
        state.update((last_ts.to_pydatetime() if hasattr(last_ts, "to_pydatetime") else last_ts, sid))
        yield rows[cols + [alias]]

    return df.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
