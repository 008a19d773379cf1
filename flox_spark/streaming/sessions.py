"""Streaming sessionization: the JVM rollup route and the Python
row-level route.

ROLLUP-SHAPED calls (per-session stats, one output row per session)
go through ``stream_session_stats`` — Catalyst's native
``session_window`` aggregation, fully JVM-side with partial map-side
session merging and watermark-bounded state.  Row-level calls (a
``session_id`` on EVERY event) need ``stream_sessionize``, the
``applyInPandasWithState`` twin of batch ``operators.sessions.
sessionize`` — only it can emit per-event output.  The split matters
at scale: the stateful Python operator is per-GROUP-bound in the
Python worker (~0.1-0.15 ms per active group per batch, SCALE.md
r10 — 12-15 s per 100k-key batch per box), while the JVM rollup path
is an ordinary codegen aggregation (measured >=5x the stateful
throughput on the same 1.2M-event/100k-key stream, SCALE.md r11).
``stream_sessionize``'s carry state per entity is just (last event
time, session counter): an event more than ``gap`` after its
predecessor increments the counter (the strict-``>`` closed-interval
rule shared by both batch paths and session_window).

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

__all__ = ["stream_session_stats", "stream_sessionize"]


def stream_session_stats(
    df: DataFrame,
    *by: str,
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    value: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-session rollup on a stream — the DEFAULT route for
    rollup-shaped streaming sessionization (r10 VERDICT #2).

    Delegates to the batch ``session_stats`` body over a watermarked
    frame: ``F.session_window`` is Catalyst's native session
    aggregation, so the whole operator is JVM-side codegen with
    map-side partial session merging and watermark-bounded state —
    none of the per-group Python-worker cost that caps
    ``stream_sessionize`` (SCALE.md r10: ~0.1-0.15 ms/group/batch).
    Output columns match batch ``session_stats`` exactly ((*by,
    session_start, last_ts, n_events, duration_us[, sum_value])), so
    the equality pytest runs the same comparison the other streaming
    twins use.  Under the default append output mode a session emits
    once the watermark passes its close; sessions still open at the
    end of a bounded run stay in state (standard Spark semantics —
    tests advance the watermark with a sentinel event or read the
    final state via complete mode).

    STATE SIZING (r11 measurement, surfaced per r11 VERDICT #5):
    ``session_window`` state is O(OPEN SESSIONS inside the watermark),
    not O(keys) — every session that closed less than ``watermark``
    ago is still held for potential late merges, so the upper bound is
    roughly ``keys x (1 + watermark_seconds / gap_seconds)`` session
    rows.  With a watermark far wider than the gap that multiplier
    bites: the r11 table's own worst case (gap=60 s, 10-min watermark,
    100k keys) held 860k open sessions / 502 MB of store where the
    row-level ``stream_sessionize`` path held 35 MB for the same
    stream.  Keep ``watermark`` within a small multiple of ``gap`` (or
    accept the memory bound above); past a 100x ratio this emits a
    UserWarning rather than silently holding two orders of magnitude
    more state than the gap semantics need."""
    from flox_spark.operators.sessions import session_stats

    wsec = _watermark_seconds(watermark)
    if wsec is not None and gap_seconds > 0 and wsec / gap_seconds > 100:
        import warnings

        warnings.warn(
            f"stream_session_stats: watermark ({watermark}) is "
            f"{wsec / gap_seconds:.0f}x the session gap "
            f"({gap_seconds:g}s); session_window state holds every "
            "session open inside the watermark (~keys x watermark/gap "
            "rows — measured 502 MB at 100k keys, gap=60s, 10-min "
            "watermark).  Narrow the watermark toward the gap, or use "
            "stream_sessionize(evict_idle_after=...) whose state is "
            "one row per key.",
            UserWarning,
            stacklevel=2,
        )
    wdf = df.withWatermark(ts, watermark) if df.isStreaming else df
    return session_stats(
        wdf, *by, ts=ts, gap_seconds=gap_seconds, value=value
    )


_WATERMARK_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _watermark_seconds(text: str) -> float | None:
    """Parse Spark's CalendarInterval-style watermark strings
    ('10 minutes', '1 hour') to seconds; None when unrecognized (the
    caller then skips the sizing sanity check — Spark itself still
    validates the string)."""
    try:
        parts = str(text).strip().lower().split()
        if len(parts) != 2:
            return None
        qty = float(parts[0])
        unit = parts[1].rstrip("s")
        scale = _WATERMARK_UNITS.get(unit)
        return None if scale is None else qty * scale
    except Exception:
        return None


def stream_sessionize(
    df: DataFrame,
    *by: str,
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    alias: str = "session_id",
    evict_idle_after: float | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Add a 0-based per-entity ``session_id`` to a streaming frame,
    carrying (last ts, counter) in the state store.

    Row-level outputs ONLY: per-event ids are the one thing the JVM
    session aggregation cannot produce.  For per-session rollups use
    ``stream_session_stats`` — this operator's Python worker is
    per-group-bound (~0.1-0.15 ms per active group per batch,
    SCALE.md r10), so a 100k-key rollup through it pays 12-15 s per
    batch per box that the session_window route does not.

    ``evict_idle_after`` (seconds, r11): WITHOUT it state is one row
    per key FOREVER (NoTimeout) — 0.35 KB/key (SCALE.md r10) is fine
    at 100M keys but unbounded key cardinality (session ids per URL,
    per query string) eventually isn't.  When set, a key whose last
    event is more than this far behind the EVENT-TIME watermark has
    its state dropped (EventTimeTimeout — data-driven, so runs are
    reproducible); a later event for that key restarts its counter at
    session 0.  That restart is the deliberate trade — the same class
    as watermark lateness — and only affects keys idle longer than
    the horizon, which by the gap rule were starting a new session
    anyway (choose ``evict_idle_after >= gap_seconds`` so ids stay
    0-based per retention window; numbering across evictions is
    per-key-epoch, not global).  Requires an event-time watermark:
    one is applied here from ``watermark``."""
    gap_us = int(round(gap_seconds * 1_000_000))
    if gap_us <= 0:
        raise ValueError("gap_seconds must be positive")
    evict_ms = None
    if evict_idle_after is not None:
        evict_ms = int(round(float(evict_idle_after) * 1000))
        if evict_ms <= 0:
            raise ValueError("evict_idle_after must be positive")

    out_schema = StructType(list(df.schema.fields)).add(alias, LongType())
    state_schema = StructType().add("last_ts", df.schema[ts].dataType).add("sid", LongType())
    cols = list(df.columns)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if evict_ms is not None and state.hasTimedOut:
            state.remove()
            return
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
        if evict_ms is not None:
            # timeout at last event time + horizon; Spark rejects a
            # timestamp at-or-before the current watermark (a very
            # late straggler could compute one), so clamp just past it
            target = last_ts.value // 1_000_000 + evict_ms
            state.setTimeoutTimestamp(
                max(target, state.getCurrentWatermarkMs() + 1)
            )
        yield rows[cols + [alias]]

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if evict_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    src = df.withWatermark(ts, watermark) if evict_ms is not None else df
    return src.groupBy(*by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
