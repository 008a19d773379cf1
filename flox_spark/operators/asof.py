"""Distributed as-of join (nearest-timestamp match).

Beyond the reference's surface (SURVEY §2.5); pipeline-operator suite
per the engine's north star (BASELINE.json).  Matches each left row
to the latest right row at-or-before its timestamp (``backward``, the
default) or the earliest at-or-after (``forward``), per entity.

Spark-first physical design — the **union + ordered window** plan,
not a range join:

    union(left tagged, right tagged)
      -> one hash shuffle on the entity keys
      -> one sorted streaming WindowExec pass
         (last non-null right payload, IGNORE NULLS == ffill)
      -> filter back to left rows

A naive inequality join is O(|L| x |R|) per entity (BroadcastNestedLoop
or a cartesian per key); this plan is O((|L|+|R|) log) via the sort,
spills per partition, and needs exactly ONE exchange.  Equal
timestamps match (the ``<=`` / ``>=`` convention of DuckDB ASOF JOIN
and pandas.merge_asof); the side-order column makes the tie
deterministic.

``tolerance_seconds`` drops matches farther than the bound
(pandas.merge_asof(tolerance=...) behavior): the matched right
timestamp is carried through the same window pass, so the filter is a
post-projection — no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    ``right_cols`` (NULL when no right row qualifies).

    ``by`` are the entity keys present on both sides.  ``right_cols``
    must not collide with left column names (rename upstream)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    # Tag sides so the union sorts the right row on the matching side
    # of an equal-timestamp left row: backward looks back -> right
    # first; forward looks ahead -> right last.
    right_side = 0 if direction == "backward" else 1
    l = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1 - right_side).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.struct(*left.columns).alias("__l"),
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
    )
    u = l.unionByName(r)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy("__ts", "__side")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    matched = u.select(
        "__side",
        "__l",
        pick("__rts").alias("__mts"),
        F.col("__ts"),
        *[pick(f"__r_{c}").alias(f"__m_{c}") for c in right_cols],
    ).filter(F.col("__side") == (1 - right_side))

    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        gap = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__mts"))
            if direction == "backward"
            else F.unix_micros(F.col("__mts")) - F.unix_micros(F.col("__ts"))
        )
        ok = F.col("__mts").isNotNull() & (gap <= F.lit(tol_us))
        matched = matched.select(
            "__side", "__l", "__ts",
            F.when(ok, F.col("__mts")).alias("__mts"),
            *[F.when(ok, F.col(f"__m_{c}")).alias(f"__m_{c}") for c in right_cols],
        )

    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__mts").alias(f"asof_{right_ts}"),
        *[F.col(f"__m_{c}").alias(c) for c in right_cols],
    )
