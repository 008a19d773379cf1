"""SCD2 history builder — compress a keyed change log / snapshot
sequence into validity intervals (slowly-changing-dimension type 2).

Beyond the reference's surface (SURVEY §2.5); the lakehouse
counterpart of ``table_diff`` (one diff between TWO snapshots) for a
whole SEQUENCE of observations: given rows ``(key, ts, attrs...)``,
emit one row per (key, run of identical attrs) with
``valid_from``/``valid_to`` bounds — the standard dimension-history
shape joins then hit with ``BETWEEN`` (or the engine's as-of join).

Spark-first plan: both steps are window expressions over the SAME
``(key) x (ts)`` window — change-point detection via ``lag`` on the
attribute tuple, then ``lead`` on the surviving change points for the
interval close.  One exchange total: the filter between the two
windows preserves the partitioning and sort, so Catalyst plans a
single shuffle with two Window operators over it (asserted in tests).
NULL attribute values are compared null-safely (a NULL->3 transition
IS a change; NULL->NULL is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def scd2_history(
    df: DataFrame,
    *key: str,
    order_by: str,
    attrs: list[str] | tuple[str, ...],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str | None = "is_current",
) -> DataFrame:
    """One row per run of identical ``attrs`` per ``key``, ordered by
    ``order_by``: ``valid_from`` = first observation of the run,
    ``valid_to`` = the next run's start (open interval end; NULL for
    the current run).  ``current_flag`` marks the open row (pass
    ``None`` to omit the column).

    ``order_by`` must be a total per-key order for deterministic
    output (a timestamp, plus a sequence component if timestamps can
    tie).  Rows with a NULL ``order_by`` are dropped — they have no
    position in the history."""
    if not key:
        raise ValueError("need at least one key column")
    if not attrs:
        raise ValueError("attrs must name at least one tracked column")
    w = Window.partitionBy(*key).orderBy(F.col(order_by))
    state = F.struct(*[F.col(a) for a in attrs])
    # lag(state) is NULL on each key's first row and eqNullSafe(NULL,
    # struct) is false, so the negation marks both genuine changes AND
    # run starts in one expression; struct comparison is field-wise
    # null-safe (NULL->NULL inside an attr is not a change)
    changed = ~F.lag(state).over(w).eqNullSafe(state)
    work = (
        df.filter(F.col(order_by).isNotNull())
        .withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    out = work.withColumn(valid_from, F.col(order_by)).withColumn(
        valid_to, F.lead(F.col(order_by)).over(w)
    )
    if current_flag is not None:
        out = out.withColumn(current_flag, F.col(valid_to).isNull())
    return out.drop(order_by) if order_by not in (valid_from, valid_to) else out
