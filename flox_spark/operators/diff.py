"""``table_diff`` — keyed snapshot comparison (added / removed /
changed rows between two table versions).

Beyond the reference's surface: the maintenance loop of a living
corpus ("what changed between yesterday's crawl and today's?") needs
a keyed diff before incremental dedup/decontamination re-runs, and
lakehouse users reach for it constantly (Delta's CDF, Iceberg
changelogs — this is the engine-agnostic plain-table version).

Scale shape: ONE full outer hash join on the key (both sides shuffle
once on the same key — the minimum possible for a keyed diff), then
pure projections: status from side-nullness, per-column change flags
from null-safe inequality (``IS DISTINCT FROM`` semantics), all in
whole-stage codegen.  No collects, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    *key: str,
    compare: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots sharing a key.

    Returns ``(*key, status, changed_cols)`` where ``status`` is
    ``added`` (key only in ``new``), ``removed`` (only in ``old``) or
    ``changed`` (present in both with any ``compare`` column
    differing, null-safely); identical rows are omitted unless
    ``include_unchanged``.  ``changed_cols`` is the comma-joined list
    of differing columns ('' for added/removed/unchanged).
    ``compare`` defaults to every shared non-key column."""
    if not key:
        raise ValueError("need at least one key column")
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in key]
    missing = [c for c in compare if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a side: {missing}")

    o = old.select(*key, *compare, F.lit(True).alias("__in_old")).alias("o")
    n = new.select(*key, *compare, F.lit(True).alias("__in_new")).alias("n")
    j = o.join(n, list(key), "full_outer")

    in_old = F.col("o.__in_old").isNotNull()
    in_new = F.col("n.__in_new").isNotNull()

    def differs(c: str) -> Column:
        return ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))

    any_diff = F.lit(False)
    flags: list[Column] = []
    for c in compare:
        d = differs(c)
        any_diff = any_diff | d
        flags.append(F.when(d, F.lit(c)))
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_cols = (
        F.when(in_old & in_new, F.concat_ws(",", *flags)).otherwise(F.lit(""))
        if flags
        else F.lit("")
    )
    # a USING-style full outer join already coalesces the key columns
    out = j.select(
        *key,
        status.alias("status"),
        changed_cols.alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
