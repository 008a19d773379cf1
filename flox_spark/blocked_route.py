"""Stats-gated routing between one-window and blocked plans.

The blocked operators (``scan_blocked`` / ``shift_blocked`` /
``rank_blocked`` / ``ewm_blocked``) exist for FEW-GROUPS GIANT-GROUP
shapes, where a WindowExec / per-group kernel's parallelism is bound
by group-key cardinality and one group serializes on one core —
SCALE.md's measured crossovers put the switch at millions of rows per
group, while at bench shapes (hundreds of thousands of rows across
thousands of groups) the one-window form wins 2-3x.  Until r14 the
caller had to KNOW to call the blocked twin; this module is the
``method="auto"``-style chooser (the quantile family's six-strategy
``auto`` is the in-repo precedent, core.py) that consults plan stats
and routes automatically.

Decision ladder (``route_to_blocked``):

1. Streaming frames: never blocked (their plans re-execute
   incrementally; the blocked stages are batch-shaped).
2. Plan-stats size at most ``blocked_route_min_bytes`` (64 MB): the
   input is too small for ANY group to cross a millions-of-rows
   crossover — one-window, with ZERO extra work (this is the branch
   every bench/sf0.1 shape takes, so auto costs those plans nothing).
   Unknown stats also stay one-window (conservative: post-shuffle
   frames are already parallel and re-probing them would add a job).
3. Past the gate, ONE key-only probe job (count + approx distinct
   groups + missing-order count in a single aggregate — column-pruned
   scan, no shuffle of the data) estimates rows-per-group.  Blocked
   when it crosses the operator's measured crossover AND the order
   column (when the blocked twin requires one) has no missing values
   (the blocked contract).  The probe only runs on inputs big enough
   that the one-window form is at risk of never finishing — where one
   extra key-column scan is noise against the window's serialized
   sort.

Crossover constants (OPTIONS, measured in SCALE.md r13 on local[32]):

- rank: one-window 25.7 s vs blocked 12.1 s at 8 M rows/one group
  (2.1x); one-window 1.05 s vs 3.08 s at 600 k rows/3 groups
  (200 k rows/group).  Default switch at 4 M rows/group — safely
  above the shape where one-window still wins, below the measured
  blocked win, and past it the one-window wall grows single-core
  n log n while blocked stays flat in n/cores.
- scans (cumsum family / shift / diff / pct_change): WindowExec vs
  blocked crossover measured at ~8-10 M rows/group (16 M: 8.46 s vs
  4.26 s; 4 M: 1.75 s vs 2.19 s).  Default 8 M rows/group.
- ewm mean (adjust=True): blocked 27.2 s vs 75.9 s per-group hatch at
  4 M rows/one group (2.8x), and the hatch additionally requires the
  whole group in ONE python worker's memory — so the switch sits
  LOWER than the pure wall crossover.  Default 2 M rows/group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flox_spark.options import OPTIONS
from flox_spark.plans.util import estimate_size_bytes

__all__ = ["route_to_blocked"]

_PLANS = ("auto", "window", "blocked")


def validate_plan(plan: str, where: str) -> None:
    if plan not in _PLANS:
        raise ValueError(f"{where}: plan must be one of {_PLANS}, got {plan!r}")


def route_to_blocked(
    df: DataFrame,
    by: tuple[str, ...] | list[str],
    crossover_rows: int,
    order_by: str | None = None,
) -> bool:
    """True when plan stats say the blocked twin should run (see the
    module docstring for the ladder and the measured constants)."""
    if getattr(df, "isStreaming", False):
        return False
    size = estimate_size_bytes(df)
    if size is None or size <= OPTIONS["blocked_route_min_bytes"]:
        return False
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.approx_count_distinct(
            F.struct(*[F.col(b) for b in by])
        ).alias("__g"),
    ]
    if order_by is not None:
        from flox_spark.dtypes import is_missing

        aggs.append(
            F.coalesce(
                F.sum(
                    is_missing(
                        F.col(order_by), df.schema[order_by].dataType
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("__om")
        )
    row = df.agg(*aggs).collect()[0]
    if order_by is not None and row["__om"] > 0:
        # missing order values violate the blocked contract (the
        # quantile block function needs a total numeric order view)
        return False
    return row["__n"] / max(row["__g"], 1) > crossover_rows
