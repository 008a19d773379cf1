"""Engine options, mirroring flox's ``set_options`` (reference:
flox/options.py:9-65).  flox's options steer dask rechunking; ours
steer Spark physical choices (approximate quantiles at scale,
broadcast thresholds for the expected-groups reindex join).
"""

from __future__ import annotations

import contextlib
from typing import Any

OPTIONS: dict[str, Any] = {
    # Use percentile_approx instead of exact percentile for
    # quantile/median.  Exact is the flox-parity default; flip to True
    # for the 100 TB path.
    "approx_quantile": False,
    # Relative accuracy for percentile_approx (1/accuracy).
    "approx_quantile_accuracy": 10000,
    # Broadcast the aggregated result into the expected-groups join
    # (the aggregate side is |groups| rows — almost always tiny).
    "broadcast_reindex": True,
    # Exact-quantile physical strategy.  "auto" (default) picks from
    # plan-size statistics (core._choose_quantile_impl): "driver" for
    # tiny inputs, "arrow" for provably-small, "refine" for medium,
    # "sort" for large or stats-less inputs.  Explicit values force
    # one strategy:
    # - "driver" (r12): one no-shuffle Arrow collect + in-driver
    #   np.quantile, re-entered as a LocalRelation — bit-identical to
    #   "arrow" (shared finalize) minus the keyed exchange and the
    #   python-worker hop; runs its collect at plan-build time,
    #   bounded by the tiny-zone gate.  Falls back to "arrow" on
    #   streaming inputs / high group cardinality / Arrow-hostile keys;
    # - "arrow" (r11): one np.quantile grouped-agg kernel per group —
    #   numpy IS the reference semantics; measured equal to "agg" at
    #   sf0.1 (floor-dominated) and 2.4x faster at the zone top
    #   (5M rows/40 MB: 2.74 s vs 6.50 s, bench_scale --qarrow);
    # - "agg": the JVM array_sort(collect_list)+lerp kernel
    #   (aggregations._quantile; buffers every group's values in
    #   memory — pure JVM, but the one OOM-able plan at giant group
    #   sizes);
    # - "refine": exact two-scan approx-bracket + candidate collect
    #   (bounded ~6n/accuracy memory at ANY group size, zero
    #   data-sized shuffles);
    # - "sort": spillable sort + streaming row_number + rank filter
    #   (always-safe, cost = one full shuffle of the values).
    # All three produce the identical numpy-linear interpolation;
    # approx_quantile remains the cheap sketch alternative.
    "quantile_impl": "auto",
    # "auto" thresholds (bytes, from the optimized plan's stats):
    # inputs <= agg_max run "agg"; <= refine_max run "refine"; larger
    # or unknown run "sort".  refine's worst case is ONE group holding
    # the whole input; its sketch accuracy scales as ~sqrt(rows)
    # (core._refine_accuracy), so per-group memory grows as
    # O(sqrt(n)*log n) — at the 1 TB zone edge that is ~13 MB of
    # collected candidates + ~80 MB of sketch, bounded either way.
    # The old 1 MB threshold dated from the `percentile` aggregate's
    # per-value OpenHashMap buffering (its insert cost lost to refine
    # past ~3 MB).  The agg kernel is now array_sort(collect_list) +
    # lerp (aggregations._quantile): flat append/concat partials, one
    # sort per group in the result projection — measured 0.76 s vs
    # refine's 1.30 s on the 10.8 MB sf0.1 lineitem fence agg, and the
    # advantage grows with input (refine pays a second full scan).
    # Memory bound of the agg zone: worst case ONE group holds the
    # whole input, so one task buffers input-sized doubles (~2x raw
    # bytes with array overhead) — 64 MB sorts in well under a second
    # and fits any sane executor; past it refine's O(sqrt(n)*log n)
    # bound takes over.
    "quantile_agg_max_bytes": 64 << 20,
    # the "driver" tiny zone: one bounded plan-build collect of the
    # pruned (keys, value) projection.  12 MB is MEASURED, not
    # inherited: the bench_scale calibration (SCALE.md r12) puts the
    # driver-vs-arrow trade at ~13-17 MB of work-frame stats (6-group
    # doubles: driver best 0.46-0.52 s below it, arrow best 1.8 s at
    # 17 MB where driver drifts to 2.8 s and its variance grows —
    # single-threaded driver work competes with ambient load where
    # the distributed kernel spreads it).  Below the gate the win is
    # 2.4-3x; the bound also caps the plan-build collect.
    "quantile_driver_max_bytes": 12 << 20,
    "quantile_refine_max_bytes": 1 << 40,
    # inputs past refine_max but at most this take "refine2": the
    # two-level bracket (one extra narrowing scan) whose collected
    # candidate set shrinks by another ~grid/6 factor, extending the
    # zero-data-shuffle exact-quantile zone to ~64 TB even when ONE
    # group owns the whole input (see core._narrow_quantile_brackets).
    "quantile_refine2_max_bytes": 1 << 46,
    # sort=True outputs whose DECLARED expected-groups grid is at most
    # this many rows are sorted in one post-shuffle task
    # (repartition(1).sortWithinPartitions — no range-exchange sampling
    # pass); larger declared grids keep the distributed range sort and
    # warn (see SCALE.md / core._sorted_output).
    "single_partition_sort_max": 100_000,
    # With no declared grid the output cardinality is unknown, but it
    # is bounded by the input's row count: inputs whose plan-stats
    # size is at most this many bytes also take the single-task sort
    # (their whole output provably fits one sort task).  At 100 TB the
    # stats blow past this and the distributed range sort runs.
    "single_partition_sort_input_max_bytes": 256 << 20,
    # Blocked-plan auto-routing (blocked_route.py; SCALE.md r13/r14
    # crossover tables).  groupby_rank / groupby_scan / groupby_ewm
    # accept plan="auto"|"window"|"blocked"; "auto" short-circuits to
    # the one-window form (zero extra work) for inputs whose
    # plan-stats size is at most min_bytes — no group can cross a
    # millions-of-rows crossover inside 64 MB — and past the gate pays
    # ONE key-only probe job to estimate rows-per-group against the
    # operator's measured crossover.
    "blocked_route_min_bytes": 64 << 20,
    # rank: blocked wins 2.1x at 8M rows/group, loses 3x at 200k
    "blocked_route_rank_rows": 4_000_000,
    # scans/shift: WindowExec crossover measured at ~8-10M rows/group
    "blocked_route_scan_rows": 8_000_000,
    # ewm mean: blocked wins 2.8x at 4M rows/group AND lifts the
    # whole-group-in-one-worker memory wall, so the switch sits lower
    "blocked_route_ewm_rows": 2_000_000,
    # How self-join diamond DAGs materialize their shared frame:
    # "local_checkpoint" (default): faster, auto-cleaned by the
    # ContextCleaner when dereferenced, but stored only on executors —
    # an executor loss fails the job (retry recomputes from scratch).
    # "persist": lineage kept, fault-tolerant recompute, but cached
    # frames accumulate until spark.catalog.clearCache().
    "diamond_materialize": "local_checkpoint",
}

_VALIDATORS = {
    "approx_quantile": lambda v: isinstance(v, bool),
    "approx_quantile_accuracy": lambda v: isinstance(v, int) and v > 0,
    "broadcast_reindex": lambda v: isinstance(v, bool),
    "quantile_impl": lambda v: v in ("auto", "agg", "arrow", "driver", "sort", "refine", "refine2"),
    "quantile_agg_max_bytes": lambda v: isinstance(v, int) and v >= 0,
    "quantile_driver_max_bytes": lambda v: isinstance(v, int) and v >= 0,
    "quantile_refine_max_bytes": lambda v: isinstance(v, int) and v >= 0,
    "quantile_refine2_max_bytes": lambda v: isinstance(v, int) and v >= 0,
    "single_partition_sort_max": lambda v: isinstance(v, int) and v >= 0,
    "single_partition_sort_input_max_bytes": lambda v: isinstance(v, int) and v >= 0,
    "diamond_materialize": lambda v: v in ("local_checkpoint", "persist", "none"),
    "blocked_route_min_bytes": lambda v: isinstance(v, int) and v >= 0,
    "blocked_route_rank_rows": lambda v: isinstance(v, int) and v >= 0,
    "blocked_route_scan_rows": lambda v: isinstance(v, int) and v >= 0,
    "blocked_route_ewm_rows": lambda v: isinstance(v, int) and v >= 0,
}


def get_options() -> dict[str, Any]:
    return dict(OPTIONS)


class set_options(contextlib.AbstractContextManager):
    """Set engine options, usable as a context manager (like
    flox/options.py:21)."""

    def __init__(self, **kwargs: Any):
        self.old: dict[str, Any] = {}
        for k, v in kwargs.items():
            if k not in OPTIONS:
                raise ValueError(f"unknown option {k!r}; valid: {sorted(OPTIONS)}")
            if not _VALIDATORS[k](v):
                raise ValueError(f"invalid value for {k!r}: {v!r}")
            self.old[k] = OPTIONS[k]
        OPTIONS.update(kwargs)

    def __exit__(self, *exc) -> None:
        OPTIONS.update(self.old)
