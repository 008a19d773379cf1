"""``groupby_scan`` — grouped scans as window expressions.

Spark-native re-expression of flox's ``groupby_scan``
(reference: flox/scan.py:101-315).  flox needs a Blelloch prefix-scan
tree over dask blocks (flox/dask.py:576-663) because dask lacks a
shuffle; Spark's ``WindowExec`` after a hash partition on the group
keys replaces the whole carry-state machinery — each scan is ONE
window expression over ``Window.partitionBy(keys).orderBy(idx)``.

At scale: one shuffle on the group keys, then a sorted streaming pass
per partition (WindowExec spills if a group exceeds memory).  No UDFs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flox_spark.dtypes import arith_input, arith_restore, is_float_type, is_missing, to_skip
from flox_spark.aggregations import SCANS, Scan, ScanContext

__all__ = ["groupby_scan"]


def groupby_scan(
    df: DataFrame,
    *by: str,
    func: str | Scan,
    value: str,
    order_by: str,
    alias: str | None = None,
    dtype: object = None,
    engine: str | None = None,
    method: str | None = None,
    finalize_kwargs: dict | None = None,
    plan: str = "auto",
) -> DataFrame:
    """Grouped scan with flox semantics (flox/scan.py:101-315).
    ``engine``/``method`` accepted for flox call-site compatibility
    and ignored (WindowExec replaces both scan methods); ``dtype``
    casts the value column before the scan (flox scan.py's dtype
    argument — the scan runs in the requested type).

    ``plan``: physical strategy.  ``"auto"`` (default) keeps the
    one-window form unless plan stats say rows-per-group crosses the
    measured blocked crossover (``blocked_route.route_to_blocked``;
    OPTIONS["blocked_route_scan_rows"]) — then the exactly-equal
    blocked twin runs (``groupby_scan_blocked`` for the cumulative
    funcs, ``groupby_shift_blocked`` for shift/diff/pct_change),
    whose parallelism is num_blocks per group instead of one task
    per group.  ``"window"``/``"blocked"`` force a strategy (blocked
    raises for custom ``Scan`` specs — their window expressions have
    no generic carry decomposition).

    Supported funcs (flox SCANS registry, flox/aggregations.py:849-878):

    - ``cumsum``: running sum, NaN propagates from the first NaN on
      (numpy cumsum semantics, flox/aggregate_flox.py:296-328).
    - ``nancumsum``: running sum treating NaN/NULL as 0 — missing
      positions receive the running total (numpy nancumsum).
    - ``ffill`` / ``bfill``: forward/backward fill of the last/next
      non-missing value within the group (flox/aggregations.py:855-876).
      No-op passthrough for non-float, non-nullable semantics mirrors
      flox/scan.py:199-201 (we fill NULLs for any type).
    - ``cumcount``: running count of non-missing values (bonus, the
      ``nanlen`` scan analog).
    - ``cumprod`` / ``nancumprod``: running product via exp/log of
      absolute values with sign tracking is numerically lossy, so we
      implement it exactly with a product aggregate over the window.

    Returns ``df`` with one added column (default name = func), the
    original row set and order preserved — flox returns an array of
    the input shape (flox/scan.py:300-315).

    ``func`` may also be a custom ``Scan`` spec (the escape hatch
    mirroring flox's public ``Scan`` dataclass,
    flox/aggregations.py:715-737): its ``build`` receives a
    ``ScanContext`` with the group window and returns the window
    Column.
    """
    custom = isinstance(func, Scan)
    if not custom and func not in SCANS:
        raise ValueError(f"unknown scan {func!r}; valid: {SCANS}")
    out = alias or (func.name if custom else func)
    if dtype is not None:
        from flox_spark.core import _spark_type

        df = df.withColumn(value, F.col(value).cast(_spark_type(dtype)))

    from flox_spark import blocked_route

    blocked_route.validate_plan(plan, "groupby_scan")
    if plan == "blocked" and custom:
        raise ValueError(
            "plan='blocked' does not apply to custom Scan specs (no "
            "generic carry decomposition for an arbitrary window "
            "expression); use plan='window'"
        )
    if not custom and plan != "window":
        from flox_spark.options import OPTIONS
        from flox_spark.scan_blocked import _SUPPORTED as _BLOCKED_SCANS

        _shiftlike = func in ("shift", "diff", "pct_change")
        blockable = func in _BLOCKED_SCANS or _shiftlike
        if plan == "blocked" or (
            blockable
            and blocked_route.route_to_blocked(
                df, by, OPTIONS["blocked_route_scan_rows"], order_by=order_by
            )
        ):
            if _shiftlike:
                from flox_spark.shift_blocked import groupby_shift_blocked

                return groupby_shift_blocked(
                    df, *by, value=value, order_by=order_by, func=func,
                    periods=int((finalize_kwargs or {}).get("periods", 1)),
                    alias=out,
                )
            from flox_spark.scan_blocked import groupby_scan_blocked

            return groupby_scan_blocked(
                df, *by, func=func, value=value, order_by=order_by, alias=out
            )
    vdt = df.schema[value].dataType
    v = F.col(value)
    missing = is_missing(v, vdt)
    v_skip = to_skip(v, vdt)

    w = Window.partitionBy(*by).orderBy(order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    expr: Column
    if custom:
        w_fwd = Window.partitionBy(*by).orderBy(order_by).rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        ctx = ScanContext(
            value=v, v_skip=v_skip, missing=missing, dt=vdt,
            window=w, window_fwd=w_fwd, kwargs=dict(finalize_kwargs or {}),
        )
        return df.withColumn(out, func.build(ctx))
    if func == "cumsum":
        av, _ = arith_input(v_skip, vdt)
        run = F.sum(av).over(w)
        # numpy cumsum: NaN poisons everything from its position on
        poisoned = F.max(F.when(missing, F.lit(1)).otherwise(F.lit(0))).over(w) == 1
        if is_float_type(vdt):
            expr = F.when(poisoned, F.lit(float("nan"))).otherwise(run)
            if vdt.simpleString() == "float":
                expr = expr.cast("float")
        else:
            expr = F.when(poisoned, F.lit(None)).otherwise(run)
    elif func == "nancumsum":
        av, avdt = arith_input(v_skip, vdt)
        zero = F.lit(0).cast("double" if is_float_type(avdt) else "long")
        expr = F.coalesce(F.sum(av).over(w), zero)
        if vdt.simpleString() == "float":
            expr = expr.cast("float")
    elif func == "cumprod" or func == "nancumprod":
        av, _ = arith_input(v_skip, vdt)
        run = F.product(av).over(w)
        if func == "cumprod":
            poisoned = F.max(F.when(missing, F.lit(1)).otherwise(F.lit(0))).over(w) == 1
            if is_float_type(vdt):
                expr = F.when(poisoned, F.lit(float("nan"))).otherwise(run)
            else:
                # integer input: poison must stay NULL — a NaN literal
                # here would be cast to long below, and non-ANSI
                # CAST(NaN AS BIGINT) silently yields 0 (cumsum's int
                # branch already does this)
                expr = F.when(poisoned, F.lit(None)).otherwise(run)
        else:
            expr = F.coalesce(run, F.lit(1.0))
        if not is_float_type(vdt):
            expr = expr.cast("long")
        elif vdt.simpleString() == "float":
            expr = expr.cast("float")
    elif func == "cumcount":
        expr = F.count(v_skip).over(w)
    elif func in ("cummax", "cummin"):
        # NaN-skipping running extrema (beyond-reference utility);
        # preserves input type
        f = F.max if func == "cummax" else F.min
        expr = f(v_skip).over(w)
    elif func == "ffill":
        expr = F.last(v_skip, ignorenulls=True).over(w)
    elif func == "bfill":
        w_fwd = Window.partitionBy(*by).orderBy(order_by).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        expr = F.first(v_skip, ignorenulls=True).over(w_fwd)
    elif func in ("shift", "diff", "pct_change"):
        # pandas GroupBy.shift/diff parity (beyond the reference's
        # SCANS): lag/lead needs an UNFRAMED ordered window.  Rows
        # with no lag partner (group head for positive periods) are
        # NULL — the table-engine missing value — for every dtype;
        # pandas would upcast ints to float and emit NaN there, which
        # a typed column engine deliberately does not do.
        periods = int((finalize_kwargs or {}).get("periods", 1))
        w_ord = Window.partitionBy(*by).orderBy(order_by)
        lagged = (
            F.lag(v, periods).over(w_ord)
            if periods >= 0
            else F.lead(v, -periods).over(w_ord)
        )
        if func == "shift":
            expr = lagged
        elif func == "pct_change":
            # pandas GroupBy.pct_change: v / lag(v) - 1; a zero lag
            # yields NULL via try_divide (ANSI-safe), not an abort
            expr = F.try_divide(v.cast("double"), lagged.cast("double")) - F.lit(1.0)
        else:
            av, _ = arith_input(v, vdt)
            lv, _ = arith_input(lagged, vdt)
            expr = av - lv
            from flox_spark.dtypes import is_datetime_type, is_timedelta_type

            if is_datetime_type(vdt) or is_timedelta_type(vdt):
                # datetime diff yields an interval-like long of
                # microseconds, surfaced as day-time interval
                expr = F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), expr / F.lit(1e6))
            elif vdt.simpleString() == "float":
                expr = expr.cast("float")
    else:  # pragma: no cover
        raise AssertionError(func)

    return df.withColumn(out, expr)


def groupby_ewm(
    df,
    *by: str,
    value: str,
    order_by: str,
    alpha: float | None = None,
    halflife: float | None = None,
    span: float | None = None,
    func: str = "mean",
    adjust: bool = True,
    ignore_na: bool = False,
    out: str | None = None,
    plan: str = "auto",
):
    """Per-group exponentially weighted mean/std/var — pandas
    ``GroupBy.ewm`` parity, including ``adjust`` and ``ignore_na``.

    The EWM recurrence (y_t = f(y_{t-1}, x_t)) is inherently
    sequential per group and NOT window-expressible (a windowed
    formulation needs w^-t terms that overflow doubles past a few
    hundred rows), so this is a deliberate Arrow hatch: groups stream
    through ``groupby_apply_batched`` (one pandas ``groupby(...)
    .ewm()`` cython call per ARROW BATCH, not one Python call per
    group — measured 4.3s -> ~1s on 1 500 small groups) and pandas'
    own ewm kernel runs — bit-identical to pandas by construction.
    Same scale caveat as every per-group sequential op (a group must
    fit one worker's memory).  For ``func="mean"`` the caveat IS
    avoidable — BOTH adjust modes are ratios of LINEAR recurrences,
    which compose across blocks: see ``groupby_ewm_blocked``
    (r13; adjust=False r14, via a two-candidate-state carry for the
    first-observation weight).  var/std (coupled second-moment
    states) stay on this hatch, with the same legitimacy as the
    packing operator's (SURVEY §2.6).

    Exactly one of ``alpha`` / ``halflife`` / ``span``; ``func``:
    mean | var | std (pandas ddof=1 ewm variance).

    ``plan``: ``"auto"`` (default) keeps this per-group hatch unless
    plan stats say rows-per-group crosses the measured blocked
    crossover (``blocked_route.route_to_blocked``;
    OPTIONS["blocked_route_ewm_rows"]) AND the call is in
    ``groupby_ewm_blocked``'s scope (func="mean", both adjust
    modes) — then
    the blocked linear-recurrence form runs, which also lifts this
    hatch's whole-group-in-one-worker memory wall.
    ``"window"``/``"blocked"`` force a strategy ("window" here
    meaning this one-kernel-per-group form)."""
    import pandas as pd  # noqa: F401 — worker-side dependency

    if sum(x is not None for x in (alpha, halflife, span)) != 1:
        raise ValueError("pass exactly one of alpha=, halflife=, span=")
    if func not in ("mean", "var", "std"):
        raise ValueError(f"func must be mean|var|std, got {func!r}")

    from flox_spark import blocked_route

    blocked_route.validate_plan(plan, "groupby_ewm")
    blockable = func == "mean" or adjust  # var/std: adjust=True only
    if plan != "window" and blockable:
        from flox_spark.options import OPTIONS

        if plan == "blocked" or blocked_route.route_to_blocked(
            df, by, OPTIONS["blocked_route_ewm_rows"], order_by=order_by
        ):
            from flox_spark.ewm_blocked import groupby_ewm_blocked

            return groupby_ewm_blocked(
                df, *by, value=value, order_by=order_by, alpha=alpha,
                halflife=halflife, span=span, func=func, adjust=adjust,
                ignore_na=ignore_na, out=out,
            )
    elif plan == "blocked":
        raise ValueError(
            "plan='blocked' requires func='mean' or adjust=True "
            "(groupby_ewm_blocked's scope); adjust=False var/std stay "
            "on the per-group kernel (the renormalized second moment "
            "has no clean affine form)"
        )
    out = out or f"ewm_{func}"
    kw = (
        {"alpha": alpha}
        if alpha is not None
        else {"halflife": halflife}
        if halflife is not None
        else {"span": span}
    )

    in_fields = [f for f in df.schema.fields if f.name in (*by, order_by, value)]
    schema_parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields]
    schema = ", ".join(schema_parts + [f"`{out}` double"])

    keys = list(by)

    def fn(pdf):
        # pdf holds whole groups, (keys, order_by)-sorted — ONE
        # cython ewm pass across all of them.  NB (r13, found by the
        # blocked twin's differential): a WINDOWED groupby op like
        # .ewm does NOT return rows in frame order for MULTI-key
        # groupby(sort=False) — pandas orders the output groups by
        # per-level first-appearance codes, so a later group reusing
        # an earlier-seen key value comes back out of position.
        # Realign through the result's original-index level; the
        # index is reset first because the harness's carry concat can
        # produce duplicate labels.
        pdf = pdf.reset_index(drop=True)
        ew = pdf.groupby(keys, sort=False, dropna=False)[value].ewm(
            adjust=adjust, ignore_na=ignore_na, **kw
        )
        res = getattr(ew, func)()
        keep = pdf.copy()
        keep[out] = res.droplevel(list(range(len(keys)))).sort_index().to_numpy()
        return keep

    from flox_spark.transform import groupby_apply_batched

    return groupby_apply_batched(
        df.select(*[f.name for f in in_fields]), *by,
        fn=fn, schema=schema, order_by=order_by,
    )
