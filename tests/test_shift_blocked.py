"""groupby_shift_blocked vs groupby_scan(shift/diff/pct_change): the
blocked lag must be BITWISE equal to the one-window form (a shift
copies values — no arithmetic drift is possible) across funcs,
periods (incl. beyond the block size), both directions, NULL/NaN
values, and datetime diff.
"""

import math

import numpy as np
import pandas as pd
import pytest

from flox_spark.scan import groupby_scan
from flox_spark.shift_blocked import groupby_shift_blocked


def _frame(spark, n=400, seed=2, groups=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 10, n)
    v[::9] = np.nan
    vals = [None if i % 13 == 0 else float(x) for i, x in enumerate(v)]
    pdf = pd.DataFrame({
        "k": [f"g{i % groups}" for i in range(n)],
        "t": np.arange(n, dtype=np.int64),
        "v": vals,
    })
    return spark.createDataFrame(pdf)


def _rows(df, out):
    return sorted(
        ((r["k"], r["t"], r[out]) for r in df.select("k", "t", out).collect()),
        key=str,
    )


def _eq(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x[:2] == y[:2], (x, y)
        xv, yv = x[2], y[2]
        if xv is None or yv is None:
            assert xv == yv, (x, y)
        elif isinstance(xv, float) and math.isnan(xv):
            assert isinstance(yv, float) and math.isnan(yv), (x, y)
        else:
            assert xv == yv, (x, y)  # bitwise


@pytest.mark.parametrize("func", ["shift", "diff", "pct_change"])
@pytest.mark.parametrize("periods", [1, 3, 7, -1, -4])
def test_blocked_shift_matches_window(spark, func, periods):
    df = _frame(spark)
    want = _rows(groupby_scan(
        df, "k", func=func, value="v", order_by="t",
        finalize_kwargs={"periods": periods},
    ), func)
    # num_blocks=5 with periods up to 7: carries span MULTIPLE blocks
    got = _rows(groupby_shift_blocked(
        df, "k", value="v", order_by="t", func=func, periods=periods,
        num_blocks=5,
    ), func)
    _eq(want, got)


def test_blocked_shift_datetime_diff(spark):
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 4,
        "t": range(10),
        "v": [base + pd.Timedelta(minutes=m) for m in
              (0, 7, 9, 30, 31, 55, 2, 4, 90, 91)],
    })
    df = spark.createDataFrame(pdf)
    want = _rows(groupby_scan(
        df, "k", func="diff", value="v", order_by="t"), "diff")
    got = _rows(groupby_shift_blocked(
        df, "k", value="v", order_by="t", func="diff", num_blocks=3), "diff")
    _eq(want, got)


def test_blocked_shift_degenerate(spark):
    # num_blocks=1; tiny groups shorter than periods; periods=0
    pdf = pd.DataFrame({
        "k": ["a", "a", "b"], "t": [1, 2, 3], "v": [10.0, None, 5.0]
    })
    df = spark.createDataFrame(pdf)
    for periods in (0, 1, 5, -2):
        want = _rows(groupby_scan(
            df, "k", func="shift", value="v", order_by="t",
            finalize_kwargs={"periods": periods}), "shift")
        for nb in (1, 4):
            got = _rows(groupby_shift_blocked(
                df, "k", value="v", order_by="t", periods=periods,
                num_blocks=nb), "shift")
            _eq(want, got)


def test_blocked_shift_rejects_bad_args(spark):
    df = _frame(spark, n=5)
    with pytest.raises(ValueError, match="blocked shift supports"):
        groupby_shift_blocked(df, "k", value="v", order_by="t", func="cumsum")


# ---- hypothesis fuzz ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=hst.integers(0, 10_000),
    n=hst.integers(1, 80),
    groups=hst.integers(1, 4),
    nb=hst.integers(1, 8),
    periods=hst.integers(-6, 6),
    func=hst.sampled_from(["shift", "diff", "pct_change"]),
)
def test_blocked_shift_property(spark, seed, n, groups, nb, periods, func):
    df = _frame(spark, n=n, seed=seed, groups=groups)
    want = _rows(groupby_scan(
        df, "k", func=func, value="v", order_by="t",
        finalize_kwargs={"periods": periods}), func)
    got = _rows(groupby_shift_blocked(
        df, "k", value="v", order_by="t", func=func, periods=periods,
        num_blocks=nb), func)
    _eq(want, got)
