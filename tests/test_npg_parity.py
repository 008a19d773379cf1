"""npg-faithful differentials for arg*/first/last/mode.

The reference's numpy_groupies backend pins the exact tie-break and
NaN policies: mode via scipy.stats.mode — smallest value wins a count
tie, nan_policy propagate (plain) / omit (nan*) —
/root/reference/flox/aggregate_npg.py:185-215; the nan* kernels' NaN
handling at :58-88; argmin/argmax first-occurrence ties per numpy
(flox/core.py:334-336).  scipy/numpy_groupies aren't importable here
(shimmed out in tests/flox_ref.py), so these tests reimplement those
kernels faithfully in a few lines of numpy and differential-test the
engine against them over adversarial data (deliberate ties, NaN
placements, all-NaN groups).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_reduce


def _ref_mode(vals: np.ndarray, skipna: bool) -> float:
    # scipy.stats.mode semantics (aggregate_npg.py:185-191): propagate
    # -> any NaN poisons; omit -> drop NaNs; smallest value wins ties
    v = np.asarray(vals, dtype=float)
    if not skipna and np.isnan(v).any():
        return float("nan")
    v = v[~np.isnan(v)]
    if v.size == 0:
        return float("nan")
    uniq, cnt = np.unique(v, return_counts=True)  # sorted -> smallest first
    return float(uniq[np.argmax(cnt)])  # argmax ties -> first = smallest


def _ref_arg(vals: np.ndarray, skipna: bool, is_max: bool) -> int:
    v = np.asarray(vals, dtype=float)
    if skipna:
        # np.nanarg*: skip NaNs; first occurrence on ties
        return int(np.nanargmax(v) if is_max else np.nanargmin(v))
    # np.arg*: comparisons with NaN are False, so the first NaN wins
    return int(np.argmax(v) if is_max else np.argmin(v))


def _ref_first_last(vals: np.ndarray, skipna: bool, is_last: bool) -> float:
    v = np.asarray(vals, dtype=float)
    if skipna:
        nz = np.where(~np.isnan(v))[0]
        if nz.size == 0:
            return float("nan")
        return float(v[nz[-1] if is_last else nz[0]])
    return float(v[-1] if is_last else v[0])


@pytest.fixture(scope="module")
def adversarial(spark):
    # groups exercising: duplicate extremes (tie-break), NaN at the
    # front / middle / back, an all-NaN group, a bimodal count tie
    rows = []

    def add(g, vals):
        for v in vals:
            rows.append((g, len(rows), v))

    add(0, [3.0, 1.0, 3.0, 1.0, 2.0])          # ties both ends
    add(1, [np.nan, 5.0, 4.0])                 # NaN first
    add(2, [5.0, np.nan, 4.0, np.nan])         # NaN middle
    add(3, [5.0, 4.0, np.nan])                 # NaN last
    add(4, [np.nan, np.nan])                   # all-NaN
    add(5, [2.0, 2.0, 7.0, 7.0, 1.0])          # bimodal tie (mode -> 2)
    add(6, [9.0])                              # singleton
    rng = np.random.default_rng(13)
    vals = np.round(rng.normal(size=60), 1)    # rounding forces ties
    vals[rng.random(60) < 0.2] = np.nan
    add(7, list(vals))
    pdf = pd.DataFrame(rows, columns=["g", "pos", "v"])
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("func", ["mode", "nanmode"])
def test_mode_matches_npg(spark, adversarial, func):
    df, pdf = adversarial
    got = {r["g"]: r[func] for r in
           groupby_reduce(df, "g", func=func, value="v").collect()}
    for g, grp in pdf.groupby("g"):
        want = _ref_mode(grp["v"].to_numpy(), skipna=func.startswith("nan"))
        if math.isnan(want):
            assert got[g] is None or math.isnan(got[g]), (func, g, got[g])
        else:
            assert got[g] == pytest.approx(want, rel=1e-15), (func, g)


@pytest.mark.parametrize(
    "func", ["argmin", "argmax", "nanargmin", "nanargmax"]
)
def test_arg_matches_npg(spark, adversarial, func):
    df, pdf = adversarial
    got = {r["g"]: r[func] for r in
           groupby_reduce(df, "g", func=func, value="v", order_by="pos").collect()}
    for g, grp in pdf.groupby("g"):
        v = grp["v"].to_numpy()
        skipna = func.startswith("nan")
        if skipna and np.isnan(v).all():
            # np.nanarg* raises on all-NaN; flox fills -1 / missing —
            # the engine surfaces NULL (no non-missing row)
            assert got[g] is None, (func, g, got[g])
            continue
        # the engine returns the order column's value = global pos
        want = int(grp["pos"].to_numpy()[_ref_arg(v, skipna, func.endswith("max"))])
        assert got[g] == want, (func, g, got[g], want)


@pytest.mark.parametrize(
    "func", ["first", "last", "nanfirst", "nanlast"]
)
def test_first_last_matches_npg(spark, adversarial, func):
    df, pdf = adversarial
    got = {r["g"]: r[func] for r in
           groupby_reduce(df, "g", func=func, value="v", order_by="pos").collect()}
    for g, grp in pdf.groupby("g"):
        want = _ref_first_last(
            grp["v"].to_numpy(),
            skipna=func.startswith("nan"),
            is_last=func.endswith("last"),
        )
        if math.isnan(want):
            assert got[g] is None or math.isnan(got[g]), (func, g, got[g])
        else:
            assert got[g] == pytest.approx(want, rel=1e-15), (func, g)
