import math

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_reduce_weighted


@pytest.fixture(scope="module")
def wdata():
    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "v": rng.normal(size=n) * 10,
            "w": rng.random(n) * 3,
        }
    )
    pdf.loc[rng.random(n) < 0.15, "v"] = np.nan
    pdf.loc[rng.random(n) < 0.05, "w"] = np.nan
    return pdf


def _np_weighted(pdf, func):
    out = {}
    for g, grp in pdf.groupby("k"):
        v = grp["v"].to_numpy()
        w = np.nan_to_num(grp["w"].to_numpy(), nan=0.0)
        mask = ~np.isnan(v)
        weff = np.where(mask, w, 0.0)
        sw = weff.sum()
        if func == "count":
            out[g] = sw
            continue
        swv = np.nansum(weff * np.nan_to_num(v))
        if func == "sum":
            out[g] = swv
        elif func == "mean":
            out[g] = swv / sw
        elif func in ("var", "std"):
            mu = swv / sw
            var = np.nansum(weff * (np.nan_to_num(v) - mu) ** 2) / sw
            out[g] = math.sqrt(var) if func == "std" else var
    return out


@pytest.mark.parametrize("base", ["count", "sum", "mean", "var", "std"])
def test_nan_weighted_vs_numpy(spark, wdata, base):
    func = "nan" + base
    df = spark.createDataFrame(wdata)
    got = {
        r["k"]: r[func]
        for r in groupby_reduce_weighted(df, "k", func=func, value="v", weights="w").collect()
    }
    want = _np_weighted(wdata, base)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], rel=1e-9), (func, g)


def test_plain_variant_poisons(spark, wdata):
    df = spark.createDataFrame(wdata)
    got = {
        r["k"]: r["mean"]
        for r in groupby_reduce_weighted(df, "k", func="mean", value="v", weights="w").collect()
    }
    has_nan = wdata.groupby("k")["v"].apply(lambda s: s.isna().any()).to_dict()
    want = _np_weighted(wdata, "mean")
    for g, poisoned in has_nan.items():
        if poisoned:
            assert math.isnan(got[g]), g
        else:
            assert got[g] == pytest.approx(want[g], rel=1e-9), g


def test_uniform_weights_match_unweighted(spark, wdata):
    from flox_spark import groupby_reduce

    df = spark.createDataFrame(wdata.assign(w1=1.0))
    a = {
        r["k"]: r["nanmean"]
        for r in groupby_reduce_weighted(df, "k", func="nanmean", value="v", weights="w1").collect()
    }
    b = {r["k"]: r["nanmean"] for r in groupby_reduce(df, "k", func="nanmean", value="v").collect()}
    for g in b:
        assert a[g] == pytest.approx(b[g], rel=1e-12)


def test_weighted_rejects_unknown(spark, wdata):
    df = spark.createDataFrame(wdata)
    with pytest.raises(ValueError, match="weighted supports"):
        groupby_reduce_weighted(df, "k", func="median", value="v", weights="w")


def test_all_missing_group_yields_nan(spark):
    pdf = pd.DataFrame(
        {"k": [0, 0, 1], "v": [np.nan, np.nan, 2.0], "w": [1.0, 2.0, 1.0]}
    )
    df = spark.createDataFrame(pdf)
    for func in ("nanmean", "nanvar", "nanstd"):
        got = {r["k"]: r[func] for r in
               __import__("flox_spark").groupby_reduce_weighted(
                   df, "k", func=func, value="v", weights="w").collect()}
        # zero effective weight divides to NULL in Spark; the engine
        # must surface NaN (xarray parity), never None
        assert isinstance(got[0], float) and math.isnan(got[0]), func
        assert not math.isnan(got[1]), func


@pytest.mark.parametrize("offset", [1e7, 1e9])
@pytest.mark.parametrize("base", ["var", "std"])
def test_weighted_var_offset_stability(spark, offset, base):
    # Mirror of reference tests/test_core.py:2293-2321 (shift-by-first
    # stability, flox/aggregate_npg.py:112-126): unit-variance values at
    # a large offset must reduce to ~1, not drown in cancellation.
    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n),
            "v": rng.normal(size=n) + offset,
            "w": rng.random(n) * 3 + 0.1,
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["k"]: r["nan" + base]
        for r in groupby_reduce_weighted(
            df, "k", func="nan" + base, value="v", weights="w"
        ).collect()
    }
    for g, grp in pdf.groupby("k"):
        v, w = grp["v"].to_numpy(), grp["w"].to_numpy()
        mu = np.average(v, weights=w)
        want = np.average((v - mu) ** 2, weights=w)
        if base == "std":
            want = math.sqrt(want)
        assert got[g] == pytest.approx(want, rel=1e-9), (base, offset, g)


def test_weighted_sum_past_2_53_matches_numpy_float64(spark):
    # int64 values beyond 2^53 round through double (weights force
    # fractional arithmetic) — the result must equal numpy's float64
    # dot product (the xarray .weighted().sum() reference behavior),
    # NOT exact integer arithmetic.  Pins the documented caveat.
    big = (1 << 53) + 1  # not representable as double
    vals = np.array([big, big, 7], dtype=np.int64)
    wts = np.array([1.0, 0.5, 2.0])
    pdf = pd.DataFrame({"k": [0, 0, 0], "v": vals, "w": wts})
    out = groupby_reduce_weighted(
        spark.createDataFrame(pdf), "k", func="sum", value="v", weights="w"
    ).collect()
    expected = float(np.dot(vals.astype(np.float64), wts))
    assert out[0]["sum"] == expected
    # and the rounding is real: float64(2^53+1) == 2^53, so the dot
    # understates the exact rational sum by exactly 1.5 here
    from fractions import Fraction

    exact = Fraction(big) * 1 + Fraction(big) * Fraction(1, 2) + 7 * 2
    assert Fraction(expected) != exact
    assert float(exact - Fraction(expected)) == 1.5
