"""Hypothesis differentials for the round-5 statistics operators —
random values, NaNs and tie-heavy labels against pandas' own kernels
(the repo's property-test strategy, SURVEY §5, applied to the new
surface).  Example counts kept small: each example is a Spark
round-trip."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flox_spark import groupby_kurtosis, groupby_rank, groupby_skew

ex = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def frames(draw):
    n = draw(st.integers(6, 28))
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(-1e5, 1e5, allow_nan=False, width=32),
                st.just(float("nan")),
                # heavy ties
                st.sampled_from([1.0, 2.0]),
            ),
            min_size=n,
            max_size=n,
        )
    )
    labs = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    return pd.DataFrame(
        {"k": np.array(labs), "rid": range(n), "v": np.array(vals, dtype=np.float64)}
    )


@ex
@given(frames())
def test_skew_kurtosis_hypothesis(spark, pdf):
    df = spark.createDataFrame(pdf)
    gs = {r["k"]: r["skew"] for r in groupby_skew(df, "k", value="v").collect()}
    gk = {r["k"]: r["kurt"] for r in groupby_kurtosis(df, "k", value="v").collect()}
    es = pdf.groupby("k")["v"].skew()
    ek = pdf.groupby("k")["v"].apply(lambda x: x.kurt())
    for k in gs:
        for got, exp in ((gs[k], es[k]), (gk[k], ek[k])):
            if exp is None or (isinstance(exp, float) and math.isnan(exp)):
                # pandas emits NaN for degenerate groups; we emit NULL
                # (and inf/-inf when variance underflows to ~0 —
                # guarded by the m2 > 0 gate, so only NULL appears)
                assert got is None or math.isnan(got), (k, got, exp)
            else:
                assert got == pytest.approx(exp, rel=1e-5, abs=1e-6), k


@ex
@given(frames(), st.sampled_from(["average", "min", "max", "dense"]),
       st.sampled_from(["keep", "top", "bottom"]))
def test_rank_pct_hypothesis(spark, pdf, method, na_option):
    df = spark.createDataFrame(pdf)
    got = {
        r["rid"]: r["rank"]
        for r in groupby_rank(
            df, "k", value="v", method=method, na_option=na_option, pct=True
        ).collect()
    }
    exp = pdf.groupby("k")["v"].rank(method=method, na_option=na_option, pct=True)
    for rid, e in zip(pdf.rid, exp):
        g = got[rid]
        if isinstance(e, float) and math.isnan(e):
            assert g is None, rid
        else:
            assert g == pytest.approx(e, rel=1e-12), (rid, method, na_option)


@ex
@given(frames(), st.booleans(), st.booleans())
def test_value_counts_hypothesis(spark, pdf, normalize, dropna):
    from flox_spark import groupby_value_counts

    df = spark.createDataFrame(pdf)
    got = {
        (r["k"], r["v"]): r["count"]
        for r in groupby_value_counts(
            df, "k", value="v", normalize=normalize, dropna=dropna
        ).collect()
    }
    exp = pdf.groupby("k")["v"].value_counts(normalize=normalize, dropna=dropna)
    want = {}
    for (k, v), c in exp.items():
        key = (k, None if (isinstance(v, float) and math.isnan(v)) else v)
        want[key] = c
    assert set(got) == set(want)
    for key, c in want.items():
        assert got[key] == pytest.approx(c, rel=1e-12), key


@ex
@given(frames(), st.floats(0.0, 0.4), st.floats(0.6, 1.0))
def test_winsorize_hypothesis(spark, pdf, lo, hi):
    from flox_spark import winsorize_group

    df = spark.createDataFrame(pdf)
    got = {
        r["rid"]: r["v_w"]
        for r in winsorize_group(
            df, "k", value="v", lower=lo, upper=hi, out="v_w"
        ).collect()
    }
    for k, grp in pdf.groupby("k"):
        vals = grp.v.dropna()
        if len(vals) == 0:
            for rid in grp.rid:
                g = got[rid]
                assert g is None or math.isnan(g), rid
            continue
        qlo, qhi = np.quantile(vals, lo), np.quantile(vals, hi)
        for rid, v in zip(grp.rid, grp.v):
            if math.isnan(v):
                g = got[rid]
                assert g is None or math.isnan(g), rid
            else:
                assert got[rid] == pytest.approx(
                    min(max(v, qlo), qhi), rel=1e-9, abs=1e-9
                ), rid
