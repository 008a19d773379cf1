"""groupby_ewm: pandas-exact differential across parameterizations
(the applyInPandas hatch is pandas by construction, so the test's job
is the wiring — ordering, label rule, NaN pass-through, options)."""

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_ewm


@pytest.fixture(scope="module")
def tdata():
    rng = np.random.default_rng(9)
    n = 300
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n).astype("int64"),
            "t": np.arange(n, dtype="int64"),
            "v": rng.normal(size=n),
        }
    )
    pdf.loc[rng.random(n) < 0.15, "v"] = np.nan
    pdf.loc[rng.random(n) < 0.05, "k"] = None
    return pdf


@pytest.mark.parametrize("adjust", [True, False])
@pytest.mark.parametrize("ignore_na", [True, False])
def test_ewm_mean_matches_pandas(spark, tdata, adjust, ignore_na):
    df = spark.createDataFrame(tdata)
    got = {
        (r["k"], r["t"]): r["ewm_mean"]
        for r in groupby_ewm(
            df, "k", value="v", order_by="t", alpha=0.3,
            adjust=adjust, ignore_na=ignore_na,
        ).collect()
    }
    work = tdata.dropna(subset=["k"]).sort_values("t")
    exp = work.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=adjust, ignore_na=ignore_na).mean()
    )
    assert len(got) == len(work)
    for (k, t), e in zip(zip(work.k, work.t), exp):
        g = got[(k, t)]
        if np.isnan(e):
            assert g is None or np.isnan(g), (k, t)
        else:
            assert g == pytest.approx(e, rel=1e-12), (k, t)


@pytest.mark.parametrize("func", ["var", "std"])
def test_ewm_var_std_match_pandas(spark, tdata, func):
    df = spark.createDataFrame(tdata)
    got = {
        (r["k"], r["t"]): r[f"ewm_{func}"]
        for r in groupby_ewm(
            df, "k", value="v", order_by="t", span=10, func=func
        ).collect()
    }
    work = tdata.dropna(subset=["k"]).sort_values("t")
    exp = work.groupby("k")["v"].transform(
        lambda s: getattr(s.ewm(span=10), func)()
    )
    for (k, t), e in zip(zip(work.k, work.t), exp):
        g = got[(k, t)]
        if np.isnan(e):
            assert g is None or np.isnan(g), (k, t)
        else:
            assert g == pytest.approx(e, rel=1e-12), (k, t)


def test_ewm_validates_params(spark, tdata):
    df = spark.createDataFrame(tdata)
    with pytest.raises(ValueError, match="exactly one"):
        groupby_ewm(df, "k", value="v", order_by="t")
    with pytest.raises(ValueError, match="exactly one"):
        groupby_ewm(df, "k", value="v", order_by="t", alpha=0.5, span=3)
    with pytest.raises(ValueError, match="func"):
        groupby_ewm(df, "k", value="v", order_by="t", alpha=0.5, func="median")


def test_groupby_ewm_multikey_interleaved_groups(spark):
    # r13 regression pin (found by the blocked twin's differential):
    # pandas GroupBy(sort=False).ewm() output is ordered by per-level
    # first-appearance codes — a MULTI-key groupby whose later groups
    # reuse earlier-seen key values misaligned positionally.  The
    # realigned groupby_ewm must equal the per-group pandas golden.
    import numpy as np
    import pandas as pd

    from flox_spark.scan import groupby_ewm

    rng = np.random.default_rng(7)
    rows = []
    # key reuse pattern that triggers the code-order mismatch:
    # (a, 2) appears before (b, 1) but b's groups start with key2=2
    for k1, k2s in (("a", [2]), ("b", [2, 1]), ("c", [1, 0, 2])):
        for k2 in k2s:
            for i in range(rng.integers(4, 9)):
                rows.append((k1, int(k2), len(rows),
                             float(rng.normal(0, 10))))
    pdf = pd.DataFrame(rows, columns=["k1", "k2", "t", "v"])
    df = spark.createDataFrame(pdf)
    got = {
        (r["k1"], r["k2"], r["t"]): r["ewm_mean"]
        for r in groupby_ewm(
            df, "k1", "k2", value="v", order_by="t", alpha=0.4
        ).collect()
    }
    for (k1, k2), seg in pdf.groupby(["k1", "k2"]):
        seg = seg.sort_values("t")
        gold = seg["v"].ewm(alpha=0.4, adjust=True, ignore_na=False).mean()
        for t, w in zip(seg["t"], gold):
            assert abs(got[(k1, k2, t)] - w) <= 1e-12 * max(1, abs(w)), (
                k1, k2, t)
