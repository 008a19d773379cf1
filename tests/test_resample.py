"""resample_reduce vs pandas resample (the reference's dominant
downstream workload: xarray resample lowers to flox groupby_reduce
over datetime-derived labels, flox/xarray.py:73-516)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from flox_spark import resample_reduce, time_bucket


def _frame(n=500, seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-05 03:17:00") + pd.to_timedelta(
        np.cumsum(rng.integers(30, 4000, n)), unit="s"
    )
    return pd.DataFrame({
        "ts": ts,
        "k": rng.integers(0, 3, n),
        "v": rng.normal(size=n) * 10,
    })


@pytest.mark.parametrize("freq", ["15min", "1h", "6h", "1d", "1mo"])
def test_resample_matches_pandas(spark, freq):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = resample_reduce(
        df, "ts", freq, aggs={"s": ("nansum", "v"), "n": ("count", "v")}
    ).collect()
    got = {r["ts_bucket"]: (r["s"], r["n"]) for r in out}

    pfreq = {"1mo": "MS"}.get(freq, freq)
    want = pdf.set_index("ts")["v"].resample(pfreq, origin="epoch").agg(["sum", "count"])
    want = want[want["count"] > 0]  # engine emits only non-empty buckets
    assert len(got) == len(want)
    for ts, row in want.iterrows():
        g = got[ts.to_pydatetime()]
        assert g[0] == pytest.approx(row["sum"], rel=1e-12), (freq, ts)
        assert g[1] == int(row["count"])


def test_resample_extra_by_and_sorted(spark):
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = resample_reduce(
        df, "ts", "1d", aggs={"m": ("nanmean", "v")}, by=["k"]
    ).collect()
    keys = [(r["ts_bucket"], r["k"]) for r in out]
    assert keys == sorted(keys)
    want = (
        pdf.assign(b=pdf["ts"].dt.floor("1d"))
        .groupby(["b", "k"])["v"].mean()
    )
    for r in out:
        assert r["m"] == pytest.approx(
            want.loc[(pd.Timestamp(r["ts_bucket"]), r["k"])], rel=1e-12
        )


def test_resample_origin_anchoring(spark):
    # weekly buckets anchored to a Monday origin start on Mondays
    pdf = _frame()
    df = spark.createDataFrame(pdf)
    out = resample_reduce(
        df, "ts", "1w", aggs={"n": ("count", "v")}, origin="2024-01-01"
    ).collect()  # 2024-01-01 is a Monday
    for r in out:
        assert r["ts_bucket"].weekday() == 0


def test_resample_validates(spark):
    pdf = _frame(20)
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="calendar freq multiples"):
        resample_reduce(df, "ts", "3mo", aggs={"n": ("count", "v")})
    with pytest.raises(ValueError, match="unknown freq"):
        resample_reduce(df, "ts", "5fortnight", aggs={"n": ("count", "v")})
    with pytest.raises(ValueError, match="unparseable"):
        resample_reduce(df, "ts", "", aggs={"n": ("count", "v")})


def test_time_bucket_pre_epoch(spark):
    # pre-origin timestamps bucket LEFT (floor toward -inf), matching
    # pandas origin='epoch' semantics
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"ts": [dt.datetime(1969, 12, 31, 23, 59, 0)]})
    df = spark.createDataFrame(pdf)
    got = df.select(time_bucket(F.col("ts"), "1h").alias("b")).collect()[0]["b"]
    assert got == dt.datetime(1969, 12, 31, 23, 0, 0)
