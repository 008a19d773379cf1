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


def test_upsample_ffill_bfill_match_pandas(spark):
    # one observation per bucket, exactly on grid points: pandas
    # asfreq + ffill/bfill is the reference
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in ("a", "b"):
        for h, v in [(0, 1.0), (6, 2.0), (24, 5.0), (30, 6.0)]:
            rows.append((k, base + dt.timedelta(hours=h + (0 if k == "a" else 6)), v))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    df = spark.createDataFrame(pdf)
    from flox_spark import resample_upsample

    for method, pd_op in [("ffill", "ffill"), ("bfill", "bfill")]:
        got = {
            (r["k"], r["ts"]): r["v"]
            for r in resample_upsample(
                df, "k", time_col="ts", value="v", freq="6h", method=method
            ).collect()
        }
        exp = {}
        for k, grp in pdf.groupby("k"):
            ser = grp.set_index("ts")["v"].resample("6h")
            ser = ser.asfreq().ffill() if pd_op == "ffill" else ser.asfreq().bfill()
            for t, v in ser.items():
                exp[(k, t.to_pydatetime())] = v
        assert got == exp, method


def test_upsample_linear_time_proportional(spark):
    # observations NOT on grid points: interpolation is proportional
    # to real observation times, exact at observation buckets
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 2,
            "ts": [base, base + dt.timedelta(hours=24)],
            "v": [0.0, 24.0],
        }
    )
    df = spark.createDataFrame(pdf)
    from flox_spark import resample_upsample

    got = {
        r["ts"]: r["v"]
        for r in resample_upsample(
            df, "k", time_col="ts", value="v", freq="6h", method="linear"
        ).collect()
    }
    for h in (0, 6, 12, 18, 24):
        assert got[base + dt.timedelta(hours=h)] == pytest.approx(float(h)), h


def test_upsample_multi_obs_bucket_takes_latest(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 3,
            "ts": [base, base + dt.timedelta(hours=1), base + dt.timedelta(hours=12)],
            "v": [1.0, 99.0, 3.0],
        }
    )
    from flox_spark import resample_upsample

    got = {
        r["ts"]: r["v"]
        for r in resample_upsample(
            spark.createDataFrame(pdf), "k", time_col="ts", value="v",
            freq="6h", method="ffill",
        ).collect()
    }
    # bucket 00:00 holds two obs -> the 01:00 row (latest) wins; the
    # empty 06:00 bucket carries it forward
    assert got[base] == 99.0
    assert got[base + dt.timedelta(hours=6)] == 99.0
    assert got[base + dt.timedelta(hours=12)] == 3.0


def test_upsample_rejects_calendar_freq(spark):
    import datetime as dt

    pdf = pd.DataFrame({"k": ["a"], "ts": [dt.datetime(2024, 1, 1)], "v": [1.0]})
    from flox_spark import resample_upsample

    with pytest.raises(ValueError, match="fixed-width"):
        resample_upsample(
            spark.createDataFrame(pdf), "k", time_col="ts", value="v",
            freq="1mo",
        )
