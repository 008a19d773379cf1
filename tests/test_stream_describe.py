"""Streaming windowed describe + outlier fences: equality vs the
batch operators over the same tumbling windows at watermark close."""

import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark import flag_outliers, groupby_describe
from flox_spark.streaming import groupby_describe_stream, outlier_fences_stream


def _stream_run(spark, tmp, batches, build):
    for i, b in enumerate(batches):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/*")
    )
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("flox_desc_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM flox_desc_stream").collect()


def _fixture():
    rng = np.random.default_rng(23)
    n = 500
    base = dt.datetime(2024, 5, 1)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 2 * 3600, n)
            ],
            "v": rng.normal(size=n) * 5.0 + 1.0,
        }
    ).sort_values("ts").reset_index(drop=True)
    pdf.loc[rng.random(n) < 0.1, "v"] = np.nan
    # a constant group with n >= 3 inside the first window: zero
    # variance must produce 0.0 (pandas parity) in BOTH the batch and
    # streaming skew/kurtosis twins, not NULL
    const = pd.DataFrame(
        {
            "k": [7] * 6,
            "ts": [base + dt.timedelta(seconds=60 * i) for i in range(6)],
            "v": [5.0] * 6,
        }
    )
    pdf = (
        pd.concat([pdf, const], ignore_index=True)
        .sort_values("ts")
        .reset_index(drop=True)
    )
    flush = pd.DataFrame(
        {"k": [99], "ts": [base + dt.timedelta(days=2)], "v": [0.0]}
    )
    return pdf, [pdf.iloc[:250], pdf.iloc[250:], flush]


def test_describe_stream_equals_batch_approx(spark):
    pdf, batches = _fixture()
    tmp = tempfile.mkdtemp(prefix="flox_desc_stream_")
    try:
        rows = _stream_run(
            spark, tmp, batches,
            lambda s: groupby_describe_stream(
                s, "k", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
            ),
        )
        got = {
            (r["window_start"], r["k"]): r
            for r in rows
            if r["k"] != 99
        }
        # batch reference (approx=True so the percentile members use
        # the same KLL sketch at the same default accuracy)
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp = {
            (r["w"], r["k"]): r
            for r in groupby_describe(bdf, "w", "k", value="v", approx=True).collect()
        }
        assert set(got) == set(exp)
        for key, er in exp.items():
            gr = got[key]
            for c in ("count", "mean", "std", "min", "p25", "p50", "p75", "max"):
                assert gr[c] == pytest.approx(er[c], rel=1e-9, abs=1e-9), (key, c)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_outlier_fences_stream_match_batch_stats(spark):
    pdf, batches = _fixture()
    tmp = tempfile.mkdtemp(prefix="flox_fence_stream_")
    try:
        rows = _stream_run(
            spark, tmp, batches,
            lambda s: outlier_fences_stream(
                s, "k", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
                method="zscore", threshold=2.0,
            ),
        )
        got = {(r["window_start"], r["k"]): r for r in rows if r["k"] != 99}
        # derive expected fences from pandas per (window, group)
        w = pdf.assign(w=pdf.ts.dt.floor("h"))
        for (ws, k), grp in w.groupby(["w", "k"]):
            mu = grp.v.mean()
            sd = grp.v.std(ddof=0)
            r = got[(ws.to_pydatetime(), k)]
            assert r["lo"] == pytest.approx(mu - 2 * sd, rel=1e-9), (ws, k)
            assert r["hi"] == pytest.approx(mu + 2 * sd, rel=1e-9), (ws, k)
            assert r["n"] == grp.v.notna().sum()
        # the fences bound exactly the rows batch flag_outliers flags
        one = w[(w.w == w.w.min())]
        bdf = spark.createDataFrame(one)
        flags = flag_outliers(bdf, "w", "k", value="v", threshold=2.0).collect()
        for fr in flags:
            key = (fr["w"].replace(tzinfo=None) if fr["w"].tzinfo else fr["w"], fr["k"])
            if key not in got or fr["is_outlier"] is None:
                continue
            r = got[key]
            inside = r["lo"] - 1e-9 <= fr["v"] <= r["hi"] + 1e-9
            assert fr["is_outlier"] == (not inside), (key, fr["v"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_skew_kurtosis_stream_equal_batch(spark):
    pdf, batches = _fixture()
    from flox_spark import groupby_kurtosis, groupby_skew
    from flox_spark.streaming import groupby_kurtosis_stream, groupby_skew_stream

    tmp = tempfile.mkdtemp(prefix="flox_sk_stream_")
    try:
        rows_s = _stream_run(
            spark, tmp + "/s", [b.copy() for b in batches],
            lambda s: groupby_skew_stream(
                s, "k", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
            ),
        )
        rows_k = _stream_run(
            spark, tmp + "/k", [b.copy() for b in batches],
            lambda s: groupby_kurtosis_stream(
                s, "k", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
            ),
        )
        got_s = {(r["window_start"], r["k"]): r["skew"] for r in rows_s if r["k"] != 99}
        got_k = {(r["window_start"], r["k"]): r["kurt"] for r in rows_k if r["k"] != 99}
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp_s = {
            (r["w"], r["k"]): r["skew"]
            for r in groupby_skew(bdf, "w", "k", value="v").collect()
        }
        exp_k = {
            (r["w"], r["k"]): r["kurt"]
            for r in groupby_kurtosis(bdf, "w", "k", value="v").collect()
        }
        # the constant group must actually exercise the zero-variance
        # path (batch = 0.0 by pandas parity; stream must agree)
        assert any(k[1] == 7 and v == 0.0 for k, v in exp_s.items())
        assert any(k[1] == 7 and v == 0.0 for k, v in exp_k.items())
        assert set(got_s) == set(exp_s) and set(got_k) == set(exp_k)
        for key in exp_s:
            if exp_s[key] is None:
                assert got_s[key] is None, key
            else:
                assert got_s[key] == pytest.approx(exp_s[key], abs=1e-7), key
        for key in exp_k:
            if exp_k[key] is None:
                assert got_k[key] is None, key
            else:
                assert got_k[key] == pytest.approx(exp_k[key], abs=1e-7), key
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_value_counts_stream_equals_batch(spark):
    from flox_spark.stats import groupby_value_counts
    from flox_spark.streaming import groupby_value_counts_stream

    pdf, batches = _fixture()
    # a low-cardinality value column for meaningful counts
    for fr in (pdf, *batches):
        fr["cat"] = (fr["v"].fillna(-1.0) * 10).astype("int64") % 5
    tmp = tempfile.mkdtemp(prefix="flox_vc_stream_")
    try:
        rows = _stream_run(
            spark, tmp, batches,
            lambda s: groupby_value_counts_stream(
                s, "k", value="cat", time_col="ts",
                window="1 hour", watermark="0 seconds",
            ),
        )
        got = {
            (r["window_start"], r["k"], r["cat"]): r["count"]
            for r in rows
            if r["k"] != 99
        }
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp = {
            (r["w"], r["k"], r["cat"]): r["count"]
            for r in groupby_value_counts(bdf, "w", "k", value="cat").collect()
        }
        assert got == exp and len(exp) > 5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_winsorize_bounds_stream_match_batch_quantiles(spark):
    from flox_spark.streaming import winsorize_bounds_stream

    pdf, batches = _fixture()
    tmp = tempfile.mkdtemp(prefix="flox_wz_stream_")
    try:
        rows = _stream_run(
            spark, tmp, batches,
            lambda s: winsorize_bounds_stream(
                s, "k", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
                lower=0.1, upper=0.9,
            ),
        )
        got = {(r["window_start"], r["k"]): r for r in rows if r["k"] != 99}
        # expected bounds: the batch percentile_approx at the same
        # accuracy over the same (window, group) slices
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp = {
            (r["w"], r["k"]): r
            for r in bdf.groupBy("w", "k")
            .agg(
                F.percentile_approx(
                    F.when(~F.isnan("v"), F.col("v")), F.lit(0.1), F.lit(10000)
                ).alias("q_lo"),
                F.percentile_approx(
                    F.when(~F.isnan("v"), F.col("v")), F.lit(0.9), F.lit(10000)
                ).alias("q_hi"),
                F.count(F.when(~F.isnan("v"), F.col("v"))).alias("n"),
            )
            .collect()
        }
        assert set(got) == set(exp)
        for key, er in exp.items():
            gr = got[key]
            assert gr["q_lo"] == pytest.approx(er["q_lo"], rel=1e-9), key
            assert gr["q_hi"] == pytest.approx(er["q_hi"], rel=1e-9), key
            assert gr["n"] == er["n"], key
        # the constant group's bounds collapse to the constant
        const_keys = [kk for kk in got if kk[1] == 7]
        assert const_keys and all(
            got[kk]["q_lo"] == 5.0 and got[kk]["q_hi"] == 5.0 for kk in const_keys
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_value_counts_stream_normalize_downstream(spark):
    # the documented normalize recipe: divide by the closed window's
    # total in a stateless batch projection over the sink
    from flox_spark.stats import groupby_value_counts
    from flox_spark.streaming import groupby_value_counts_stream

    pdf, batches = _fixture()
    for fr in (pdf, *batches):
        fr["cat"] = (fr["v"].fillna(-1.0) * 10).astype("int64") % 5
    tmp = tempfile.mkdtemp(prefix="flox_vcn_stream_")
    try:
        rows = _stream_run(
            spark, tmp, batches,
            lambda s: groupby_value_counts_stream(
                s, "k", value="cat", time_col="ts",
                window="1 hour", watermark="0 seconds",
            ),
        )
        sink = spark.createDataFrame([r.asDict() for r in rows])
        from pyspark.sql import Window as W

        tot = F.sum("count").over(W.partitionBy("window_start", "k"))
        norm = sink.withColumn("prop", (F.col("count") / tot).cast("double"))
        got = {
            (r["window_start"], r["k"], r["cat"]): r["prop"]
            for r in norm.collect()
            if r["k"] != 99
        }
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp = {
            (r["w"], r["k"], r["cat"]): r["count"]
            for r in groupby_value_counts(
                bdf, "w", "k", value="cat", normalize=True
            ).collect()
        }
        assert set(got) == set(exp)
        for key in exp:
            assert got[key] == pytest.approx(exp[key], rel=1e-9), key
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
