"""stream_ewm_mean: multi-batch stream == batch groupby_ewm over the
concatenated input; single-batch replay parity; checkpoint restart;
out-of-order guard.
"""

import math
import time

import numpy as np
import pandas as pd
import pytest

from flox_spark.scan import groupby_ewm
from flox_spark.streaming import stream_ewm_mean


def _batches(seed=4, n=240, k=3, nb=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 10, n)
    v[::9] = np.nan
    vals = [None if i % 13 == 0 else float(x) for i, x in enumerate(v)]
    pdf = pd.DataFrame({
        "k": [f"g{i % k}" for i in range(n)],
        "t": np.arange(n, dtype=np.int64),
        "v": vals,
    })
    # split by TIME so each key's rows arrive in order across batches
    step = n // nb
    return [pdf.iloc[i * step:(i + 1) * step if i < nb - 1 else n]
            for i in range(nb)], pdf


def _run_stream(spark, tmp_path, batches, qname, col="ewm_mean", **kw):
    tmp = str(tmp_path)
    for i, b in enumerate(batches):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/*")
    )
    out = stream_ewm_mean(stream, "k", value="v", order_by="t", **kw)
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT k, t, {col} FROM {qname}").collect()


def _close(stream_rows, batch_rows, rtol=1e-9, col="ewm_mean"):
    got = {(r["k"], r["t"]): r[col] for r in stream_rows}
    want = {(r["k"], r["t"]): r[col] for r in batch_rows}
    assert set(got) == set(want)
    for key in want:
        x, y = want[key], got[key]
        if x is None or (isinstance(x, float) and math.isnan(x)):
            assert y is None or math.isnan(y), (key, x, y)
        else:
            assert y is not None and abs(x - y) <= rtol * max(1.0, abs(x)), (
                key, x, y)


@pytest.mark.parametrize("ignore_na", [False, True])
def test_stream_equals_batch_across_batches(spark, tmp_path, ignore_na):
    batches, full = _batches()
    rows = _run_stream(
        spark, tmp_path, batches, f"ewmstream_{ignore_na}",
        alpha=0.3, ignore_na=ignore_na,
    )
    want = groupby_ewm(
        spark.createDataFrame(full), "k", value="v", order_by="t",
        alpha=0.3, ignore_na=ignore_na,
    ).collect()
    _close(rows, want)


def test_stream_single_batch_replay(spark, tmp_path):
    batches, full = _batches(nb=1)
    rows = _run_stream(spark, tmp_path, batches, "ewmstream_one", span=9)
    want = groupby_ewm(
        spark.createDataFrame(full), "k", value="v", order_by="t", span=9
    ).collect()
    _close(rows, want)


def test_stream_restart_recovers_state(spark, tmp_path):
    batches, full = _batches(seed=9)
    tmp = str(tmp_path)
    # run the first two batches, stop, then the third with the SAME
    # checkpoint: the carried (num, den, frontier) must resume
    for i, b in enumerate(batches[:2]):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema

    def start():
        # file sink, not memory: only durable sinks support restarting
        # from a checkpoint
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*")
        )
        out = stream_ewm_mean(stream, "k", value="v", order_by="t", alpha=0.4)
        return (
            out.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True).start()
        )

    q = start(); q.awaitTermination(180)
    spark.createDataFrame(batches[2]).coalesce(1).write.parquet(f"{tmp}/in/f2")
    q = start(); q.awaitTermination(180)
    rows = spark.read.parquet(f"{tmp}/out").select("k", "t", "ewm_mean").collect()
    want = groupby_ewm(
        spark.createDataFrame(full), "k", value="v", order_by="t", alpha=0.4
    ).collect()
    _close(rows, want)


def test_stream_out_of_order_raises(spark, tmp_path):
    tmp = str(tmp_path)
    b1 = pd.DataFrame({"k": ["a"] * 3, "t": [10, 11, 12], "v": [1.0, 2.0, 3.0]})
    b2 = pd.DataFrame({"k": ["a"] * 2, "t": [5, 13], "v": [9.0, 9.0]})  # late row
    for i, b in enumerate((b1, b2)):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*")
    )
    out = stream_ewm_mean(stream, "k", value="v", order_by="t", alpha=0.3)
    q = (
        out.writeStream.format("memory").queryName("ewmlate")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="older than the carried frontier"):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()


@pytest.mark.parametrize("ignore_na", [False, True])
def test_stream_adjust_false_equals_batch(spark, tmp_path, ignore_na):
    # r14: the (avg, gap_rows, seen) carried state — multi-batch
    # stream equals batch groupby_ewm(adjust=False) over the
    # concatenated input, both ignore_na modes (ignore_na=False
    # exercises the cross-batch w1 = b^(gap+first+1) boundary)
    batches, full = _batches(seed=11)
    rows = _run_stream(
        spark, tmp_path, batches, f"ewmadjf_{ignore_na}",
        alpha=0.35, adjust=False, ignore_na=ignore_na,
    )
    want = groupby_ewm(
        spark.createDataFrame(full), "k", value="v", order_by="t",
        alpha=0.35, adjust=False, ignore_na=ignore_na, plan="window",
    ).collect()
    _close(rows, want)


def test_stream_adjust_false_leading_missing_batches(spark, tmp_path):
    # a whole leading micro-batch with no valid observation for one
    # key: the gap must accumulate across batches and the first-event
    # weight account for it
    pdf = pd.DataFrame({
        "k": ["a"] * 9,
        "t": np.arange(9, dtype=np.int64),
        "v": [None, None, None, 5.0, None, 2.0, None, None, 4.0],
    })
    batches = [pdf.iloc[:3], pdf.iloc[3:6], pdf.iloc[6:]]
    rows = _run_stream(
        spark, tmp_path, batches, "ewmadjf_lead",
        alpha=0.4, adjust=False, ignore_na=False,
    )
    want = groupby_ewm(
        spark.createDataFrame(pdf), "k", value="v", order_by="t",
        alpha=0.4, adjust=False, ignore_na=False, plan="window",
    ).collect()
    _close(rows, want)


@pytest.mark.parametrize("func", ["var", "std"])
def test_stream_var_equals_batch(spark, tmp_path, func):
    # r14: the linear carry extended with (Swx2, Sw2); anchored per
    # key by the first observed value carried in state
    batches, full = _batches(seed=21)
    col = f"ewm_{func}"
    rows = _run_stream(
        spark, tmp_path, batches, f"ewmvar_{func}", col=col,
        alpha=0.3, func=func,
    )
    want = groupby_ewm(
        spark.createDataFrame(full), "k", value="v", order_by="t",
        alpha=0.3, func=func, plan="window",
    ).collect()
    _close(rows, want, rtol=1e-7, col=col)


def test_stream_var_rejects_adjust_false(spark):
    import pandas as _pd

    from flox_spark.streaming import stream_ewm_mean as _s

    df = spark.createDataFrame(_pd.DataFrame({"k": ["a"], "t": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="adjust=True only"):
        _s(df, "k", value="v", order_by="t", alpha=0.3, func="var",
           adjust=False)
