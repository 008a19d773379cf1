"""Salted streaming reduction: equality vs the batch engine over the
same windows, across micro-batches and skewed keys."""

import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from flox_spark.streaming import groupby_reduce_stream_salted


def _run(spark, tmp, batches, func, value="v", n_salt=8):
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*")
    )
    out = groupby_reduce_stream_salted(
        stream, "k", func=func, value=value, time_col="ts",
        window="1 hour", watermark="0 seconds", n_salt=n_salt,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("flox_salted_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM flox_salted_stream").collect()


@pytest.mark.parametrize("func", ["nansum", "count", "nanmean", "nanmax"])
def test_salted_stream_equals_batch(spark, func):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    n = 300
    base = dt.datetime(2024, 1, 1)
    # skew: 80% of rows on key 0; NaN injection; rows span 3 hour-windows
    ks = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 5, n))
    ts = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 3 * 3600, n)]
    v = rng.normal(size=n) * 10
    v[rng.random(n) < 0.15] = np.nan
    pdf = pd.DataFrame({"k": ks, "ts": ts, "v": v}).sort_values("ts").reset_index(drop=True)
    # a far-future flush row advances the watermark past every real
    # window's end so append mode emits them (and its own window,
    # never finalized, is excluded from the comparison)
    flush = pd.DataFrame({"k": [99], "ts": [base + dt.timedelta(days=2)], "v": [0.0]})
    batches = [pdf.iloc[:150], pdf.iloc[150:], flush]

    tmp = tempfile.mkdtemp(prefix="flox_salted_stream_")
    try:
        got = {
            (r["window_start"], r["k"]): r[func]
            for r in _run(spark, tmp, batches, func)
            if r["k"] != 99
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    from flox_spark.salting import groupby_reduce_salted

    bdf = (
        spark.createDataFrame(pdf)
        .withColumn("__w", F.window("ts", "1 hour"))
        .withColumn("ws", F.col("__w.start"))
        .drop("__w")
    )
    want_rows = groupby_reduce_salted(bdf, "ws", "k", func=func, value="v").collect()
    want = {(r["ws"], r["k"]): r[func] for r in want_rows}
    assert set(got) == set(want)
    for key in want:
        w, g = want[key], got[key]
        if isinstance(w, float) and np.isnan(w):
            assert g is None or np.isnan(g), (key, g, w)
        else:
            assert g == pytest.approx(w, rel=1e-12), (key, g, w)


def test_stream_quantile_uses_sketch_and_matches_batch_approx(spark):
    """Windowed streaming quantile: bounded sketch state, equal to the
    batch percentile_approx over the same windows."""
    import warnings

    from pyspark.sql import functions as F

    from flox_spark.streaming import groupby_reduce_stream

    rng = np.random.default_rng(5)
    n = 200
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame({
        "k": rng.integers(0, 3, n),
        "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 7200, n)],
        "v": rng.normal(size=n) * 10,
    }).sort_values("ts").reset_index(drop=True)
    flush = pd.DataFrame({"k": [99], "ts": [base + dt.timedelta(days=2)], "v": [0.0]})

    tmp = tempfile.mkdtemp(prefix="flox_qstream_")
    try:
        for i, b in enumerate([pdf, flush]):
            spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
            time.sleep(1.1)
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*")
        )
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            out = groupby_reduce_stream(
                stream, "k", func="nanquantile", value="v", time_col="ts",
                window="1 hour", watermark="0 seconds",
                finalize_kwargs={"q": 0.9},
            )
        assert any("sketch" in str(w.message) for w in rec)
        q = (
            out.writeStream.format("memory").queryName("flox_qstream")
            .outputMode("append").option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        got = {
            (r["window_start"], r["k"]): r["nanquantile"]
            for r in spark.sql("SELECT * FROM flox_qstream").collect()
            if r["k"] != 99
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    from flox_spark.options import OPTIONS

    acc = OPTIONS["approx_quantile_accuracy"]
    want_rows = (
        spark.createDataFrame(pdf)
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.percentile_approx("v", 0.9, acc).alias("p"))
        .collect()
    )
    want = {(r["w"]["start"], r["k"]): r["p"] for r in want_rows}
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12), key
