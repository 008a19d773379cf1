"""Streaming windowed entropy: equality vs the batch operator over
the same tumbling windows, across micro-batches."""

import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark import groupby_entropy
from flox_spark.streaming import groupby_entropy_stream


def test_entropy_stream_equals_batch(spark):
    rng = np.random.default_rng(17)
    n = 400
    base = dt.datetime(2024, 3, 1)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 3 * 3600, n)
            ],
            "c": rng.choice(list("abcd"), n, p=[0.55, 0.25, 0.15, 0.05]),
        }
    ).sort_values("ts").reset_index(drop=True)
    # far-future flush row closes every real window in append mode;
    # its own never-finalized window is excluded from the comparison
    flush = pd.DataFrame(
        {"k": [99], "ts": [base + dt.timedelta(days=2)], "c": ["x"]}
    )
    batches = [pdf.iloc[:200], pdf.iloc[200:], flush]

    tmp = tempfile.mkdtemp(prefix="flox_entropy_stream_")
    try:
        for i, b in enumerate(batches):
            spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
            time.sleep(1.1)
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = groupby_entropy_stream(
            stream, "k", value="c", time_col="ts",
            window="1 hour", watermark="0 seconds",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("flox_entropy_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["window_start"], r["k"]): r["entropy"]
            for r in spark.sql("SELECT * FROM flox_entropy_stream").collect()
            if r["k"] != 99
        }

        # batch reference over the same tumbling windows
        bdf = spark.createDataFrame(pdf).withColumn(
            "w", F.window(F.col("ts"), "1 hour")["start"]
        )
        exp = {
            (r["w"], r["k"]): r["entropy"]
            for r in groupby_entropy(bdf, "w", "k", value="c").collect()
        }
        assert set(got) == set(exp)
        for key in exp:
            assert got[key] == pytest.approx(exp[key], rel=1e-12), key
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
