import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from flox_spark.operators import sessionize
from flox_spark.streaming import stream_sessionize


def _ts(*mins):
    return [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in mins]


def _run(spark, tmp, batches, gap_s):
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{tmp}/in/*")
    )
    out = stream_sessionize(stream, "k", ts="ts", gap_seconds=gap_s)
    q = (
        out.writeStream.format("memory")
        .queryName("flox_ssess")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM flox_ssess").collect()


def test_session_counter_carries_across_batches(spark):
    tmp = tempfile.mkdtemp(prefix="flox_ssess_")
    try:
        # batch 0: events @0, @5 (session 0) then @60 (session 1)
        # batch 1: @65 continues session 1; @200 opens session 2
        f0 = pd.DataFrame({"k": [1] * 3, "eid": [0, 1, 2], "ts": _ts(0, 5, 60)})
        f1 = pd.DataFrame({"k": [1] * 2, "eid": [3, 4], "ts": _ts(65, 200)})
        rows = {r["eid"]: r["session_id"] for r in _run(spark, tmp, [f0, f1], 1800)}
        assert rows == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_equals_batch_sessionize_inorder(spark):
    rng = np.random.default_rng(3)
    n = 120
    ts = sorted(
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))
        for s in np.cumsum(rng.integers(1, 4000, n))
    )
    pdf = pd.DataFrame({"k": rng.integers(0, 4, n), "eid": range(n), "ts": ts})
    tmp = tempfile.mkdtemp(prefix="flox_ssess_eq_")
    try:
        got = {r["eid"]: r["session_id"] for r in _run(spark, tmp, [pdf.iloc[:60], pdf.iloc[60:]], 1800)}
        want = {
            r["eid"]: r["session_id"]
            for r in sessionize(
                spark.createDataFrame(pdf), "k", ts="ts", gap_seconds=1800, tiebreak="eid"
            ).collect()
        }
        assert got == want
        assert max(want.values()) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
