import datetime as dt
import shutil
import tempfile
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators.asof import asof_join
from flox_spark.streaming import stream_asof_enrich


def _ts(*mins):
    return [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in mins]


def _run(spark, tmp, left_batches, right_batches):
    # left/right interleave as (f0_left, f0_right), (f1_left, f1_right)
    # with one tagged directory each; union at read time
    for i, (lp, rp) in enumerate(zip(left_batches, right_batches)):
        spark.createDataFrame(lp).coalesce(1).write.parquet(f"{tmp}/l/f{i}")
        spark.createDataFrame(rp).coalesce(1).write.parquet(f"{tmp}/r/f{i}")
        time.sleep(1.1)
    lschema = spark.read.parquet(f"{tmp}/l/f0").schema
    rschema = spark.read.parquet(f"{tmp}/r/f0").schema
    # maxFilesPerTrigger applies per source: batch i pairs l/f{i}+r/f{i}
    ls = spark.readStream.schema(lschema).option("maxFilesPerTrigger", 1).parquet(f"{tmp}/l/*")
    rs = spark.readStream.schema(rschema).option("maxFilesPerTrigger", 1).parquet(f"{tmp}/r/*")
    out = stream_asof_enrich(ls, rs, "k", left_ts="ts", right_ts="rts")
    q = (
        out.writeStream.format("memory")
        .queryName("flox_enrich")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM flox_enrich").collect()


def test_enrich_cross_batch_state(spark):
    tmp = tempfile.mkdtemp(prefix="flox_enrich_")
    try:
        # batch 0: right update @10 (rate 1.5), left event @20
        # batch 1: left events @30 (still 1.5) and @60 after the
        #          batch-1 right update @50 (rate 2.5)
        l0 = pd.DataFrame({"k": [1], "lid": [0], "ts": _ts(20)})
        r0 = pd.DataFrame({"k": [1], "rts": _ts(10), "rate": [1.5]})
        l1 = pd.DataFrame({"k": [1, 1], "lid": [1, 2], "ts": _ts(30, 60)})
        r1 = pd.DataFrame({"k": [1], "rts": _ts(50), "rate": [2.5]})
        rows = {r["lid"]: r for r in _run(spark, tmp, [l0, l1], [r0, r1])}
        assert rows[0]["rate"] == 1.5  # same batch
        assert rows[1]["rate"] == 1.5  # state carried across batches
        assert rows[2]["rate"] == 2.5  # updated by batch-1 right row
        assert rows[2]["asof_rts"] == _ts(50)[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_enrich_equals_batch_asof_on_inorder_data(spark):
    # single batch, in-order arrival: streaming enrich == batch asof
    rng_rows = 60
    left = pd.DataFrame(
        {
            "k": [i % 3 for i in range(rng_rows)],
            "lid": list(range(rng_rows)),
            "ts": _ts(*[2 * i for i in range(rng_rows)]),
        }
    )
    right = pd.DataFrame(
        {
            "k": [i % 3 for i in range(10)],
            "rts": _ts(*[11 * i for i in range(10)]),
            "rate": [float(i) for i in range(10)],
        }
    )
    tmp = tempfile.mkdtemp(prefix="flox_enrich_eq_")
    try:
        got = {
            r["lid"]: (r["asof_rts"], r["rate"])
            for r in _run(spark, tmp, [left], [right])
        }
        want_rows = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "k",
            left_ts="ts",
            right_ts="rts",
        ).collect()
        want = {r["lid"]: (r["asof_rts"], r["rate"]) for r in want_rows}
        assert got == want
        assert any(v[0] is not None for v in got.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_enrich_null_left_ts_gets_null_enrichment(spark):
    # batch asof_join sorts NULL timestamps first (never matched);
    # the streaming twin must not hand them the latest state
    tmp = tempfile.mkdtemp(prefix="flox_enrich_")
    try:
        l0 = pd.DataFrame({"k": [1, 1], "lid": [0, 1], "ts": [_ts(20)[0], pd.NaT]})
        r0 = pd.DataFrame({"k": [1], "rts": _ts(10), "rate": [1.5]})
        rows = {r["lid"]: r for r in _run(spark, tmp, [l0], [r0])}
        assert rows[0]["rate"] == 1.5
        assert rows[1]["rate"] is None
        assert rows[1]["asof_rts"] is None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
