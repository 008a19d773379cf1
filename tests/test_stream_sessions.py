import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from flox_spark.operators import sessionize
from pyspark.sql import functions as F
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


def test_stream_session_stats_equals_batch_and_python_rollup(spark):
    # r10 VERDICT #2: the JVM session_window route is the default for
    # rollup-shaped streaming sessionization.  Its per-session rows
    # must equal (a) the batch session_stats on the same data and
    # (b) a rollup derived from the Python stateful twin's per-event
    # ids — the three paths share the strict-> gap rule.
    from flox_spark.operators import session_stats
    from flox_spark.streaming import stream_session_stats

    rng = np.random.default_rng(7)
    n = 150
    ts = sorted(
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))
        for s in np.cumsum(rng.integers(1, 4000, n))
    )
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "eid": range(n),
            "ts": ts,
            "v": rng.normal(size=n).round(6),
        }
    )
    tmp = tempfile.mkdtemp(prefix="flox_sswin_")
    try:
        for i, part in enumerate([pdf.iloc[:75], pdf.iloc[75:]]):
            spark.createDataFrame(part).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = stream_session_stats(
            stream, "k", ts="ts", gap_seconds=1800, value="v"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("flox_sswin")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            (r["k"], r["session_start"], r["last_ts"], r["n_events"],
             r["duration_us"], round(r["sum_value"], 9))
            for r in spark.sql("SELECT * FROM flox_sswin").collect()
        )
        bdf = spark.createDataFrame(pdf)
        want = sorted(
            (r["k"], r["session_start"], r["last_ts"], r["n_events"],
             r["duration_us"], round(r["sum_value"], 9))
            for r in session_stats(
                bdf, "k", ts="ts", gap_seconds=1800, value="v"
            ).collect()
        )
        assert got == want and len(got) > 5
        # (b) rollup THROUGH the Python stateful twin's ids
        from flox_spark.operators import sessionize

        ids = sessionize(bdf, "k", ts="ts", gap_seconds=1800, tiebreak="eid")
        py_roll = sorted(
            (r["k"], r["session_start"], r["last_ts"], r["n_events"],
             r["duration_us"], round(r["sum_value"], 9))
            for r in ids.groupBy("k", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
                ).alias("duration_us"),
                F.sum("v").alias("sum_value"),
            )
            .collect()
        )
        assert got == py_roll
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_sessionize_event_time_eviction(spark):
    # r11: evict_idle_after drops a key's state once the event-time
    # watermark passes last_event + horizon; the key's NEXT event
    # restarts its counter at session 0 (observable differential vs
    # the NoTimeout run, where the same event continues as session 1).
    # EventTimeTimeout is data-driven, so the availableNow run is
    # deterministic.
    base = dt.datetime(2024, 1, 1)

    def mk(k, eids, minutes):
        return pd.DataFrame(
            {"k": [k] * len(eids), "eid": eids,
             "ts": [base + dt.timedelta(minutes=m) for m in minutes]}
        )

    batches = [
        mk(1, [0, 1], [0, 5]),        # key 1: session 0
        mk(2, [2], [180]),            # advances the watermark past 1's horizon
        mk(2, [3], [181]),            # key 1 times out during this batch
        mk(1, [4], [190]),            # key 1 returns
    ]

    def run(evict, name):
        tmp = tempfile.mkdtemp(prefix=f"flox_evict_{name}_")
        try:
            for i, pdf in enumerate(batches):
                spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
                time.sleep(1.1)
            schema = spark.read.parquet(f"{tmp}/in/f0").schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/in/*")
            )
            out = stream_sessionize(
                stream, "k", ts="ts", gap_seconds=1800,
                evict_idle_after=evict, watermark="10 minutes",
            )
            q = (
                out.writeStream.format("memory")
                .queryName(f"flox_evict_{name}")
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                r["eid"]: r["session_id"]
                for r in spark.sql(f"SELECT * FROM flox_evict_{name}").collect()
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    evicted = run(1800.0, "on")    # 30-min idle horizon
    kept = run(None, "off")
    # shared prefix identical
    for eid in (0, 1, 2, 3):
        assert evicted[eid] == kept[eid], eid
    # key 1's return: fresh state (0) with eviction, continued (1) without
    assert kept[4] == 1
    assert evicted[4] == 0


def test_session_stats_watermark_gap_sanity_warning(spark):
    # r11 VERDICT #5: session_window state is O(open sessions in the
    # watermark) ~ keys x watermark/gap — warn when the ratio passes
    # 100x (the regime where the r11 measurement held 502 MB vs the
    # stateful path's 35 MB), stay silent at sane ratios
    import warnings

    import pandas as pd

    from flox_spark.streaming import stream_session_stats

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:30", "2024-01-01 00:01:00"]
            ),
        }
    )
    df = spark.createDataFrame(pdf)  # batch frame: operator still validates
    with pytest.warns(UserWarning, match="watermark"):
        stream_session_stats(df, "user_id", ts="ts", gap_seconds=60.0,
                             watermark="10 hours")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails
        stream_session_stats(df, "user_id", ts="ts", gap_seconds=60.0,
                             watermark="10 minutes")
    # unparseable watermark: check skipped, no crash (Spark validates
    # the string itself at stream start)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        stream_session_stats(df, "user_id", ts="ts", gap_seconds=60.0,
                             watermark="interval weirdness here")


def test_watermark_seconds_parser():
    from flox_spark.streaming.sessions import _watermark_seconds

    assert _watermark_seconds("10 minutes") == 600.0
    assert _watermark_seconds("1 hour") == 3600.0
    assert _watermark_seconds("500 milliseconds") == 0.5
    assert _watermark_seconds("2 days") == 172800.0
    assert _watermark_seconds("nonsense") is None
    assert _watermark_seconds("3 fortnights") is None
