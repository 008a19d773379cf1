import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import sessionize, session_stats
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _ts(*mins):
    return [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in mins]


def test_sessionize_hand_case(spark):
    # gaps (minutes): u1: 0,5,40,41 with gap=30min -> sessions 0,0,1,1
    # u2 single event -> session 0
    pdf = pd.DataFrame(
        {
            "user": [1, 1, 1, 1, 2],
            "eid": [10, 11, 12, 13, 20],
            "ts": _ts(0, 5, 40, 41) + _ts(100),
        }
    )
    out = (
        sessionize(spark.createDataFrame(pdf), "user", ts="ts", gap_seconds=1800, tiebreak="eid")
        .orderBy("user", "eid")
        .collect()
    )
    assert [(r["user"], r["eid"], r["session_id"]) for r in out] == [
        (1, 10, 0),
        (1, 11, 0),
        (1, 12, 1),
        (1, 13, 1),
        (2, 20, 0),
    ]


def test_sessionize_boundary_exact_gap_merges(spark):
    # event exactly gap after its predecessor MERGES: session_window
    # extends a closed [start, last+gap] interval and sessionize
    # matches it (verified against native session_window below)
    pdf = pd.DataFrame({"user": [1, 1], "eid": [0, 1], "ts": _ts(0, 30)})
    out = (
        sessionize(spark.createDataFrame(pdf), "user", ts="ts", gap_seconds=1800, tiebreak="eid")
        .orderBy("eid")
        .collect()
    )
    assert [r["session_id"] for r in out] == [0, 0]


def test_session_stats_boundary_exact_gap_merges(spark):
    # session_window extends a closed [start, last+gap] interval: an
    # event exactly gap after its predecessor merges — same rule as
    # sessionize's strict > boundary
    pdf = pd.DataFrame({"user": [1, 1], "ts": _ts(0, 30)})
    out = session_stats(
        spark.createDataFrame(pdf), "user", ts="ts", gap_seconds=1800
    ).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_session_stats_matches_sessionize_rollup(spark):
    # the native session_window rollup must equal a groupBy over
    # sessionize ids on real event data
    ev = load_table(spark, SF, "events")
    gap = 3600.0
    via_ids = (
        sessionize(ev, "user_id", ts="ts", gap_seconds=gap, tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_ts", "n_events")
    )
    via_native = session_stats(ev, "user_id", ts="ts", gap_seconds=gap).select(
        "user_id", "session_start", "last_ts", "n_events"
    )
    a = sorted(map(tuple, via_ids.collect()))
    b = sorted(map(tuple, via_native.collect()))
    assert a == b
    assert len(a) > 100


def test_session_stats_value_sum_and_duration(spark):
    pdf = pd.DataFrame(
        {
            "user": [1, 1, 1],
            "ts": _ts(0, 10, 120),
            "v": [1.0, 2.0, 4.0],
        }
    )
    out = session_stats(
        spark.createDataFrame(pdf), "user", ts="ts", gap_seconds=3600, value="v"
    ).orderBy("session_start").collect()
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["sum_value"] == 3.0
    assert out[0]["duration_us"] == 10 * 60 * 1_000_000
    assert out[1]["n_events"] == 1 and out[1]["sum_value"] == 4.0


def test_sessionize_plan_single_shuffle(spark):
    ev = load_table(spark, SF, "events")
    plan = sessionize(ev, "user_id", ts="ts", gap_seconds=1800, tiebreak="event_id")._jdf.queryExecution().executedPlan().toString()
    # one exchange (hash on user_id) feeding the window pass
    assert plan.count("Exchange hashpartitioning") == 1


def test_subsecond_gap_parity(spark):
    # fractional gaps: session_stats must use microsecond precision
    # (not whole-second rounding) and agree with sessionize
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user": [1] * 3,
            "eid": [0, 1, 2],
            "ts": [base, base + dt.timedelta(milliseconds=400),
                   base + dt.timedelta(milliseconds=1500)],
        }
    )
    df = spark.createDataFrame(pdf)
    ids = sessionize(df, "user", ts="ts", gap_seconds=0.5, tiebreak="eid").collect()
    got = {r["eid"]: r["session_id"] for r in ids}
    assert got == {0: 0, 1: 0, 2: 1}
    stats = session_stats(df, "user", ts="ts", gap_seconds=0.5).collect()
    assert sorted(r["n_events"] for r in stats) == [1, 2]
    with pytest.raises(ValueError, match="positive"):
        session_stats(df, "user", ts="ts", gap_seconds=0.0).collect()
