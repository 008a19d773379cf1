import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators.asof import asof_join
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _ts(*mins):
    return [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in mins]


def _frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3],
                "lid": [0, 1, 2, 3, 4],
                "ts": _ts(5, 20, 60) + _ts(10) + _ts(10),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2],
                "rid": [100, 101, 102],
                "rts": _ts(10, 30) + _ts(10),
            }
        )
    )
    return left, right


def test_backward_basic_and_tie(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, "k", left_ts="ts", right_ts="rts").collect()
    }
    # lid0 @5: no right <= 5 -> None; lid1 @20: rid100 @10;
    # lid2 @60: rid101 @30; lid3 @10 == rts10 -> tie matches rid102;
    # k=3 has no right rows at all
    assert out == {0: None, 1: 100, 2: 101, 3: 102, 4: None}


def test_forward_basic_and_tie(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", left_ts="ts", right_ts="rts", direction="forward"
        ).collect()
    }
    # lid0 @5 -> rid100 @10; lid1 @20 -> rid101 @30; lid2 @60 -> None;
    # lid3 @10 == rts10 tie -> rid102
    assert out == {0: 100, 1: 101, 2: None, 3: 102, 4: None}


def test_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", left_ts="ts", right_ts="rts", tolerance_seconds=600
        ).collect()
    }
    # lid1 @20 matched rid100 @10 (10 min == tolerance, kept);
    # lid2 @60 matched rid101 @30 (30 min > 10 min, dropped)
    assert out == {0: None, 1: 100, 2: None, 3: 102, 4: None}


def test_matches_pandas_merge_asof(spark):
    # differential vs pandas.merge_asof on real event data: join each
    # click to the user's latest preceding purchase
    ev = load_table(spark, SF, "events")
    left = ev.filter(F.col("event_type") == "click")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("p_event"),
                F.col("value").alias("p_value"))
    )
    got = (
        asof_join(left, right, "user_id", left_ts="ts", right_ts="pts")
        .select("event_id", "p_event")
        .collect()
    )
    lp = left.select("event_id", "user_id", "ts").toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("pts")
    want = pd.merge_asof(
        lp, rp, left_on="ts", right_on="pts", by="user_id", direction="backward"
    )
    want_map = {
        int(r.event_id): (None if pd.isna(r.p_event) else int(r.p_event))
        for r in want.itertuples()
    }
    got_map = {r["event_id"]: r["p_event"] for r in got}
    assert got_map == want_map
    assert sum(v is not None for v in got_map.values()) > len(got_map) // 2


def test_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "k", left_ts="ts", right_ts="rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_right_col_clash_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rid", "lid"), "k",
                  left_ts="ts", right_ts="rts")


def test_null_payload_not_stitched(spark):
    # the matched right row's ts and payload must come from the SAME
    # row: a NULL payload on the matched row stays NULL, never filled
    # from an earlier right row
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lid": [0], "ts": _ts(90)})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1], "rid": [100.0, None], "rts": _ts(10, 60)}
        )
    )
    row = asof_join(left, right, "k", left_ts="ts", right_ts="rts").collect()[0]
    assert row["asof_rts"] == _ts(60)[0]
    assert row["rid"] is None  # matched row's payload, not 100.0 from @10


def test_null_right_ts_never_matches(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lid": [0], "ts": _ts(30)}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rid": [7.0], "rts": [pd.NaT]})
    )
    row = asof_join(left, right, "k", left_ts="ts", right_ts="rts").collect()[0]
    assert row["asof_rts"] is None and row["rid"] is None


def test_tiebreak_deterministic(spark):
    # two right rows at the identical timestamp: tiebreak picks the
    # winner the direction reaches first (backward -> the LAST in
    # ascending tiebreak order)
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lid": [0], "ts": _ts(30)}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rid": [7, 9], "rts": _ts(10, 10)})
    )
    back = asof_join(
        left, right, "k", left_ts="ts", right_ts="rts", tiebreak="rid"
    ).collect()[0]
    assert back["rid"] == 9
    fwd = asof_join(
        left.withColumn("ts", F.lit(_ts(5)[0])),
        right, "k", left_ts="ts", right_ts="rts",
        direction="forward", tiebreak="rid",
    ).collect()[0]
    assert fwd["rid"] == 7
