import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import funnel_conversion
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _ts(*mins):
    return [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in mins]


def test_funnel_hand_case(spark):
    # u1: click@0 -> purchase@5 (converted, 300 s); click@60 -> purchase@200
    #     is beyond the 30-min window (not converted)
    # u2: click@0, no purchase at all
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_type": ["click", "purchase", "click", "purchase", "click"],
            "ts": _ts(0, 5, 60, 200) + _ts(0),
        }
    )
    out = {
        r["user_id"]: r
        for r in funnel_conversion(
            spark.createDataFrame(pdf),
            "user_id",
            start=F.col("event_type") == "click",
            step=F.col("event_type") == "purchase",
            within_seconds=1800,
        ).collect()
    }
    assert out[1]["n_start"] == 2 and out[1]["n_converted"] == 1
    assert out[1]["conversion_rate"] == 0.5
    assert out[1]["mean_delay_us"] == 300 * 1_000_000
    assert out[2]["n_start"] == 1 and out[2]["n_converted"] == 0
    assert out[2]["mean_delay_us"] is None


def test_funnel_equal_ts_converts(spark):
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_type": ["click", "purchase"],
            "ts": _ts(0, 0),
        }
    )
    out = funnel_conversion(
        spark.createDataFrame(pdf),
        "user_id",
        start=F.col("event_type") == "click",
        step=F.col("event_type") == "purchase",
        within_seconds=60,
    ).collect()[0]
    assert out["n_converted"] == 1 and out["mean_delay_us"] == 0


def test_funnel_matches_pandas(spark):
    ev = load_table(spark, SF, "events")
    got = {
        r["user_id"]: (r["n_start"], r["n_converted"])
        for r in funnel_conversion(
            ev,
            "user_id",
            start=F.col("event_type") == "click",
            step=F.col("event_type") == "purchase",
            within_seconds=6 * 3600,
        ).collect()
    }
    pdf = ev.select("user_id", "event_type", "ts").toPandas()
    clicks = pdf[pdf.event_type == "click"].sort_values("ts")
    buys = pdf[pdf.event_type == "purchase"].sort_values("ts").rename(columns={"ts": "bts"})
    m = pd.merge_asof(
        clicks,
        buys[["user_id", "bts"]],
        left_on="ts",
        right_on="bts",
        by="user_id",
        direction="forward",
        tolerance=pd.Timedelta(hours=6),
    )
    want = (
        m.groupby("user_id")
        .agg(n_start=("ts", "size"), n_converted=("bts", "count"))
        .apply(tuple, axis=1)
        .to_dict()
    )
    assert got == want


def test_funnel_path_three_steps_hand_case(spark):
    from flox_spark.operators.funnel import funnel_path

    # u1: click@0 -> purchase@10 -> signup@20 (full path)
    #     click@100 -> purchase@110, no signup within window
    # u2: click@0, purchase@500 beyond window -> stops at step 0
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 1, 2, 2],
            "event_type": [
                "click", "purchase", "signup", "click", "purchase",
                "click", "purchase",
            ],
            "ts": _ts(0, 10, 20, 100, 110) + _ts(0, 500),
        }
    )
    out = {
        r["user_id"]: r
        for r in funnel_path(
            spark.createDataFrame(pdf),
            "user_id",
            steps=[
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
                F.col("event_type") == "signup",
            ],
            within_seconds=1800,
        ).collect()
    }
    assert out[1]["n_step0"] == 2 and out[1]["n_step1"] == 2 and out[1]["n_step2"] == 1
    assert out[1]["rate_step2"] == 0.5
    assert out[2]["n_step0"] == 1 and out[2]["n_step1"] == 0 and out[2]["n_step2"] == 0


def test_funnel_path_null_chain_guard(spark):
    from flox_spark.operators.funnel import funnel_path

    # u1 has a signup BEFORE any purchase: the step-1 NULL must not
    # leak into step 2 (failed chains stay failed)
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_type": ["click", "signup"],
            "ts": _ts(0, 5),
        }
    )
    out = funnel_path(
        spark.createDataFrame(pdf),
        "user_id",
        steps=[
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
            F.col("event_type") == "signup",
        ],
        within_seconds=1800,
    ).collect()[0]
    assert out["n_step1"] == 0 and out["n_step2"] == 0
