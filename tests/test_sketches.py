"""HLL sketch rollups (merge-exactness + accuracy) and exact heavy
hitters."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flox_spark.operators import (
    build_distinct_sketches,
    heavy_hitters,
    rollup_distinct,
)


@pytest.fixture(scope="module")
def user_days(spark):
    rng = np.random.default_rng(47)
    n = 30_000
    pdf = pd.DataFrame(
        {
            "day": rng.integers(0, 10, n),
            "region": rng.integers(0, 3, n),
            "user": rng.integers(0, 4000, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_rollup_equals_direct_sketch(spark, user_days):
    # HLL union is register-wise max: unioning per-day sketches gives
    # the IDENTICAL estimate to sketching the raw union
    df, _ = user_days
    per_day = build_distinct_sketches(df, "region", "day", col="user")
    rolled = {
        r["region"]: r["approx_distinct"]
        for r in rollup_distinct(per_day, "region").collect()
    }
    direct = {
        r["region"]: r["approx_distinct"]
        for r in build_distinct_sketches(df, "region", col="user")
        .select(
            "region",
            F.hll_sketch_estimate(F.col("distinct_sketch")).alias("approx_distinct"),
        )
        .collect()
    }
    assert rolled == direct


def test_sketch_estimate_accuracy(spark, user_days):
    df, pdf = user_days
    global_est = rollup_distinct(
        build_distinct_sketches(df, "day", col="user")
    ).collect()[0]["approx_distinct"]
    exact = pdf["user"].nunique()
    assert abs(global_est - exact) / exact < 0.05  # lgk=12 -> ~1% typical


def test_heavy_hitters_exact(spark):
    rng = np.random.default_rng(53)
    # zipf-ish corpus with planted hot tokens
    toks = ["hot_a"] * 500 + ["hot_b"] * 300 + [f"cold_{i}" for i in rng.integers(0, 2000, 3000)]
    rng.shuffle(toks)
    pdf = pd.DataFrame({"tok": toks})
    df = spark.createDataFrame(pdf)
    got = heavy_hitters(df, "tok", min_count=100).collect()
    want = pdf["tok"].value_counts()
    want = want[want >= 100]
    assert {(r["item"], r["n"]) for r in got} == set(want.items())
    # top-k variant
    top2 = heavy_hitters(df, "tok", top=2).collect()
    assert [r["item"] for r in top2] == ["hot_a", "hot_b"]


def test_heavy_hitters_grouped_topk(spark):
    pdf = pd.DataFrame(
        {
            "g": ["x"] * 6 + ["y"] * 6,
            "tok": ["a", "a", "a", "b", "b", "c", "d", "d", "e", "e", "e", "e"],
        }
    )
    got = heavy_hitters(spark.createDataFrame(pdf), "tok", top=1, by=["g"]).collect()
    assert {(r["g"], r["item"], r["n"]) for r in got} == {("x", "a", 3), ("y", "e", 4)}


def test_heavy_hitters_requires_bound(spark, user_days):
    df, _ = user_days
    with pytest.raises(ValueError, match="unbounded"):
        heavy_hitters(df, "user")


def test_heavy_hitters_global_top_uses_limit_plan(spark, user_days):
    df, _ = user_days
    plan = (
        heavy_hitters(df, "user", top=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # global top-k must be TakeOrderedAndProject (distributed partial
    # top-k), not a single-task unpartitioned window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
