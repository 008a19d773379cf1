"""Salted two-phase reduction: exactness vs groupby_reduce and the
skew-spreading property it exists for."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flox_spark import groupby_reduce
from flox_spark.salting import SALTABLE, groupby_reduce_salted


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(23)
    n = 5000
    # one hot key (~80% of rows) + a long tail; NaNs and NULL-ish data
    keys = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 40, n))
    v = rng.normal(size=n) * 5
    v[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({"k": keys, "v": v})
    return spark.createDataFrame(pdf), pdf


@pytest.mark.parametrize("func", SALTABLE)
def test_salted_equals_plain(spark, skewed, func):
    df, _ = skewed
    a = {r["k"]: r[func] for r in
         groupby_reduce_salted(df, "k", func=func, value="v", n_salt=8).collect()}
    b = {r["k"]: r[func] for r in
         groupby_reduce(df, "k", func=func, value="v").collect()}
    assert set(a) == set(b)
    for g in b:
        x, y = a[g], b[g]
        if y is None or (isinstance(y, float) and math.isnan(y)):
            assert x is None or (isinstance(x, float) and math.isnan(x)), (func, g, x, y)
        elif isinstance(y, float):
            assert x == pytest.approx(y, rel=1e-9), (func, g)
        else:
            assert x == y, (func, g)


def test_salted_all_missing_group(spark):
    pdf = pd.DataFrame({"k": [0, 0, 1], "v": [np.nan, np.nan, 2.0]})
    df = spark.createDataFrame(pdf)
    got = {r["k"]: r["nanmean"] for r in
           groupby_reduce_salted(df, "k", func="nanmean", value="v").collect()}
    assert math.isnan(got[0])
    assert got[1] == pytest.approx(2.0)


def test_salted_spreads_hot_key(spark, skewed):
    df, pdf = skewed
    # the declared salt must split the hot group into ~n_salt
    # subgroups, so no reduce task sees more than ~|group|/n_salt rows
    n_salt = 16
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    sub = (
        df.withColumn("__salt", salt)
        .filter(F.col("k") == 0)
        .groupBy("__salt")
        .count()
        .collect()
    )
    hot = (pdf["k"] == 0).sum()
    assert len(sub) == n_salt  # every subgroup materialized
    assert max(r["count"] for r in sub) < hot * 3 / n_salt  # balanced


def test_salted_rejects_nondecomposable(spark, skewed):
    df, _ = skewed
    with pytest.raises(ValueError, match="salted reduction supports"):
        groupby_reduce_salted(df, "k", func="median", value="v")


def test_salted_plan_has_two_aggregate_phases(spark, skewed):
    df, _ = skewed
    plan = (
        groupby_reduce_salted(df, "k", func="nansum", value="v", sort=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two logical aggregations (each planned as partial+final), the
    # first keyed by (k, __salt): the skew-splitting shuffle
    assert plan.count("HashAggregate") >= 4
    assert "__salt" in plan


@pytest.mark.parametrize(
    # no prod here: the product of 2^55-scale values overflows the
    # long output cast in BOTH paths (ANSI) — covered by the double test
    "func", ["sum", "nansum", "count", "min", "max", "mean", "any", "all"]
)
def test_salted_long_dtype_parity(spark, func):
    # integral inputs must stay in exact long arithmetic: a double
    # round-trip would corrupt sums past 2^53
    big = 1 << 55
    # NB: build rows directly — a pandas column with a None would
    # coerce to float64 and round big+1 back to big before Spark
    df = spark.createDataFrame(
        [(0, big), (0, big + 1), (0, big + 3), (1, 7), (1, None)],
        "k bigint, v bigint",
    )
    a = {r["k"]: r[func] for r in
         groupby_reduce_salted(df, "k", func=func, value="v", n_salt=4).collect()}
    b = {r["k"]: r[func] for r in
         groupby_reduce(df, "k", func=func, value="v").collect()}
    assert set(a) == set(b)
    for g in b:
        x, y = a[g], b[g]
        if isinstance(y, float) and math.isnan(y):
            assert isinstance(x, float) and math.isnan(x), (func, g, x, y)
        else:
            assert x == y, (func, g, x, y)
    if func == "sum":
        assert a[0] == 3 * big + 4  # exact, impossible via double
    sch = dict(groupby_reduce_salted(df, "k", func=func, value="v").dtypes)
    sch_b = dict(groupby_reduce(df, "k", func=func, value="v").dtypes)
    assert sch[func] == sch_b[func], (func, sch, sch_b)


def test_salted_rejects_datetime(spark):
    pdf = pd.DataFrame({"k": [0], "v": pd.to_datetime(["2024-01-01"])})
    with pytest.raises(ValueError, match="numeric/bool"):
        groupby_reduce_salted(spark.createDataFrame(pdf), "k", func="max", value="v")


def test_diagnose_skew_report(spark):
    import numpy as np

    # one hot key with 80% of rows
    n = 1000
    pdf = pd.DataFrame({"k": ["hot"] * 800 + [f"c{i}" for i in range(200)]})
    df = spark.createDataFrame(pdf)
    from flox_spark import diagnose_skew

    rep = diagnose_skew(df, "k", top=3, target_rows_per_task=100).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["n_rows"] == 800
    assert rep[0]["share"] == 0.8
    assert rep[0]["suggested_n_salt"] == 8  # ceil(800/100)
    assert all(r["suggested_n_salt"] == 1 for r in rep[1:])  # singletons
    # plan: distributed top-N, no global sort of the key table
    plan = diagnose_skew(df, "k", top=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
