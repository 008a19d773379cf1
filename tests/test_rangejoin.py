"""Bucketed range join: exact parity with the naive BETWEEN join and
the bucketed-equi plan shape it exists for."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flox_spark.operators import range_join


@pytest.fixture(scope="module")
def interval_data(spark):
    rng = np.random.default_rng(31)
    pts = pd.DataFrame(
        {
            "pid": range(400),
            "x": np.round(rng.uniform(0, 100, 400), 3),
            "grp": rng.integers(0, 3, 400),
        }
    )
    # overlapping intervals of varied width, incl. degenerate lo==hi
    lo = np.round(rng.uniform(0, 95, 60), 3)
    width = np.round(rng.exponential(4, 60), 3)
    iv = pd.DataFrame(
        {
            "iid": range(60),
            "lo": lo,
            "hi": np.round(lo + width, 3),
            "tag": [f"t{i}" for i in range(60)],
            "igrp": rng.integers(0, 3, 60),
        }
    )
    iv.loc[5, "hi"] = iv.loc[5, "lo"]  # degenerate point interval
    return spark.createDataFrame(pts), spark.createDataFrame(iv), pts, iv


def _naive(pts, iv, extra_on=False):
    out = []
    for p in pts.itertuples():
        for r in iv.itertuples():
            if r.lo <= p.x <= r.hi and (not extra_on or p.grp == r.igrp):
                out.append((p.pid, r.iid))
    return sorted(out)


@pytest.mark.parametrize("width", [1.0, 5.0, 50.0])
def test_range_join_matches_naive(spark, interval_data, width):
    pts_df, iv_df, pts, iv = interval_data
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=width).collect()
    )
    assert got == _naive(pts, iv)


def test_range_join_extra_keys(spark, interval_data):
    pts_df, iv_df, pts, iv = interval_data
    iv2 = iv_df.withColumnRenamed("igrp", "grp")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pts_df, iv2, "x", "lo", "hi", bucket_width=5.0, extra_on=["grp"]
        ).collect()
    )
    want = _naive(pts, iv, extra_on=True)
    assert got == want


def test_range_join_left_keeps_unmatched(spark, interval_data):
    pts_df, iv_df, pts, iv = interval_data
    out = range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=5.0, how="left")
    rows = out.collect()
    matched = {p for p, _ in _naive(pts, iv)}
    got_matched = [r for r in rows if r["iid"] is not None]
    got_null = {r["pid"] for r in rows if r["iid"] is None}
    assert sorted((r["pid"], r["iid"]) for r in got_matched) == _naive(pts, iv)
    assert got_null == set(pts["pid"]) - matched


def test_range_join_no_duplicate_matches(spark, interval_data):
    # a point lives in exactly one bucket, so an interval spanning
    # many buckets still matches it once
    pts_df, iv_df, pts, iv = interval_data
    out = range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=0.5)
    n = out.count()
    assert n == out.select("pid", "iid").distinct().count()


def test_range_join_plan_is_equi_hash_join(spark, interval_data):
    pts_df, iv_df, _, _ = interval_data
    plan = (
        range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the point of the bucketing: no nested-loop/cartesian fallback
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_validates(spark, interval_data):
    pts_df, iv_df, _, _ = interval_data
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="how"):
        range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=1, how="full")


def test_range_join_int64_beyond_double_precision(spark):
    # epoch-nanosecond-style int64 domains past 2^53: the double
    # bucket path rounds and can drop boundary matches; the exact
    # long floor-div path must not.  Construct points exactly on and
    # adjacent to a bucket boundary at a magnitude where doubles round
    # to multiples of 256.
    base = (1 << 60) + 7  # not representable exactly as double
    w = 1000
    pts = [(1, base), (2, base + 1), (3, base + w - 1), (4, base - 1)]
    ivs = [(10, base, base + w - 1), (11, base - 5, base)]
    pts_df = spark.createDataFrame(pts, "pid int, x long")
    iv_df = spark.createDataFrame(ivs, "iid int, lo long, hi long")
    out = range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=w)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # exact semantics: x BETWEEN lo AND hi inclusive
    want = sorted(
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x <= hi
    )
    assert got == want


def test_range_join_negative_long_floor_div(spark):
    # floor-div toward -inf: negative coordinates must bucket like
    # floor(x/w), not truncate toward zero (off-by-one buckets drop
    # boundary matches)
    pts = [(1, -1), (2, -1000), (3, -1001), (4, 0)]
    ivs = [(10, -1000, -1), (11, -1500, -1001)]
    pts_df = spark.createDataFrame(pts, "pid int, x long")
    iv_df = spark.createDataFrame(ivs, "iid int, lo long, hi long")
    out = range_join(pts_df, iv_df, "x", "lo", "hi", bucket_width=1000)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    want = sorted(
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x <= hi
    )
    assert got == want
