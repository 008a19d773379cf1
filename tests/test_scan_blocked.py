"""Blocked (skew-path) scans must equal the plain window scans
exactly — including null runs straddling block boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_scan, groupby_scan_blocked


@pytest.fixture(scope="module")
def skew_df(spark):
    rng = np.random.default_rng(21)
    n = 5000
    # one giant group (90%) + several small ones; 30% missing values
    k = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 6, n))
    v = rng.normal(size=n)
    v[rng.random(n) < 0.3] = np.nan
    pdf = pd.DataFrame({"idx": np.arange(n, dtype=np.int64), "k": k, "v": v})
    return spark.createDataFrame(pdf).repartition(8)


@pytest.mark.parametrize("func", ["nancumsum", "cumsum", "cumcount", "ffill", "bfill", "cumprod", "nancumprod"])
@pytest.mark.parametrize("num_blocks", [1, 7, 32])
def test_blocked_equals_plain(spark, skew_df, func, num_blocks):
    plain = {
        r["idx"]: r[func]
        for r in groupby_scan(skew_df, "k", func=func, value="v", order_by="idx").collect()
    }
    blocked = {
        r["idx"]: r[func]
        for r in groupby_scan_blocked(
            skew_df, "k", func=func, value="v", order_by="idx", num_blocks=num_blocks
        ).collect()
    }
    assert set(plain) == set(blocked)
    import math

    for i, w in plain.items():
        g = blocked[i]
        if w is None:
            assert g is None, (i, g, w)
        elif isinstance(w, float) and math.isnan(w):
            assert isinstance(g, float) and math.isnan(g), (i, g, w)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9), (i, g, w)


def test_blocked_rejects_unsupported(spark, skew_df):
    with pytest.raises(ValueError, match="blocked scan supports"):
        groupby_scan_blocked(skew_df, "k", func="argmax", value="v", order_by="idx")


def test_blocked_cumsum_int_poison_is_null(spark):
    # plain cumsum on ints: positions at-or-after a NULL emit NULL
    # (never CAST(NaN AS BIGINT) == 0), matching groupby_scan
    pdf = pd.DataFrame({"idx": range(6), "k": [0] * 6,
                        "v": pd.array([1, 2, None, 4, 5, 6], dtype="Int64")})
    df = spark.createDataFrame(pdf)
    plain = {r["idx"]: r["cumsum"] for r in
             groupby_scan(df, "k", func="cumsum", value="v", order_by="idx").collect()}
    blocked = {r["idx"]: r["cumsum"] for r in
               groupby_scan_blocked(df, "k", func="cumsum", value="v",
                                    order_by="idx", num_blocks=3).collect()}
    assert plain == blocked
    assert blocked[1] == 3 and blocked[2] is None and blocked[5] is None


def test_blocked_single_row_group(spark):
    pdf = pd.DataFrame({"idx": [0], "k": [0], "v": [1.5]})
    df = spark.createDataFrame(pdf)
    r = groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="idx").collect()
    assert r[0]["nancumsum"] == 1.5


@pytest.mark.parametrize("func", ["cummax", "cummin", "nancumprod"])
def test_blocked_extrema_prod(spark, skew_df, func):
    from flox_spark import groupby_scan
    # nancumprod on normals overflows nothing; use abs+0.5..1.5 range to
    # keep products finite
    from pyspark.sql import functions as F
    df = skew_df.withColumn("v", F.abs(F.col("v")) % 1.0 + 0.5) if func == "nancumprod" else skew_df
    plain = {r["idx"]: r[func] for r in
             groupby_scan(df, "k", func=func, value="v", order_by="idx").collect()}
    blocked = {r["idx"]: r[func] for r in
               groupby_scan_blocked(df, "k", func=func, value="v", order_by="idx", num_blocks=9).collect()}
    for i, w in plain.items():
        g = blocked[i]
        if w is None:
            assert g is None, (i, g, w)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (i, g, w)


def test_blocked_bursty_order(spark):
    # bursty order column (timestamp-cluster shape): 95% of rows sit in
    # dense runs, the rest behind huge gaps.  Uniform [min,max] ranges
    # would dump nearly all rows into one block; quantile breaks keep
    # populations balanced AND the result must still equal the plain scan.
    rng = np.random.default_rng(5)
    n = 4000
    gaps = np.where(rng.random(n) < 0.95, 1, 10_000_000)
    o = np.cumsum(gaps).astype(np.int64)  # strictly increasing (unique)
    k = rng.integers(0, 3, n)
    v = rng.normal(size=n)
    v[rng.random(n) < 0.2] = np.nan
    pdf = pd.DataFrame({"o": o, "k": k, "v": v})
    df = spark.createDataFrame(pdf).repartition(8)
    plain = {r["o"]: r["nancumsum"] for r in
             groupby_scan(df, "k", func="nancumsum", value="v", order_by="o").collect()}
    blocked = {r["o"]: r["nancumsum"] for r in
               groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="o",
                                    num_blocks=8).collect()}
    for i, w in plain.items():
        assert blocked[i] == pytest.approx(w, rel=1e-9, abs=1e-9), i
    # balance: the quantile breaks split the bursty axis into blocks
    # none of which holds more than ~2x the even share
    from pyspark.sql import functions as F
    breaks = df.agg(F.percentile_approx(
        "o", F.array(*[F.lit(i / 8) for i in range(1, 8)]), F.lit(10000)).alias("b")
    ).first()["b"]
    blk = np.searchsorted(np.array(breaks), o, side="left")  # = #{breaks < x}
    counts = np.bincount(blk, minlength=8)
    assert counts.max() <= 2 * n / 8, counts


def test_blocked_timestamp_order(spark):
    # datetime order columns numericize through the int64 view instead
    # of failing on interval arithmetic
    import datetime as dt
    n = 200
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "ts": [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=int(i)) for i in range(n)],
        "k": rng.integers(0, 2, n),
        "v": rng.normal(size=n),
    })
    df = spark.createDataFrame(pdf)
    plain = {r["ts"]: r["nancumsum"] for r in
             groupby_scan(df, "k", func="nancumsum", value="v", order_by="ts").collect()}
    blocked = {r["ts"]: r["nancumsum"] for r in
               groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="ts",
                                    num_blocks=4).collect()}
    for i, w in plain.items():
        assert blocked[i] == pytest.approx(w, rel=1e-9), i


def test_reindex_broadcast_heuristic(spark):
    # the forced hint is dropped for huge DECLARED grids (Catalyst may
    # still choose to broadcast a genuinely small side on its own)
    from flox_spark.core import _should_broadcast_reindex
    from flox_spark import groupby_reduce, set_options

    assert _should_broadcast_reindex(1000.0)
    assert not _should_broadcast_reindex(2e7)
    with set_options(broadcast_reindex=False):
        assert not _should_broadcast_reindex(10.0)

    # and the small-grid plan does carry the broadcast
    pdf = pd.DataFrame({"k1": [0, 1], "v": [1.0, 2.0]})
    df = spark.createDataFrame(pdf)
    small = groupby_reduce(
        df, "k1", func="nansum", value="v",
        expected_groups=[0, 1, 2], fill_value=0.0, sort=False,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in small or "BroadcastExchange" in small
