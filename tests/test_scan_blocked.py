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


@pytest.mark.parametrize("func", ["nancumsum", "cumcount", "ffill"])
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
    for i, w in plain.items():
        g = blocked[i]
        if w is None:
            assert g is None, (i, g, w)
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9), (i, g, w)


def test_blocked_rejects_unsupported(spark, skew_df):
    with pytest.raises(ValueError, match="blocked scan supports"):
        groupby_scan_blocked(skew_df, "k", func="bfill", value="v", order_by="idx")


def test_blocked_single_row_group(spark):
    pdf = pd.DataFrame({"idx": [0], "k": [0], "v": [1.5]})
    df = spark.createDataFrame(pdf)
    r = groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="idx").collect()
    assert r[0]["nancumsum"] == 1.5
