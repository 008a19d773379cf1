"""profile_columns: one-pass table profiling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_apply
from flox_spark.operators import profile_columns


def test_profile_one_pass_values(spark):
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 2, None, 4],
            "b": ["x", None, None, "y", "z"],
            "c": [1.5, 2.5, 3.5, 4.5, 5.5],
        }
    )
    got = {r["column"]: r for r in profile_columns(spark.createDataFrame(pdf)).collect()}
    assert set(got) == {"a", "b", "c"}
    assert all(r["n_rows"] == 5 for r in got.values())
    assert got["a"]["n_null"] == 1 and got["b"]["n_null"] == 2
    assert got["a"]["null_frac"] == pytest.approx(0.2)
    assert got["c"]["min_str"] == "1.5" and got["c"]["max_str"] == "5.5"
    # small-cardinality HLL is exact
    assert got["a"]["approx_distinct"] == 3
    assert got["b"]["approx_distinct"] == 3


def test_profile_single_aggregate_plan(spark):
    pdf = pd.DataFrame({"a": range(100), "b": [str(i) for i in range(100)]})
    df = spark.createDataFrame(pdf)
    plan = (
        profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the whole profile is ONE aggregate over ONE scan
    assert plan.count("Scan") == 1


def test_profile_unknown_column(spark):
    pdf = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(spark.createDataFrame(pdf), cols=["nope"])


def test_groupby_apply_escape_hatch(spark):
    # pandas-per-group apply with flox label rule (NULL labels dropped)
    pdf = pd.DataFrame(
        {"k": [1.0, 1.0, 2.0, np.nan], "v": [1.0, 3.0, 5.0, 7.0]}
    )

    def demean(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["v"] = g["v"] - g["v"].mean()
        return g

    out = groupby_apply(
        spark.createDataFrame(pdf), "k", fn=demean, schema="k double, v double"
    ).collect()
    got = sorted((r["k"], r["v"]) for r in out)
    assert got == [(1.0, -1.0), (1.0, 1.0), (2.0, 0.0)]  # NaN-label row dropped


def test_profile_empty_cols_rejected(spark):
    pdf = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(spark.createDataFrame(pdf), cols=[])


def test_profile_map_column_skips_distinct_sketch(spark):
    # map-typed columns are unhashable in Spark: approx_count_distinct
    # over one would fail the WHOLE job; the profile must skip the
    # sketch (NULL) for that column and still profile the others
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2}), (3, None)],
        "id int, m map<string,int>",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["m"]["approx_distinct"] is None
    assert rows["m"]["n_null"] == 1
    assert rows["m"]["min_str"] is None  # unorderable too
    assert rows["id"]["approx_distinct"] == 3
