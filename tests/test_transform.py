import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark import groupby_transform, standardize
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tdata():
    rng = np.random.default_rng(23)
    n = 300
    pdf = pd.DataFrame(
        {"k": rng.integers(0, 5, n), "rid": range(n), "v": rng.normal(size=n) * 7}
    )
    pdf.loc[rng.random(n) < 0.1, "v"] = np.nan
    return pdf


def test_transform_matches_pandas(spark, tdata):
    df = spark.createDataFrame(tdata)
    got = {
        r["rid"]: r["nanmean_v"]
        for r in groupby_transform(df, "k", func="nanmean", value="v").collect()
    }
    want = tdata.groupby("k")["v"].transform("mean")
    for rid, w in zip(tdata["rid"], want):
        assert got[rid] == pytest.approx(w, rel=1e-9), rid


def test_transform_row_count_preserved_and_broadcast(spark):
    li = load_table(spark, SF, "lineitem")
    out = groupby_transform(li, "l_returnflag", func="nansum", value="l_quantity",
                            alias="grp_qty")
    assert out.count() == li.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_standardize_matches_pandas(spark, tdata):
    df = spark.createDataFrame(tdata)
    got = {r["rid"]: r["v_z"] for r in standardize(df, "k", value="v").collect()}
    grp = tdata.groupby("k")["v"]
    want = (tdata["v"] - grp.transform("mean")) / grp.transform(lambda s: s.std(ddof=0))
    for rid, w in zip(tdata["rid"], want):
        g = got[rid]
        if pd.isna(w):
            assert g is None or math.isnan(g), rid
        else:
            assert g == pytest.approx(w, rel=1e-9), rid


def test_standardize_single_shuffle(spark, tdata):
    df = spark.createDataFrame(tdata)
    plan = standardize(df, "k", value="v")._jdf.queryExecution().executedPlan().toString()
    # one hash aggregation pass feeds both stats (multi API); the join
    # back is broadcast — no second fact-table shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_stratified_sampling_rates(spark):
    from flox_spark.operators import sample_stratified

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = sample_stratified(
        docs, "lang", {"en": 0.2, "de": 1.0}, id_col="doc_id", default_fraction=0.0, seed="t"
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("de") == sizes["de"]  # fraction 1.0 keeps everything
    assert set(got) <= {"en", "de"}  # default 0 drops other strata
    n_en, exp = got.get("en", 0), sizes["en"] * 0.2
    assert abs(n_en - exp) < 4 * (sizes["en"] * 0.2 * 0.8) ** 0.5 + 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
