"""scd2_history: change-log compression into validity intervals,
differential against a hand-rolled pandas reference."""

import numpy as np
import pandas as pd
import pytest

from flox_spark.operators import scd2_history


def _pandas_scd2(pdf, key, ts, attrs):
    rows = []
    for k, grp in pdf.dropna(subset=[ts]).sort_values(ts).groupby(key):
        prev = object()
        runs = []
        for _, r in grp.iterrows():
            state = tuple(None if pd.isna(r[a]) else r[a] for a in attrs)
            if state != prev:
                runs.append([r[ts], None] + list(state))
                prev = state
        for i in range(len(runs) - 1):
            runs[i][1] = runs[i + 1][0]
        for run in runs:
            rows.append((k, *run[2:], run[0], run[1], run[1] is None))
    return rows


@pytest.fixture(scope="module")
def log():
    rng = np.random.default_rng(31)
    n = 600
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n),
            "ts": rng.permutation(n),
            "status": rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]),
            "tier": rng.integers(0, 3, n).astype(float),
        }
    )
    pdf.loc[rng.random(n) < 0.08, "tier"] = np.nan  # NULL attr runs
    return pdf


def _srt(rows):
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def test_scd2_matches_pandas(spark, log):
    df = spark.createDataFrame(log)
    got = _srt(
        (
            r["k"], r["status"],
            None if r["tier"] is None else r["tier"],
            r["valid_from"], r["valid_to"], r["is_current"],
        )
        for r in scd2_history(
            df, "k", order_by="ts", attrs=["status", "tier"]
        ).collect()
    )
    exp = _srt(
        (k, s, t, vf, vt, cur)
        for (k, s, t, vf, vt, cur) in _pandas_scd2(log, "k", "ts", ["status", "tier"])
    )
    assert got == exp


def test_scd2_null_to_null_is_not_a_change(spark):
    pdf = pd.DataFrame(
        {"k": [1] * 4, "ts": [1, 2, 3, 4], "v": [None, None, "x", None]}
    )
    df = spark.createDataFrame(pdf)
    out = scd2_history(df, "k", order_by="ts", attrs=["v"]).collect()
    # runs: NULL(1..3), x(3..4), NULL(4..)
    assert [(r["v"], r["valid_from"], r["valid_to"]) for r in sorted(out, key=lambda r: r["valid_from"])] == [
        (None, 1, 3), ("x", 3, 4), (None, 4, None),
    ]
    assert sum(r["is_current"] for r in out) == 1


def test_scd2_one_exchange_plan(spark, log):
    df = spark.createDataFrame(log).repartition(7)
    plan = (
        scd2_history(df, "k", order_by="ts", attrs=["status"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows share the (k)x(ts) shuffle: exactly one hash
    # exchange (the round-robin one is this test's own repartition)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 2, plan


def test_scd2_validation_and_null_order(spark):
    pdf = pd.DataFrame({"k": [1, 1], "ts": [1.0, np.nan], "v": ["a", "b"]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="key column"):
        scd2_history(df, order_by="ts", attrs=["v"])
    with pytest.raises(ValueError, match="attrs"):
        scd2_history(df, "k", order_by="ts", attrs=[])
    out = scd2_history(df, "k", order_by="ts", attrs=["v"]).collect()
    assert len(out) == 1 and out[0]["v"] == "a"  # NULL-ts row dropped


def test_scd2_reconstruction_invariant(spark, log):
    # joining each original observation back against the history on
    # valid_from <= ts < valid_to must recover its own attrs exactly —
    # the defining property of an SCD2 table
    df = spark.createDataFrame(log)
    hist = scd2_history(df, "k", order_by="ts", attrs=["status", "tier"])
    import pyspark.sql.functions as F

    joined = df.alias("o").join(
        hist.alias("h"),
        (F.col("o.k") == F.col("h.k"))
        & (F.col("o.ts") >= F.col("h.valid_from"))
        & (F.col("h.valid_to").isNull() | (F.col("o.ts") < F.col("h.valid_to"))),
        "left",
    )
    n = df.count()
    assert joined.count() == n  # exactly one interval per observation
    mismatches = joined.filter(
        ~F.col("o.status").eqNullSafe(F.col("h.status"))
        | ~F.col("o.tier").eqNullSafe(F.col("h.tier"))
    ).count()
    assert mismatches == 0
    # intervals within a key never overlap and abut exactly
    import collections
    runs = collections.defaultdict(list)
    for r in hist.collect():
        runs[r["k"]].append((r["valid_from"], r["valid_to"]))
    for k, iv in runs.items():
        iv.sort()
        for (f1, t1), (f2, _) in zip(iv, iv[1:]):
            assert t1 == f2, (k, t1, f2)
        assert iv[-1][1] is None
