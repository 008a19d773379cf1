"""THE parity test: flox_spark vs the actual reference implementation
(/root/reference, imported read-only via tests/flox_ref.py shims,
engine='flox' pure-numpy path).

Every supported func runs over random values with NaN injection and
three label layouts; results must agree within the reference's own
test tolerances (reference tests/__init__.py:96-100)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_reduce
from tests.flox_ref import load_reference

flox_gr = load_reference()

pytestmark = pytest.mark.skipif(flox_gr is None, reason="reference flox not importable")

# funcs the reference's engine='flox' path supports without
# numpy_groupies (argreductions/first/last/mode/all/any need the npg
# engine; those are covered differentially vs numpy in test_reduce.py)
FUNCS = [
    "count", "sum", "nansum", "prod", "nanprod", "mean", "nanmean",
    "var", "nanvar", "std", "nanstd", "min", "nanmin", "max", "nanmax",
    "median", "nanmedian", "quantile", "nanquantile",
]

LAYOUTS = {
    "blocked": np.repeat([0, 1, 2, 3], 8),
    "interleaved": np.tile([0, 1, 2, 3], 8),
    "skewed": np.array([0] * 25 + [1] * 5 + [2] * 2),
}


def _rand(n, nan_frac, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=n) * 10
    if nan_frac:
        v[rng.random(n) < nan_frac] = np.nan
    return v


@pytest.mark.parametrize("layout", list(LAYOUTS))
@pytest.mark.parametrize("func", FUNCS)
def test_matches_reference(spark, func, layout):
    lab = LAYOUTS[layout]
    n = len(lab)
    v = _rand(n, nan_frac=0.2 if func.startswith("nan") or func in ("count", "all", "any") else 0.0, seed=42)
    kw = {}
    if "quantile" in func:
        kw["finalize_kwargs"] = {"q": 0.73}
    if func in ("var", "nanvar", "std", "nanstd"):
        kw["finalize_kwargs"] = {"ddof": 1}

    if func in ("all", "any"):
        ref_vals = v > 0
        pdf_v = ref_vals
    else:
        ref_vals = v
        pdf_v = v

    ref_kwargs = {}
    if kw.get("finalize_kwargs"):
        ref_kwargs["finalize_kwargs"] = kw["finalize_kwargs"]
    want, groups = flox_gr(ref_vals, lab, func=func, engine="flox", **ref_kwargs)

    pdf = pd.DataFrame({"k": lab, "v": pdf_v})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(df, "k", func=func, value="v", **kw).collect()
    got = {r["k"]: r[func] for r in res}

    assert sorted(got) == sorted(int(g) for g in groups)
    for g, w in zip(groups, want):
        gv = got[int(g)]
        if isinstance(w, (np.floating, float)) and math.isnan(float(w)):
            assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (g, gv, w)
        elif isinstance(w, (np.bool_, bool)):
            assert bool(gv) == bool(w), (g, gv, w)
        elif isinstance(w, (np.integer, int)):
            assert int(gv) == int(w), (g, gv, w)
        else:
            # reference test tolerance: rtol=1e-15/atol=1e-18 for most,
            # var/std rtol=1e-13 (tests/__init__.py:96-100); engine-vs-
            # numpy summation order differences land within 1e-12
            assert gv == pytest.approx(float(w), rel=1e-12, abs=1e-12), (func, g, gv, w)


SCAN_FUNCS = ["cumsum", "nancumsum", "ffill", "bfill"]


@pytest.mark.parametrize("layout", list(LAYOUTS))
@pytest.mark.parametrize("func", SCAN_FUNCS)
def test_scan_matches_reference(spark, func, layout):
    from flox import groupby_scan as ref_scan
    from flox_spark import groupby_scan

    lab = LAYOUTS[layout]
    n = len(lab)
    v = _rand(n, nan_frac=0.3, seed=7)
    want = ref_scan(v, lab, func=func)

    pdf = pd.DataFrame({"idx": np.arange(n), "k": lab, "v": v})
    df = spark.createDataFrame(pdf)
    res = groupby_scan(df, "k", func=func, value="v", order_by="idx")
    got = {r["idx"]: r[func] for r in res.collect()}
    for i in range(n):
        w = float(want[i])
        gv = got[i]
        if math.isnan(w):
            assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (i, gv, w)
        else:
            assert gv == pytest.approx(w, rel=1e-12, abs=1e-12), (i, gv, w)


def test_expected_fill_matches_reference(spark):
    lab = LAYOUTS["interleaved"]
    v = _rand(len(lab), nan_frac=0.2, seed=3)
    want, groups = flox_gr(
        v, lab, func="nansum", engine="flox",
        expected_groups=np.array([0, 1, 2, 3, 9]), fill_value=-1.0,
    )
    pdf = pd.DataFrame({"k": lab, "v": v})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(
        df, "k", func="nansum", value="v",
        expected_groups=[0, 1, 2, 3, 9], fill_value=-1.0,
    ).collect()
    got = {r["k"]: r["nansum"] for r in res}
    for g, w in zip(groups, want):
        assert got[int(g)] == pytest.approx(float(w), rel=1e-12), (g, got[int(g)], w)


def test_min_count_matches_reference(spark):
    lab = LAYOUTS["skewed"]
    v = _rand(len(lab), nan_frac=0.5, seed=13)
    want, groups = flox_gr(
        v, lab, func="nansum", engine="flox", min_count=3, fill_value=np.nan
    )
    pdf = pd.DataFrame({"k": lab, "v": v})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(
        df, "k", func="nansum", value="v", min_count=3, fill_value=float("nan")
    ).collect()
    got = {r["k"]: r["nansum"] for r in res}
    for g, w in zip(groups, want):
        gv = got[int(g)]
        if math.isnan(float(w)):
            assert gv is None or math.isnan(gv), (g, gv, w)
        else:
            assert gv == pytest.approx(float(w), rel=1e-12), (g, gv, w)


def test_datetime_bins_match_reference(spark):
    # datetime bin breaks: the reference digitizes through the int64
    # view (flox/factorize.py:64-72; reference tests/test_core.py:1256-1271)
    rng = np.random.default_rng(37)
    n = 48
    by = pd.date_range("2024-01-01", periods=n, freq="6h")
    v = rng.normal(size=n)
    breaks = pd.date_range("2024-01-01", periods=7, freq="2D")
    want, groups = flox_gr(
        v, by.values, func="nansum",
        expected_groups=pd.IntervalIndex.from_breaks(breaks),
        fill_value=0.0, engine="flox",
    )
    pdf = pd.DataFrame({"ts": by, "v": v})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(
        df, "ts", func="nansum", value="v", isbin=True,
        expected_groups=list(breaks), fill_value=0.0,
    ).collect()
    got = {r["ts_bin"]: r["nansum"] for r in res}
    assert sorted(got) == list(range(len(want)))
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(float(w), rel=1e-12), (i, got[i], w)


@pytest.mark.parametrize("func", ["sum", "prod", "min", "max", "count", "mean"])
def test_int_dtype_matches_reference(spark, func):
    # integer values: promotion rules must match the reference
    # (int sum/prod stay integral, mean promotes to float)
    rng = np.random.default_rng(29)
    lab = LAYOUTS["interleaved"]
    v = rng.integers(-50, 50, len(lab))
    want, groups = flox_gr(v, lab, func=func, engine="flox")
    pdf = pd.DataFrame({"k": lab, "v": v.astype(np.int64)})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(df, "k", func=func, value="v").collect()
    got = {r["k"]: r[func] for r in res}
    for g, w in zip(groups, want):
        if isinstance(w, (np.integer, int)):
            assert int(got[int(g)]) == int(w), (g, got[int(g)], w)
        else:
            assert got[int(g)] == pytest.approx(float(w), rel=1e-12), (g, got[int(g)], w)


def test_bool_dtype_matches_reference(spark):
    rng = np.random.default_rng(31)
    lab = LAYOUTS["blocked"]
    v = rng.random(len(lab)) > 0.5
    for func in ["sum", "count", "min", "max"]:
        want, groups = flox_gr(v, lab, func=func, engine="flox")
        pdf = pd.DataFrame({"k": lab, "v": v})
        df = spark.createDataFrame(pdf)
        res = groupby_reduce(df, "k", func=func, value="v").collect()
        got = {r["k"]: r[func] for r in res}
        for g, w in zip(groups, want):
            gv = got[int(g)]
            if isinstance(w, (np.bool_, bool)):
                assert bool(gv) == bool(w), (func, g, gv, w)
            else:
                assert int(gv) == int(w), (func, g, gv, w)


def test_vector_q_matches_reference(spark):
    # vector q: the reference adds a leading q dimension
    # (quantile_new_dims_func, flox/aggregations.py:688-710); the
    # engine's long-table analog is exploded per-q rows.  Checked for
    # BOTH exact-quantile physical strategies (agg and sort).
    from flox_spark import set_options

    lab = LAYOUTS["skewed"]
    v = _rand(len(lab), nan_frac=0.2, seed=7)
    qs = [0.25, 0.5, 0.9]
    want, groups = flox_gr(
        v, lab, func="nanquantile", engine="flox", finalize_kwargs={"q": qs}
    )
    pdf = pd.DataFrame({"k": lab, "v": v})
    df = spark.createDataFrame(pdf)

    for impl in ("agg", "sort", "refine"):
        with set_options(quantile_impl=impl):
            res = groupby_reduce(
                df, "k", func="nanquantile", value="v", finalize_kwargs={"q": qs}
            ).collect()
        got = {(r["k"], r["q"]): r["nanquantile"] for r in res}
        assert len(got) == len(qs) * len(groups), impl
        for qi, q in enumerate(qs):
            for gi, g in enumerate(groups):
                w = float(want[qi, gi])
                gv = got[(int(g), q)]
                if math.isnan(w):
                    assert gv is None or math.isnan(gv), (impl, q, g)
                else:
                    assert gv == pytest.approx(w, rel=1e-12, abs=1e-12), (impl, q, g)


def test_bin_labels_match_reference_interval_index(spark):
    # bin_labels=True emits the interval edges flox returns as a
    # pd.IntervalIndex (flox/factorize.py:55-82; reference
    # tests/test_core.py:950-995): left-open right-closed edges must
    # match the reference's returned groups exactly
    rng = np.random.default_rng(41)
    n = 200
    labels = rng.uniform(0, 50, n)
    v = rng.normal(size=n)
    breaks = [0.0, 10.0, 20.0, 30.0, 50.0]
    want, groups = flox_gr(
        v, labels, func="nansum",
        expected_groups=pd.IntervalIndex.from_breaks(breaks),
        fill_value=0.0, engine="flox",
    )
    pdf = pd.DataFrame({"x": labels, "v": v})
    res = groupby_reduce(
        spark.createDataFrame(pdf), "x", func="nansum", value="v",
        isbin=True, bin_labels=True, expected_groups=breaks, fill_value=0.0,
    ).collect()
    assert len(res) == len(want)
    for i, r in enumerate(sorted(res, key=lambda r: r["x_bin"])):
        iv = groups[i]  # pd.Interval, closed='right'
        assert r["x_bin_left"] == pytest.approx(iv.left, rel=1e-15)
        assert r["x_bin_right"] == pytest.approx(iv.right, rel=1e-15)
        assert r["nansum"] == pytest.approx(float(want[i]), rel=1e-12)


def test_dtype_override_matches_reference(spark):
    # flox's dtype= argument: sum over float32 forced to float64 (and
    # the reverse) must match the reference's resolution
    rng = np.random.default_rng(19)
    v = rng.normal(size=40).astype(np.float32)
    lab = rng.integers(0, 4, 40)
    pdf = pd.DataFrame({"k": lab, "v": v})
    df = spark.createDataFrame(pdf)
    for np_dt, spark_dt in ((np.float64, "double"), (np.float32, "float")):
        want, _ = flox_gr(
            v.astype(np.float64), lab, func="nansum", dtype=np_dt, engine="flox"
        )
        res = groupby_reduce(df, "k", func="nansum", value="v", dtype=np_dt)
        assert dict(res.dtypes)["nansum"] == spark_dt
        got = {r["k"]: r["nansum"] for r in res.collect()}
        assert want.dtype == np_dt
        for i, g in enumerate(sorted(got)):
            # float32 accumulators differ in rounding path (the
            # reference sums IN f32; the engine sums in double and
            # casts) — compare at f32 precision
            rtol = 1e-5 if np_dt == np.float32 else 1e-12
            assert got[g] == pytest.approx(float(want[i]), rel=rtol), (np_dt, g)


def test_dtype_override_string_and_int(spark):
    pdf = pd.DataFrame({"k": [0, 0, 1], "v": [1.0, 2.0, 3.0]})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(df, "k", func="count", value="v", dtype="int")
    assert dict(res.dtypes)["count"] == "int"
    got = {r["k"]: r["count"] for r in res.collect()}
    assert got == {0: 2, 1: 1}


def test_interval_index_expected_groups_without_isbin(spark):
    # flox accepts pd.IntervalIndex directly as expected_groups (no
    # isbin flag); the engine auto-detects it
    rng = np.random.default_rng(43)
    labels = rng.uniform(0, 40, 150)
    v = rng.normal(size=150)
    iv = pd.IntervalIndex.from_breaks([0.0, 10.0, 25.0, 40.0])
    want, _ = flox_gr(
        v, labels, func="nansum", expected_groups=iv, fill_value=0.0, engine="flox"
    )
    pdf = pd.DataFrame({"x": labels, "v": v})
    res = groupby_reduce(
        spark.createDataFrame(pdf), "x", func="nansum", value="v",
        expected_groups=iv, fill_value=0.0,
    ).collect()
    got = {r["x_bin"]: r["nansum"] for r in res}
    assert sorted(got) == [0, 1, 2]
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(float(w), rel=1e-12)
    with pytest.raises(ValueError, match="contiguous"):
        groupby_reduce(
            spark.createDataFrame(pdf), "x", func="nansum", value="v",
            expected_groups=pd.IntervalIndex.from_tuples([(0, 5), (10, 15)]),
        )


def test_interval_index_closed_left_matches_reference(spark):
    # the reference digitizes by the IntervalIndex's closed side
    # (flox/factorize.py:57-76, right=expect.closed_right); edge
    # values sitting exactly ON the breaks are the discriminating
    # cases: 10.0 belongs to [10,25) under closed='left' but (0,10]
    # under closed='right'
    labels = np.array([0.0, 5.0, 10.0, 24.999, 25.0, 39.999, 40.0, 41.0])
    v = np.arange(len(labels), dtype=np.float64) + 1.0
    for closed in ("left", "right"):
        iv = pd.IntervalIndex.from_breaks([0.0, 10.0, 25.0, 40.0], closed=closed)
        want, _ = flox_gr(
            v, labels, func="nansum", expected_groups=iv, fill_value=0.0,
            engine="flox",
        )
        pdf = pd.DataFrame({"x": labels, "v": v})
        res = groupby_reduce(
            spark.createDataFrame(pdf), "x", func="nansum", value="v",
            expected_groups=iv, fill_value=0.0,
        ).collect()
        got = {r["x_bin"]: r["nansum"] for r in res}
        assert sorted(got) == [0, 1, 2], closed
        for i, w in enumerate(want):
            assert got[i] == pytest.approx(float(w), rel=1e-12), (closed, i)


def test_interval_index_closed_both_raises(spark):
    # reference parity: flox/factorize.py:58-59 raises
    # NotImplementedError for closed='both'
    pdf = pd.DataFrame({"x": [1.0, 2.0], "v": [1.0, 2.0]})
    iv = pd.IntervalIndex.from_breaks([0.0, 1.5, 3.0], closed="both")
    with pytest.raises(NotImplementedError, match="both"):
        groupby_reduce(
            spark.createDataFrame(pdf), "x", func="sum", value="v",
            expected_groups=iv,
        )


def test_bin_column_closed_left_width_bucket_path(spark):
    # >16 uniform breaks takes the O(1) width_bucket path; verify the
    # left-closed variant agrees with numpy digitize(right=False) on
    # edge values
    from flox_spark import bin_column
    from pyspark.sql import functions as F

    breaks = [float(i) for i in range(0, 21)]  # 20 bins, uniform
    xs = [0.0, 0.5, 1.0, 19.999, 20.0, -0.1, 10.0]
    pdf = pd.DataFrame({"x": xs})
    df = spark.createDataFrame(pdf)
    got = [
        r["b"]
        for r in df.select(
            bin_column(F.col("x"), breaks, closed="left").alias("b")
        ).collect()
    ]
    want = []
    for x in xs:
        i = np.digitize([x], breaks, right=False)[0] - 1
        want.append(int(i) if 0 <= i < len(breaks) - 1 and x < breaks[-1] else None)
    assert got == want


def test_sort_false_occurrence_order_matches_reference(spark):
    # flox sort=False returns groups in FIRST-OCCURRENCE order
    # (pd.factorize(sort=False), flox/factorize.py:96); the engine
    # reproduces it when order_by defines row order
    lab = np.array([7, 3, 7, 9, 1, 3, 9, 1, 5])
    v = np.arange(len(lab), dtype=np.float64)
    want, groups = flox_gr(v, lab, func="nansum", engine="flox", sort=False)
    pdf = pd.DataFrame({"idx": np.arange(len(lab)), "k": lab, "v": v})
    res = groupby_reduce(
        spark.createDataFrame(pdf), "k", func="nansum", value="v",
        sort=False, order_by="idx",
    ).collect()
    assert [r["k"] for r in res] == [int(g) for g in groups]  # 7,3,9,1,5
    for r, w in zip(res, want):
        assert r["nansum"] == pytest.approx(float(w), rel=1e-12)


def test_sort_false_declared_expected_keeps_given_order(spark):
    # with declared expected_groups, flox sort=False keeps the
    # DECLARED order (searchsorted unsort, flox/factorize.py:85-93)
    lab = np.array([1, 5, 3, 1, 3])
    v = np.ones(len(lab))
    expected = [5, 1, 9, 3]  # deliberately unsorted, with an absent 9
    want, groups = flox_gr(
        v, lab, func="nansum", engine="flox", sort=False,
        expected_groups=np.array(expected), fill_value=0.0,
    )
    pdf = pd.DataFrame({"k": lab, "v": v})
    res = groupby_reduce(
        spark.createDataFrame(pdf), "k", func="nansum", value="v",
        sort=False, expected_groups=expected, fill_value=0.0,
    ).collect()
    assert [r["k"] for r in res] == [int(g) for g in groups] == expected
    for r, w in zip(res, want):
        assert r["nansum"] == pytest.approx(float(w), rel=1e-12)


def test_sort_false_occurrence_order_mode_and_median(spark):
    # the multi-stage strategies (mode two-stage, quantile) attach the
    # occurrence position via a separate aggregate + join
    from flox_spark import set_options

    lab = np.array([4, 2, 4, 8, 2, 8, 8])
    v = np.array([1.0, 2.0, 1.0, 3.0, 2.0, 3.0, 4.0])
    pdf = pd.DataFrame({"idx": np.arange(len(lab)), "k": lab, "v": v})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(df, "k", func="nanmode", value="v", sort=False, order_by="idx").collect()
    assert [r["k"] for r in res] == [4, 2, 8]
    with set_options(quantile_impl="refine"):
        res = groupby_reduce(df, "k", func="nanmedian", value="v", sort=False, order_by="idx").collect()
    assert [r["k"] for r in res] == [4, 2, 8]
