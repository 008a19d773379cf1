"""Coverage for option paths and combined features: approx quantile,
mixed binned+plain multi-by grids, sort=False, scan over high-card
groups straddling partitions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flox_spark import groupby_reduce, groupby_scan, set_options


def test_approx_quantile_option(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({"k": rng.integers(0, 3, 5000), "v": rng.normal(size=5000)})
    df = spark.createDataFrame(pdf)
    exact = {
        r["k"]: r["nanquantile"]
        for r in groupby_reduce(df, "k", func="nanquantile", value="v", finalize_kwargs={"q": 0.9}).collect()
    }
    with set_options(approx_quantile=True):
        approx = {
            r["k"]: r["nanquantile"]
            for r in groupby_reduce(df, "k", func="nanquantile", value="v", finalize_kwargs={"q": 0.9}).collect()
        }
    for g in exact:
        assert approx[g] == pytest.approx(exact[g], abs=0.05)


def test_mixed_bin_and_plain_multiby(spark):
    # one binned grouper + one categorical grouper -> cartesian grid
    pdf = pd.DataFrame({
        "x": [0.5, 1.5, 2.5, 3.5, 0.7, 1.2],
        "c": ["a", "a", "b", "b", "b", "a"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(
        df, "x", "c", func="nansum", value="v",
        isbin=(True, False),
        expected_groups=([0.0, 1.0, 2.0, 4.0], ["a", "b"]),
        fill_value=0.0,
    ).collect()
    assert len(res) == 6  # 3 bins x 2 cats
    got = {(r["x_bin"], r["c"]): r["nansum"] for r in res}
    assert got[(0, "a")] == 1.0           # x=0.5
    assert got[(0, "b")] == 5.0           # x=0.7
    assert got[(1, "a")] == 2.0 + 6.0     # x=1.5, 1.2
    assert got[(2, "b")] == 3.0 + 4.0     # x=2.5, 3.5
    assert got[(1, "b")] == 0.0 and got[(2, "a")] == 0.0


def test_sort_false_skips_sort(spark):
    pdf = pd.DataFrame({"k": [2, 1, 0], "v": [1.0, 2.0, 3.0]})
    df = spark.createDataFrame(pdf)
    plan = (
        groupby_reduce(df, "k", func="nansum", value="v", sort=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan


def test_scan_highcard_partition_straddle(spark):
    # groups interleaved across many partitions: the window must
    # reassemble per-group order globally
    rng = np.random.default_rng(3)
    n = 20000
    pdf = pd.DataFrame({
        "idx": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 500, n),
        "v": rng.normal(size=n),
    })
    df = spark.createDataFrame(pdf).repartition(16)
    res = groupby_scan(df, "k", func="nancumsum", value="v", order_by="idx")
    pd_res = res.toPandas().sort_values("idx").reset_index(drop=True)
    want = pdf.assign(c=pdf.groupby("k")["v"].cumsum())
    # atol covers running sums passing near zero (cancellation makes
    # pure-relative comparison meaningless there)
    np.testing.assert_allclose(pd_res["nancumsum"].to_numpy(), want["c"].to_numpy(), rtol=1e-9, atol=1e-9)


def test_expected_groups_subset_drops_unexpected(spark):
    # expected narrower than observed: flox reindexes to expected only
    pdf = pd.DataFrame({"k": [0, 1, 2, 3], "v": [1.0, 2.0, 3.0, 4.0]})
    df = spark.createDataFrame(pdf)
    res = groupby_reduce(df, "k", func="nansum", value="v", expected_groups=[0, 2]).collect()
    assert {r["k"] for r in res} == {0, 2}


def test_write_partitioned_roundtrip(spark, tmp_path):
    from flox_spark.sources import write_partitioned
    pdf = pd.DataFrame({"k": ["a", "b", "a"], "v": [1.0, 2.0, 3.0]})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "out")
    write_partitioned(df, path, partition_by=["k"])
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning: reading one partition only scans that dir
    plan = back.filter(back.k == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan


def test_skewed_groups_correct(spark):
    # 95% of rows in one group (the skew shape AQE + map-side partial
    # aggregation absorb): correctness under heavy imbalance
    rng = np.random.default_rng(9)
    n = 50000
    k = np.where(rng.random(n) < 0.95, 0, rng.integers(1, 50, n))
    v = rng.normal(size=n)
    df = spark.createDataFrame(pd.DataFrame({"k": k, "v": v})).repartition(16)
    got = {r["k"]: r["nansum"] for r in groupby_reduce(df, "k", func="nansum", value="v").collect()}
    pdf = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].sum()
    for g, w in pdf.items():
        assert got[g] == pytest.approx(w, rel=1e-9, abs=1e-9)
    # the plan must partial-aggregate before the shuffle (flox's
    # "chunk" stage; keeps the hot key from flooding one reducer)
    plan = groupby_reduce(df, "k", func="nansum", value="v", sort=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_uniform_bins_width_bucket_path(spark):
    # >16 uniform breaks trigger the width_bucket fast path; results
    # must match the CASE-chain semantics exactly, incl. edges
    import flox_spark.core as core
    rng = np.random.default_rng(17)
    v = np.concatenate([rng.uniform(-5, 105, 5000), np.arange(0.0, 101.0, 1.0)])  # incl. exact breaks
    pdf = pd.DataFrame({"key": v, "x": np.ones(len(v))})
    df = spark.createDataFrame(pdf)
    breaks = [float(b) for b in range(0, 101, 2)]  # 50 uniform bins
    res = groupby_reduce(
        df, "key", func="count", value="x",
        isbin=True, expected_groups=breaks, fill_value=0,
    ).collect()
    got = {r["key_bin"]: r["count"] for r in res}
    # golden: numpy digitize right=True
    idx = np.digitize(v, breaks, right=True)
    want = {}
    for b in range(1, len(breaks)):
        want[b - 1] = int(((idx == b) & (v > breaks[0])).sum())
    assert got == want
    # and the plan really uses width_bucket, not a 50-arm CASE
    plan = groupby_reduce(
        df, "key", func="count", value="x", isbin=True,
        expected_groups=breaks, fill_value=0, sort=False,
    )._jdf.queryExecution().analyzed().toString()
    assert "width_bucket" in plan


def test_bucketed_table_aggregation_skips_shuffle(spark):
    # write_bucketed_table is the durable rechunk_for_blockwise analog
    # (flox/rechunk.py:158-223): grouping the bucketed table on the
    # bucket key must run WITHOUT any Exchange — the scan's bucket
    # partitioning satisfies the aggregate's distribution
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from flox_spark.sources import write_bucketed_table

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"k": np.arange(1000) % 50, "v": rng.normal(size=1000)})
    write_bucketed_table(spark.createDataFrame(pdf), "bt_shuffle_test",
                        bucket_by=["k"], n_buckets=8)
    try:
        t = spark.table("bt_shuffle_test")
        agg = t.groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {r["k"]: r["s"] for r in agg.collect()}
        want = pdf.groupby("k")["v"].sum()
        assert all(got[k] == pytest.approx(want[k]) for k in want.index)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_shuffle_test")


def test_read_stream_table(spark, tmp_path):
    # schema inferred from the existing files; returns a streaming frame
    import pandas as pd
    from flox_spark.sources import read_stream_table, write_partitioned

    path = str(tmp_path / "stream_src")
    write_partitioned(spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": [0.5, 1.5]})), path)
    sdf = read_stream_table(spark, path, max_files_per_trigger=1)
    assert sdf.isStreaming
    assert set(sdf.columns) == {"k", "v"}


def test_read_csv_roundtrip(spark, tmp_path):
    import datetime as dt
    from pyspark.sql.types import StructType
    from flox_spark.sources import read_csv
    from flox_spark import groupby_reduce

    p = str(tmp_path / "ev.csv")
    with open(p, "w") as f:
        f.write("k,ts,v\n")
        f.write("a,2024-01-01 00:00:00,1.5\n")
        f.write("a,2024-01-01 01:00:00,2.5\n")
        f.write("b,not-a-time,3.0\n")
    schema = StructType().add("k", "string").add("ts", "string").add("v", "double")
    df = read_csv(spark, p, schema=schema, ts_cols=("ts",))
    a_ts = sorted(r["ts"] for r in df.filter("k = 'a'").collect())
    assert a_ts == [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1)]
    assert df.filter("k = 'b'").collect()[0]["ts"] is None  # bad ts -> NULL
    # the engine composes on the CSV frame like any other
    agg = {r["k"]: r["nansum"] for r in groupby_reduce(df, "k", func="nansum", value="v").collect()}
    assert agg == {"a": 4.0, "b": 3.0}


def test_read_json_lines_and_corrupt(spark, tmp_path):
    from pyspark.sql.types import StructType
    from flox_spark.sources import read_json

    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "text": "alpha"}\n')
        f.write('{"id": 2, "text": "beta"}\n')
        f.write("{not json}\n")
    schema = (
        StructType().add("id", "long").add("text", "string").add("_corrupt_record", "string")
    )
    df = read_json(spark, p, schema=schema).cache()
    good = {r["id"] for r in df.filter("_corrupt_record IS NULL").collect()}
    bad = df.filter("_corrupt_record IS NOT NULL").count()
    assert good == {1, 2} and bad == 1
    df.unpersist()


def test_parse_bytes_units():
    from flox_spark.plans.util import parse_bytes

    assert parse_bytes("134217728", 0) == 128 << 20
    assert parse_bytes("128m", 0) == 128 << 20
    assert parse_bytes("128MB", 0) == 128 << 20
    assert parse_bytes("1g", 0) == 1 << 30
    assert parse_bytes("64k", 0) == 64 << 10
    assert parse_bytes("junk", 42) == 42


def test_recommend_shuffle_partitions_from_stats(spark):
    from flox_spark.plans import recommend_shuffle_partitions, tuned_shuffle
    from flox_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    # tiny input: floored at default parallelism
    floor = spark.sparkContext.defaultParallelism
    assert recommend_shuffle_partitions(li) == floor
    # shrink the target partition size until the size estimate drives
    # the recommendation above the floor: n == ceil(size / target)
    from flox_spark.plans import estimate_size_bytes

    size = estimate_size_bytes(li)
    assert size and size > 0
    target = max(1, size // (floor * 4))
    n = recommend_shuffle_partitions(li, target_partition_bytes=target)
    assert n == -(-size // target)
    assert n >= floor * 4
    # context-manager form sets the conf inside the block and RESTORES
    # it on exit (session-global conf must not leak to later queries)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with tuned_shuffle(li, target_partition_bytes=target) as out:
        assert out is li
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_recommend_shuffle_partitions_unknown_stats(spark):
    from flox_spark.plans import recommend_shuffle_partitions

    # a LocalRelation-ish tiny frame still returns a sane floor
    df = spark.range(10)
    n = recommend_shuffle_partitions(df)
    assert n >= 1


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    # dynamic partition overwrite replaces ONLY the partitions present
    # in the incoming frame (the idempotent backfill pattern); static
    # overwrite would truncate the whole table root
    from flox_spark.sources import write_partitioned

    path = str(tmp_path / "dyn")
    base = pd.DataFrame({"day": ["a", "a", "b"], "v": [1, 2, 3]})
    write_partitioned(spark.createDataFrame(base), path, partition_by=["day"])
    refresh = pd.DataFrame({"day": ["b", "b"], "v": [30, 31]})
    write_partitioned(
        spark.createDataFrame(refresh), path, partition_by=["day"],
        dynamic_overwrite=True,
    )
    got = spark.read.parquet(path).toPandas().sort_values(["day", "v"])
    assert list(got["v"]) == [1, 2, 30, 31]  # day=a survived, day=b replaced
    # conf restored after the write
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    ).upper() == "STATIC"


def test_write_partitioned_cluster_by_rowgroup_stats(spark, tmp_path):
    # cluster_by sorts within each write task: every produced parquet
    # file is internally sorted on the cluster column, so row-group
    # min/max stats prune range predicates
    import glob

    import pyarrow.parquet as pq

    from flox_spark.sources import write_partitioned

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"x": rng.permutation(10_000), "v": np.arange(10_000)})
    path = str(tmp_path / "clustered")
    write_partitioned(spark.createDataFrame(pdf), path, cluster_by=["x"])
    files = glob.glob(path + "/*.parquet")
    assert files
    for f in files:
        xs = pq.read_table(f, columns=["x"])["x"].to_numpy()
        assert (np.diff(xs) >= 0).all(), f  # sorted within the file


def test_compact_files(spark, tmp_path):
    import glob

    from flox_spark.sources import compact_files

    path = str(tmp_path / "frag")
    pdf = pd.DataFrame({"a": np.arange(5000), "b": np.arange(5000) % 7})
    # fragment: one file per of 32 partitions
    spark.createDataFrame(pdf).repartition(32).write.parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 16
    n = compact_files(spark, path, target_file_bytes=1 << 30)
    after = glob.glob(path + "/*.parquet")
    assert n == 1 and len(after) == 1
    got = spark.read.parquet(path).toPandas().sort_values("a").reset_index(drop=True)
    assert len(got) == 5000 and (got["a"] == np.arange(5000)).all()
    assert not glob.glob(path + "__compacting*")  # staging cleaned up


def test_write_table_formats(spark, tmp_path):
    from flox_spark.sources import write_table

    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "wt")
    write_table(df, path, fmt="parquet", partition_by=["k"])
    assert spark.read.parquet(path).count() == 2
    # missing connectors fail fast with the enabling package named,
    # BEFORE any job launches
    for fmt, hint in (
        ("delta", "delta-spark"),
        ("iceberg", "iceberg-spark"),
        ("avro", "spark-avro"),
    ):
        with pytest.raises(RuntimeError, match=hint):
            write_table(df, str(tmp_path / fmt), fmt=fmt)


def test_local_frame_np_float32_nan_keeps_nan(spark):
    # r11 ADVICE: the Arrow-path NaN guard must detect NaN generically
    # (NaN != NaN), not via isinstance(float) — an np.float32 NaN is
    # not a Python-float subclass, and the pandas/Arrow route would
    # silently convert it to NULL (the exact corruption the fallback
    # exists to prevent).  The list path keeps it as a real NaN.
    import math

    import numpy as np

    from flox_spark.plans.util import local_frame

    df = local_frame(
        spark,
        [(1, np.float32("nan")), (2, np.float64(3.5)), (3, float("nan"))],
        "id bigint, v double",
    )
    got = {r["id"]: r["v"] for r in df.collect()}
    assert got[1] is not None and math.isnan(got[1])
    assert got[2] == 3.5
    assert got[3] is not None and math.isnan(got[3])
    # and the happy path (no NaN anywhere) still takes Arrow: ints
    # survive exactly and Nones stay NULL
    df2 = local_frame(spark, [(1, None), (2, 7.25)], "id bigint, v double")
    got2 = {r["id"]: r["v"] for r in df2.collect()}
    assert got2 == {1: None, 2: 7.25}


def test_local_frame_list_path_tuple_subclass_values(spark):
    # ADVICE r12 (low): the list-path fallback used to rebuild nested
    # sequences with type(v)(generator) — tuple subclasses with
    # positional constructors (pyspark Row, namedtuples) can't be
    # built from one generator argument and raised or mis-constructed.
    # Nested sequences now re-enter as plain tuples/lists.
    import math
    from collections import namedtuple

    import numpy as np
    from pyspark.sql import Row

    from flox_spark.plans.util import local_frame

    Pt = namedtuple("Pt", ["x", "y"])
    # the float NaN forces the list path; the struct column carries a
    # namedtuple and a Row with numpy scalars inside
    df = local_frame(
        spark,
        [
            (1, float("nan"), Pt(np.float64(1.5), np.int64(2))),
            (2, 3.5, Row(x=np.float64(7.25), y=np.int64(9))),
            (3, 4.5, None),
        ],
        "id bigint, v double, p struct<x double, y bigint>",
    )
    got = {r["id"]: (r["v"], r["p"]) for r in df.collect()}
    assert math.isnan(got[1][0]) and tuple(got[1][1]) == (1.5, 2)
    assert got[2] == (3.5, Row(x=7.25, y=9))
    assert got[3] == (4.5, None)
