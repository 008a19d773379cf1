import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators.kmeans import assign_clusters, kmeans_fit
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def blobs(spark):
    # two well-separated 4-d blobs, 40 points each
    rng = np.random.default_rng(5)
    a = rng.normal(loc=0.0, scale=0.3, size=(40, 4))
    b = rng.normal(loc=10.0, scale=0.3, size=(40, 4))
    pdf = pd.DataFrame(
        {
            "vec_id": range(80),
            "embedding": [v.tolist() for v in np.vstack([a, b])],
        }
    )
    return spark.createDataFrame(pdf)


def test_kmeans_separates_blobs(spark, blobs):
    cents = kmeans_fit(blobs, k=2, max_iter=5)
    rows = cents.collect()
    assert len(rows) == 2
    # one centroid near 0, one near 10 (in every coordinate)
    means = sorted(float(np.mean(r["centroid"])) for r in rows)
    assert means[0] == pytest.approx(0.0, abs=0.5)
    assert means[1] == pytest.approx(10.0, abs=0.5)
    # assignment splits the ids exactly at the blob boundary
    assign = assign_clusters(blobs, cents)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    first_blob = {got[i] for i in range(40)}
    second_blob = {got[i] for i in range(40, 80)}
    assert len(first_blob) == 1 and len(second_blob) == 1
    assert first_blob != second_blob


def test_kmeans_deterministic_across_partitionings(spark, blobs):
    a = sorted(map(tuple, kmeans_fit(blobs, k=3, max_iter=3).collect()))
    b = sorted(
        map(tuple, kmeans_fit(blobs.repartition(7), k=3, max_iter=3).collect())
    )
    # float means over reordered partitions: compare with tolerance
    assert len(a) == len(b)
    for (cid1, c1), (cid2, c2) in zip(a, b):
        assert cid1 == cid2
        assert c1 == pytest.approx(c2, rel=1e-9)


def test_kmeans_inertia_decreases(spark, blobs):
    def inertia(n_iter):
        cents = kmeans_fit(blobs, k=2, max_iter=n_iter)
        assigned = assign_clusters(blobs, cents)
        joined = blobs.join(assigned, "vec_id").join(
            cents.withColumnRenamed("__cid", "cluster"), "cluster"
        )
        return joined.select(
            F.sum(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        "centroid",
                        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("s")
        ).collect()[0]["s"]

    assert inertia(4) <= inertia(1) + 1e-9


def test_kmeans_feeds_ivf_topk(spark):
    # end-to-end: fit on real embeddings, assign, run IVF ANN with the
    # learned clusters; results must be plausible top-k (right shape,
    # scores descending per query)
    from flox_spark.operators import ivf_topk

    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_fit(emb, k=4, max_iter=2)
    labeled = emb.join(assign_clusters(emb, cents), "vec_id").withColumnRenamed(
        "cluster", "km_label"
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(
        labeled, queries, k=5, nprobe=2, cluster_col="km_label", dim=64
    ).collect()
    assert len(out) == 15  # 3 queries x 5
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    for q, scores in by_q.items():
        assert len(scores) == 5
        # each query finds itself (cos_sim 1.0) inside its own cluster
        assert max(scores) == pytest.approx(1.0, abs=1e-6)


def test_assign_clusters_zero_shuffle_plan(spark, blobs):
    cents = kmeans_fit(blobs, k=2, max_iter=2)
    plan = (
        assign_clusters(blobs, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # row-local argmin fold over one broadcast row: no hash exchange
    # on the fact side
    assert "Exchange hashpartitioning" not in plan


def test_assign_clusters_streaming(spark, blobs, tmp_path):
    # the same call works on a streaming frame (stream-static
    # broadcast join + projection)
    import pandas as _pd

    cents = kmeans_fit(blobs, k=2, max_iter=2)
    pdf = blobs.toPandas()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp_path}/in/f0")
    schema = spark.read.parquet(f"{tmp_path}/in/f0").schema
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/in/*")
    out = assign_clusters(stream, cents)
    q = (
        out.writeStream.format("memory").queryName("flox_kassign")
        .outputMode("append").option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["vec_id"]: r["cluster"] for r in spark.sql("SELECT * FROM flox_kassign").collect()}
    want = {r["vec_id"]: r["cluster"] for r in assign_clusters(blobs, cents).collect()}
    assert got == want


def test_kmeans_driver_and_plan_loops_match(spark, blobs):
    # the driver loop (per-iteration centroid collect, the default at
    # sane k) and the fully-lazy plan loop run the identical
    # assignment + mean plans; fitted centroids must agree to float
    # reduction order
    a = sorted(map(tuple, kmeans_fit(blobs, k=3, max_iter=3, driver_loop=True).collect()))
    b = sorted(map(tuple, kmeans_fit(blobs, k=3, max_iter=3, driver_loop=False).collect()))
    assert len(a) == len(b) == 3
    for (cid1, c1), (cid2, c2) in zip(a, b):
        assert cid1 == cid2
        assert c1 == pytest.approx(c2, rel=1e-9)


def test_kmeans_tol_early_stop(spark, blobs):
    # two tight blobs converge after 1-2 iterations; tol must stop the
    # loop early with the same centroids a long run would reach, and
    # restore the session's AQE setting on exit
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    a = sorted(map(tuple, kmeans_fit(blobs, k=2, max_iter=50, tol=1e-9).collect()))
    b = sorted(map(tuple, kmeans_fit(blobs, k=2, max_iter=8).collect()))
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    for (cid1, c1), (cid2, c2) in zip(a, b):
        assert cid1 == cid2
        assert c1 == pytest.approx(c2, rel=1e-9)


def test_kmeans_fit_loop_has_no_data_sized_exchange(spark, blobs):
    # the Lloyd assign step is the packed-centroid row-local fold, not
    # crossJoin-expand + groupBy(id): no hash exchange on the point id
    # anywhere in the iteration plan
    from flox_spark.options import OPTIONS

    old = OPTIONS["diamond_materialize"]
    OPTIONS["diamond_materialize"] = "none"  # keep the full lineage visible
    try:
        # driver_loop=False: the plan loop is the one whose lineage
        # can hide a data-sized exchange (the driver loop's output is
        # a LocalRelation with no lineage to check)
        cents = kmeans_fit(blobs, k=2, max_iter=2, driver_loop=False)
        plan = cents._jdf.queryExecution().executedPlan().toString()
    finally:
        OPTIONS["diamond_materialize"] = old
    assert "hashpartitioning(vec_id" not in plan
    # results identical to the materialized loop
    a = sorted(map(tuple, (r["centroid"] for r in cents.collect())))
    b = sorted(
        map(tuple, (r["centroid"] for r in kmeans_fit(blobs, k=2, max_iter=2).collect()))
    )
    for x, y in zip(a, b):
        assert x == pytest.approx(y, rel=1e-12)


def test_kmeans_empty_input_returns_empty_centroids(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = kmeans_fit(empty, k=2)
    assert out.count() == 0
    assert out.columns == ["__cid", "centroid"]


@pytest.fixture(scope="module")
def many_blobs(spark):
    # 16 well-separated 8-d blobs on a grid, 20 points each — enough
    # cluster structure for a meaningful two-level recall measurement
    rng = np.random.default_rng(11)
    centers = rng.uniform(-50, 50, size=(16, 8))
    pts, ids = [], []
    for ci, c in enumerate(centers):
        pts.append(c + rng.normal(scale=0.2, size=(20, 8)))
        ids.extend(range(ci * 20, ci * 20 + 20))
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in np.vstack(pts)]}
    )
    return spark.createDataFrame(pdf)


def test_two_level_coarse_k1_equals_flat(spark, many_blobs):
    # one coarse cell holds EVERY fine centroid: the two-level fold
    # degenerates to the flat argmin and must agree exactly
    from flox_spark.operators.kmeans import assign_clusters_two_level

    cents = kmeans_fit(many_blobs, k=16, max_iter=3)
    flat = {
        r["vec_id"]: r["cluster"] for r in assign_clusters(many_blobs, cents).collect()
    }
    two = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_two_level(many_blobs, cents, coarse_k=1).collect()
    }
    assert flat == two


def test_two_level_recall_on_clustered_data(spark, many_blobs):
    # sqrt(k) coarse cells: agreement with the flat assignment stays
    # high when the data is actually clustered (the IVF premise)
    from flox_spark.operators.kmeans import assign_clusters_two_level

    cents = kmeans_fit(many_blobs, k=16, max_iter=3)
    flat = {
        r["vec_id"]: r["cluster"] for r in assign_clusters(many_blobs, cents).collect()
    }
    two = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_two_level(many_blobs, cents, coarse_k=4).collect()
    }
    assert set(flat) == set(two)
    agree = sum(flat[i] == two[i] for i in flat) / len(flat)
    assert agree >= 0.9, agree


def test_two_level_empty_centroids(spark, many_blobs):
    from flox_spark.operators.kmeans import assign_clusters_two_level

    empty = spark.createDataFrame([], schema="__cid int, centroid array<double>")
    rows = assign_clusters_two_level(many_blobs, empty).collect()
    assert all(r["cluster"] == -1 for r in rows)


def test_semdedup_two_level_matches_flat_on_clustered(spark, many_blobs):
    # the SemDeDup pair set through the two-level quantizer matches the
    # flat fold when cells are unambiguous (well-separated blobs)
    from flox_spark.operators.similarity import semantic_dedup_pairs

    flat = sorted(
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            many_blobs, k=8, threshold=0.99, max_iter=2, two_level=False
        ).collect()
    )
    two = sorted(
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            many_blobs, k=8, threshold=0.99, max_iter=2, two_level=True, coarse_k=1
        ).collect()
    )
    assert flat == two


def test_ivf_two_level_probe_recall(spark):
    # two-level probe: the probed top-k overlaps the flat probe's
    # result heavily on the real embeddings table
    from flox_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat = ivf_topk(emb, q, k=5, nprobe=2, cluster_col="label", dim=64).collect()
    two = ivf_topk(
        emb, q, k=5, nprobe=2, cluster_col="label", dim=64,
        two_level_probe=True, coarse_probe=2,
    ).collect()
    fset = {(r["query_id"], r["vec_id"]) for r in flat}
    tset = {(r["query_id"], r["vec_id"]) for r in two}
    assert len(tset) == len(fset)
    assert len(fset & tset) / len(fset) >= 0.6, (fset, tset)


def test_driver_loop_invalid_rows_keep_centroids(spark):
    # rows with NULL/short vectors fold to the -1 sentinel; they must
    # not corrupt (overwrite) the LAST centroid during the update
    import pandas as pd

    valid = [[0.0 + i * 0.01, 0.0] for i in range(10)] + [
        [10.0 + i * 0.01, 10.0] for i in range(10)
    ]
    pdf = pd.DataFrame(
        {
            "vec_id": range(22),
            "embedding": valid + [None, [1.0]],
        }
    )
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")
    cents = {r["__cid"]: r["centroid"] for r in kmeans_fit(df, k=2, max_iter=3).collect()}
    # every surviving centroid sits ON a blob: pre-fix the -1 sentinel
    # group's mean (1.0 at pos 0) silently overwrote the LAST centroid
    for c in cents.values():
        m = sum(c) / len(c)
        assert m == pytest.approx(0.045, abs=0.5) or m == pytest.approx(10.045, abs=0.5), c


def test_literal_centroids_nonfinite(spark):
    # NaN coordinates propagate into centroid means: the literal
    # centroid expression must still parse (CAST('NaN' AS DOUBLE))
    import math

    # NaN literals must be born Spark-side (pandas NaN converts to
    # NULL crossing Arrow)
    df = spark.sql(
        "SELECT * FROM VALUES "
        "(0L, array(0.0D, CAST('NaN' AS DOUBLE))), "
        "(1L, array(0.2D, CAST('NaN' AS DOUBLE))), "
        "(2L, array(9.0D, 1.0D)), (3L, array(9.2D, 1.0D)) "
        "AS t(vec_id, embedding)"
    )
    rows = kmeans_fit(df, k=2, max_iter=3).collect()
    assert len(rows) == 2
    assert any(math.isnan(x) for r in rows for x in r["centroid"])


def test_two_level_string_labels(spark):
    # ivf-style two-level packs preserve string cluster labels
    from flox_spark.operators.kmeans import assign_clusters_two_level

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": range(4),
            "embedding": [[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]],
        }
    )
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [("lo", [0.0, 0.0]), ("hi", [5.0, 5.0])],
        schema="__cid string, centroid array<double>",
    )
    got = {r["vec_id"]: r["cluster"] for r in assign_clusters_two_level(df, cents).collect()}
    assert got == {0: "lo", 1: "lo", 2: "hi", 3: "hi"}


def test_ivf_two_level_empty_base(spark):
    # empty base: two-level probe falls back to the flat (empty) path
    # instead of crashing in the numpy coarse partition
    from flox_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame(
        [], schema="vec_id long, label long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], schema="query_id long, embedding array<double>"
    )
    assert ivf_topk(empty, q, k=3, cluster_col="label", dim=2,
                    two_level_probe=True).count() == 0


def test_seed_dim_majority_not_max(spark):
    # one corrupt OVERLONG vector in the 2k-candidate window must not
    # disqualify every normal-length candidate (pre-fix: dim = max
    # candidate length collapsed the fit to at most one centroid)
    valid = [[0.0 + i * 0.01, 0.0] for i in range(10)] + [
        [10.0 + i * 0.01, 10.0] for i in range(10)
    ]
    pdf = pd.DataFrame(
        {"vec_id": range(21), "embedding": valid + [[1.0, 1.0, 1.0, 1.0]]}
    )
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")
    # driver loop (small k*dim) — and the declarative seed twin
    cents = kmeans_fit(df, k=2, max_iter=3).collect()
    assert len(cents) == 2
    assert all(len(r["centroid"]) == 2 for r in cents)
    from flox_spark.operators.kmeans import seed_centroids

    seeds = seed_centroids(df, k=2)
    rows = seeds.collect()
    assert len(rows) == 2 and all(len(r["centroid"]) == 2 for r in rows)


def test_seed_dim_majority_tie_prefers_longer(spark):
    # exact 50/50 length split: both twins must pick the LONGER dim
    pdf = pd.DataFrame(
        {
            "vec_id": range(4),
            "embedding": [[1.0, 2.0], [3.0, 4.0], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
        }
    )
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<double>")
    from flox_spark.operators.kmeans import seed_centroids

    rows = seed_centroids(df, k=4).collect()
    assert rows and all(len(r["centroid"]) == 3 for r in rows)
    fit = kmeans_fit(df, k=4, max_iter=1).collect()
    assert fit and all(len(r["centroid"]) == 3 for r in fit)


def test_kmeans_tol_with_null_seed_coordinate(spark):
    # a NULL coordinate inside a seed vector persists across
    # iterations (no row assigns to a NULL-element centroid);
    # tol-based early stop must skip those pairs, not TypeError
    df = spark.sql(
        "SELECT * FROM VALUES "
        "(0L, array(0.0D, CAST(NULL AS DOUBLE))), "
        "(1L, array(0.2D, CAST(NULL AS DOUBLE))), "
        "(2L, array(9.0D, 1.0D)), (3L, array(9.2D, 1.0D)) "
        "AS t(vec_id, embedding)"
    )
    rows = kmeans_fit(df, k=2, max_iter=5, tol=1e-6).collect()
    assert len(rows) == 2


# --------------------------------------------------------------------------
# vectorized numpy assignment (the large rows-x-k strategy)
# --------------------------------------------------------------------------


def _np_assign(spark, rows, cents, vec_col="embedding", out="cluster"):
    from flox_spark.operators.kmeans import assign_clusters_numpy

    df = spark.createDataFrame(rows, f"vec_id long, {vec_col} array<float>")
    return {
        r["vec_id"]: r[out]
        for r in assign_clusters_numpy(df, cents, vec_col, out).collect()
    }


def test_numpy_assign_matches_flat_fold(spark, blobs):
    from flox_spark.operators.kmeans import assign_clusters_numpy

    cents = kmeans_fit(blobs, 2, max_iter=3)
    flat = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(blobs, cents).collect()
    }
    cents_rows = [
        (r["__cid"], list(r["centroid"]))
        for r in cents.select("__cid", "centroid").collect()
    ]
    vec = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_numpy(blobs, cents_rows).select(
            "vec_id", "cluster"
        ).collect()
    }
    assert vec == flat


def test_numpy_assign_sentinels(spark):
    cents = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    got = _np_assign(
        spark,
        [
            (1, [0.1, 0.2]),          # -> 0
            (2, [9.9, 10.1]),         # -> 1
            (3, None),                # NULL vector -> -1
            (4, [1.0]),               # wrong length -> -1
            (5, [float("nan"), 0.0]), # NaN element -> -1
            (6, [0.1, None]),         # NULL element -> -1
        ],
        cents,
    )
    assert got == {1: 0, 2: 1, 3: -1, 4: -1, 5: -1, 6: -1}


def test_numpy_assign_invalid_centroid_never_wins(spark):
    # centroid 0 carries a NULL coordinate: even the closest point
    # must fall to the valid centroid (fold parity: NULL distance is
    # filtered, never compared)
    cents = [(0, [None, 0.0]), (1, [10.0, 10.0])]
    got = _np_assign(spark, [(1, [0.0, 0.0]), (2, [10.0, 10.0])], cents)
    assert got == {1: 1, 2: 1}


def test_numpy_assign_tie_breaks_to_lowest_cid(spark):
    # exactly equidistant -> lowest cluster id, like the fold
    cents = [(7, [2.0, 0.0]), (3, [0.0, 2.0])]
    got = _np_assign(spark, [(1, [1.0, 1.0])], cents)
    assert got == {1: 3}


def test_numpy_assign_string_labels_null_sentinel(spark):
    cents = [("a", [0.0, 0.0]), ("b", [10.0, 10.0])]
    got = _np_assign(spark, [(1, [0.1, 0.0]), (2, None)], cents)
    assert got == {1: "a", 2: None}


def test_semdedup_pairs_numpy_path_matches_declarative(spark, monkeypatch):
    # force the numpy assignment gate ON and verify the pair set is
    # unchanged on well-separated data (no exact boundary ties)
    import flox_spark.operators.kmeans as km
    from flox_spark.operators.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.normal(scale=1e-3, size=8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def pairs():
        out = semantic_dedup_pairs(
            df, k=4, threshold=0.999, dim=8, max_iter=2, two_level=True
        )
        return sorted((r["id_a"], r["id_b"]) for r in out.collect())

    declarative = pairs()
    monkeypatch.setattr(km, "_NUMPY_ASSIGN_MIN_WORK", -1)
    vectorized = pairs()
    assert vectorized == declarative
    assert len(vectorized) >= 25  # the planted near-dup pairs survive


def test_fit_plan_loop_numpy_assignment_parity(spark, blobs, monkeypatch):
    import flox_spark.operators.kmeans as km

    base = {
        r["__cid"]: [round(x, 9) for x in r["centroid"]]
        for r in kmeans_fit(blobs, 2, max_iter=3, driver_loop=False).collect()
    }
    monkeypatch.setattr(km, "_NUMPY_ASSIGN_MIN_WORK", -1)
    got = {
        r["__cid"]: [round(x, 9) for x in r["centroid"]]
        for r in kmeans_fit(blobs, 2, max_iter=3, driver_loop=False).collect()
    }
    assert got == base


def test_numpy_assign_all_null_centroids_sentinel(spark):
    # ADVICE r8: every centroid NULL used to IndexError on the dim
    # inference; must return the all-sentinel frame instead
    got = _np_assign(spark, [(1, [0.1, 0.2]), (2, None)], [(0, None), (1, None)])
    assert got == {1: -1, 2: -1}
    gs = _np_assign(
        spark, [(1, [0.1, 0.2])], [("a", None), ("b", None)]
    )
    assert gs == {1: None}


def test_numpy_assign_dim_tie_prefers_longer(spark):
    # 50/50 split between dim-2 and dim-3 centroids: the numpy kernel
    # must pick dim 3 (ties toward the longer length), matching
    # _seed_cents — so the dim-3 centroid wins, dim-2 never can
    cents = [(0, [0.0, 0.0]), (1, [5.0, 5.0, 5.0])]
    got = _np_assign(spark, [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0])], cents)
    assert got == {1: 1, 2: -1}


def test_assign_clusters_probe_reuses_collect_on_fold_path(
    spark, monkeypatch, tmp_path
):
    # VERDICT r8 What's-wrong #3 / next #6: when the k=4096 probe gate
    # trips but the TRUE k is small, the collected rows must be reused
    # as a LocalRelation on the fold path (not discarded + lineage
    # re-executed), and a NULL centroid row must not TypeError
    import flox_spark.operators.kmeans as km

    spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [9.9, 10.1]), (3, [0.3, 0.1])],
        "vec_id long, embedding array<float>",
    ).write.parquet(str(tmp_path / "v"))
    df = spark.read.parquet(str(tmp_path / "v"))
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, None)],
        "__cid int, centroid array<double>",
    )
    base = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, cents).collect()}
    assert base == {1: 0, 2: 1, 3: 0}
    # pick a threshold the k=4096 probe assumption clears but the
    # true k (3) does not: probe collects, true-k recheck fails, fold
    # path must reuse the collected rows
    work = km._numpy_assign_work(df, 1)
    assert work is not None and work > 0
    monkeypatch.setattr(km, "_NUMPY_ASSIGN_MIN_WORK", work * 100)

    calls = {"n": 0}
    orig = km.assign_clusters_numpy

    def count(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(km, "assign_clusters_numpy", count)
    probed = {r["vec_id"]: r["cluster"] for r in assign_clusters(df, cents).collect()}
    assert probed == base and calls["n"] == 0


def test_two_level_tolerates_null_and_ragged_centroids(spark):
    from flox_spark.operators.kmeans import assign_clusters_two_level

    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [9.9, 10.1])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, None), (3, [1.0]),
         (4, [float("nan"), 0.0])],
        "__cid int, centroid array<double>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_two_level(df, cents, coarse_k=1).collect()
    }
    assert got == {1: 0, 2: 1}
    all_bad = spark.createDataFrame(
        [(0, None), (1, None)], "__cid int, centroid array<double>"
    )
    sent = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_two_level(df, all_bad).collect()
    }
    assert sent == {1: -1, 2: -1}


def test_fit_return_assignment_labels_match_final_centroids(spark, blobs):
    # converged fit: the returned E-step labels equal a fresh
    # assignment against the returned centroids, in BOTH loop modes
    for dl in (True, False):
        cents, assigned = kmeans_fit(
            blobs, 2, max_iter=8, driver_loop=dl, return_assignment=True
        )
        got = {r["vec_id"]: r["__cid"] for r in assigned.collect()}
        ref = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(blobs, cents).collect()
        }
        assert got == ref, f"driver_loop={dl}"


def test_fit_return_assignment_none_at_zero_iters(spark, blobs):
    cents, assigned = kmeans_fit(blobs, 2, max_iter=0, return_assignment=True)
    assert assigned is None and cents.count() == 2


def test_semdedup_pairs_fit_reuse_matches_explicit_centroids(spark, blobs):
    # max_iter>0 SDP reuses the fit's E-step labels; on converged
    # well-separated data that equals assigning against the fitted
    # centroids passed in explicitly
    from flox_spark.operators.similarity import semantic_dedup_pairs

    cents = kmeans_fit(blobs, 2, max_iter=8)
    a = sorted(map(tuple, semantic_dedup_pairs(
        blobs, k=2, threshold=0.5, dim=2, max_iter=8).collect()))
    b = sorted(map(tuple, semantic_dedup_pairs(
        blobs, k=2, threshold=0.5, dim=2, centroids=cents).collect()))
    assert a == b and len(a) > 0
