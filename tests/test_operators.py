"""Tests for the beyond-reference pipeline operators (dedup,
similarity, text) on constructed data with planted duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flox_spark.operators import (
    cosine_topk,
    dedup_exact,
    embedding_near_duplicates,
    fingerprint,
    language_id,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash_signatures,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat near the river bank today"),  # near dup of 0
    (3, "el gato y el perro en la casa de la abuela con los amigos"),
    (4, "completely different content about spark query engines and distributed joins"),
    (5, "der hund und die katze sind nicht auf der strasse mit dem auto"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_dedup_exact(docs):
    res = dedup_exact(docs).collect()
    assert len(res) == 5  # 6 docs, one exact-dup pair
    groups = {r["keep_id"]: r["n_dups"] for r in res}
    assert groups[0] == 2  # doc 1 collapsed into doc 0


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, "Hello  World"), (1, "hello world "), (2, "other")], columns=["doc_id", "text"])
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_token_count(docs):
    res = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert res[0] == 14
    assert res[4] == 10


def test_quality_score(docs):
    res = quality_score(docs).collect()
    for r in res:
        assert 0.0 <= r["q_score"] <= 1.0
        assert r["q_n_tokens"] > 0


def test_language_id(docs):
    res = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert res[0] == "en"
    assert res[3] == "es"
    assert res[5] == "de"


def test_minhash_signatures_shape(docs):
    sigs = minhash_signatures(docs, num_hashes=16).collect()
    assert len(sigs) == 6
    row = {r["doc_id"]: r for r in sigs}
    # exact dups share the whole signature
    for i in range(16):
        assert row[0][f"mh{i}"] == row[1][f"mh{i}"]


def test_minhash_candidates_find_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_candidates(docs, num_hashes=16, bands=8).collect()}
    assert (0, 1) in pairs  # exact dup always collides
    # near-dup (0,2) should collide in at least one of 8 bands (2 rows each)
    assert (0, 2) in pairs or (1, 2) in pairs
    # unrelated docs must not pair
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_ngram_jaccard_df_max_consistent(spark):
    # with df_max, jaccard is exact over the FILTERED universe: sizes
    # and intersections exclude the dropped high-frequency shingle
    import pandas as pd
    common = "the quick brown"  # one 3-shingle shared by all docs
    rows = [
        (0, common + " alpha beta gamma delta"),
        (1, common + " alpha beta gamma epsilon"),
        (2, common + " zeta eta theta iota"),
        (3, common + " kappa lambda mu nu"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    # every doc shares shingle "the quick brown" (df=4 > df_max=3):
    # it must count in NEITHER sizes nor intersections
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, k=3, threshold=0.01, df_max=3).collect()}
    # docs 0,1: 5 shingles each, 4 after the drop; shared after drop:
    # 'quick brown alpha','brown alpha beta','alpha beta gamma' = 3;
    # filtered jaccard = 3/(4+4-3) = 0.6 (the old mixed-universe bug
    # divided by unfiltered sizes: 3/(5+5-3) ~ 0.43)
    assert got[(0, 1)] == pytest.approx(3 / 5)
    assert (2, 3) not in got  # only the dropped shingle was shared


def test_simhash(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # exact dups identical
    assert len(sigs[0]) == 8
    # hamming(sig0, sig2) small, hamming(sig0, sig4) larger
    def ham(a, b):
        return sum(bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b))
    assert ham(sigs[0], sigs[2]) <= ham(sigs[0], sigs[4])


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    base[5] = base[3] + rng.normal(scale=1e-3, size=8).astype(np.float32)  # near-dup pair (3,5)
    pdf = pd.DataFrame({"vec_id": range(20), "embedding": [v.tolist() for v in base]})
    return spark.createDataFrame(pdf)


def test_cosine_topk(vectors):
    queries = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = cosine_topk(vectors, queries, k=3, dim=8).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 3
        assert rows[0]["vec_id"] == qid  # self is the top hit
        assert rows[0]["cos_sim"] == pytest.approx(1.0)


def test_cosine_topk_two_stage_fallback(vectors):
    # force k past the WindowGroupLimit pushdown threshold so the
    # explicit (query, partition)-then-global two-stage rank path runs;
    # results must be identical to the pushdown path
    queries = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    spark = vectors.sparkSession
    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    old = spark.conf.get(key, "1000")
    baseline = sorted(map(tuple, cosine_topk(vectors, queries, k=5, dim=8).collect()))
    try:
        spark.conf.set(key, "1")
        two_stage = sorted(map(tuple, cosine_topk(vectors, queries, k=5, dim=8).collect()))
    finally:
        spark.conf.set(key, old)
    assert two_stage == baseline


def test_embedding_near_duplicates(vectors):
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in
             embedding_near_duplicates(vectors, threshold=0.99, planes=8, bands=4, dim=8).collect()}
    assert (3, 5) in pairs
    assert pairs[(3, 5)] > 0.999


def test_ivf_topk(spark):
    # clustered vectors: 3 tight clusters; IVF with nprobe=1 must find
    # same-cluster neighbors; recall vs brute force high for top-3
    from flox_spark.operators import ivf_topk, cosine_topk
    import pandas as pd
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(3, 8)) * 5
    rows = []
    for i in range(30):
        c = i % 3
        rows.append((i, c, (centers[c] + rng.normal(scale=0.1, size=8)).astype(np.float32).tolist()))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "label", "embedding"]))
    queries = df.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    ivf = ivf_topk(df, queries, k=3, nprobe=1, dim=8)
    brute = cosine_topk(df, queries, k=3, dim=8)
    ivf_sets = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    brute_sets = {}
    for r in brute.collect():
        brute_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in ivf_sets:
        assert r is not None
        assert ivf_sets[q] == brute_sets[q]  # tight clusters: perfect recall


def test_repetition_ratio(spark):
    from flox_spark.operators.text import repetition_ratio
    df = spark.createDataFrame(pd.DataFrame(
        [(0, "a a a a b"), (1, "v w x y z")], columns=["doc_id", "text"]))
    got = {r["doc_id"]: (r["rep_distinct_ratio"], r["rep_top_token_ratio"])
           for r in repetition_ratio(df).collect()}
    assert got[0] == (pytest.approx(2 / 5), pytest.approx(4 / 5))
    assert got[1] == (pytest.approx(1.0), pytest.approx(1 / 5))


def test_char_shingles(spark):
    from flox_spark.operators.dedup import doc_shingles
    df = spark.createDataFrame(pd.DataFrame([(0, "abcd")], columns=["doc_id", "text"]))
    got = {r["shingle"] for r in doc_shingles(df, k=3, unit="char").collect()}
    assert got == {"abc", "bcd"}
    short = spark.createDataFrame(pd.DataFrame([(0, "ab")], columns=["doc_id", "text"]))
    got = {r["shingle"] for r in doc_shingles(short, k=3, unit="char").collect()}
    assert got == {"ab"}


def test_dedup_clusters_transitive(spark):
    # A~B, B~C chain to one cluster; D~E separate; representative = min id
    from flox_spark.operators import dedup_clusters

    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (7, 9)], columns=["id_a", "id_b"])
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dedup_clusters_path_graph(spark):
    # worst-case diameter: a 12-node path must still converge to the
    # single minimum label
    n = 12
    pairs = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(n - 1)], columns=["id_a", "id_b"])
    )
    from flox_spark.operators import dedup_clusters

    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(n)}


def test_dedup_clusters_vs_union_find(spark):
    # random graph differential against a plain python union-find
    rng = np.random.default_rng(23)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, size=(80, 2)) if a != b]
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({x for e in edges for x in e})
    want = {x: find(x) for x in nodes}
    from flox_spark.operators import dedup_clusters

    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == want


def test_dedup_clusters_literal_path_parity(spark):
    # r11: the bounded-probe union-find path must be bit-identical to
    # the iterative loop — int ids, string ids, chains, empty input —
    # and fall back to the loop over the cap or on NULL ids
    from flox_spark.operators import dedup_clusters

    rng = np.random.default_rng(31)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(60, 2)) if a != b]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    loop = sorted(map(tuple, dedup_clusters(pairs).collect()))
    lit = sorted(
        map(tuple, dedup_clusters(pairs, literal_max_pairs=100_000).collect())
    )
    assert lit == loop and len(lit) > 0
    # over-cap: falls back to the loop, same answer
    over = sorted(map(tuple, dedup_clusters(pairs, literal_max_pairs=3).collect()))
    assert over == loop
    # string ids, diameter-4 chain
    sp = spark.createDataFrame(
        [("d", "e"), ("c", "d"), ("b", "c"), ("a", "b")], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(sp, literal_max_pairs=100).collect()
    }
    assert got == {x: "a" for x in "abcde"}
    # NULL ids: literal path declines, loop semantics apply either way
    np_pairs = spark.createDataFrame(
        [(None, 2), (2, 3)], "id_a int, id_b int"
    )
    a = sorted(map(tuple, dedup_clusters(np_pairs).collect()), key=str)
    b = sorted(
        map(tuple, dedup_clusters(np_pairs, literal_max_pairs=100).collect()),
        key=str,
    )
    assert a == b
    # empty input
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_clusters(empty, literal_max_pairs=100).collect() == []


def test_dedup_keep_representatives(spark):
    from flox_spark.operators import dedup_clusters, dedup_keep_representatives

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 7, 9, 42], "text": ["a"] * 6})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (7, 9)], columns=["id_a", "id_b"])
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_representatives(docs, dedup_clusters(pairs)).collect()
    )
    assert kept == [1, 7, 42]  # 2,3 fold into 1; 9 into 7; 42 untouched


def test_token_count_bpe(spark):
    from flox_spark.operators import token_count_bpe

    rows = [
        (0, "I don't like 42 cats!"),  # I | _don | 't | _like | _42 | _cats | !
        (1, "hello  world"),           # hello | '  ' | world
        (2, ""),
        (3, "a+b=c"),                  # a | + | b | = | c
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in token_count_bpe(df).collect()}
    assert got == {0: 7, 1: 3, 2: 0, 3: 5}


def test_normalize_embeddings(vectors):
    from flox_spark.operators import normalize_embeddings

    res = normalize_embeddings(vectors, dim=8).collect()
    for r in res:
        assert np.linalg.norm(r["embedding"]) == pytest.approx(1.0, rel=1e-9)


def test_normalize_zero_vector(spark):
    from flox_spark.operators import normalize_embeddings

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[0.0] * 4]})
    )
    r = normalize_embeddings(df, dim=4).collect()[0]
    assert r["embedding"] == [0.0] * 4  # passes through, no NULL/inf


def test_quantize_embeddings_int8(vectors):
    from flox_spark.operators import quantize_embeddings_int8

    res = quantize_embeddings_int8(vectors, dim=8).collect()
    for r in res:
        x = np.array(r["embedding"], dtype=np.float64)
        q = np.array(r["q_embedding"])
        scale = r["q_scale"]
        assert q.min() >= -127 and q.max() <= 127
        assert np.abs(q).max() == 127  # the max-magnitude element saturates
        # dequantized error bounded by half a step
        assert np.abs(q * scale - x).max() <= scale / 2 + 1e-12


def test_simhash_rowlocal_equals_grouped(docs, spark):
    # the zero-shuffle row-local fold must equal the explode->groupBy
    # formulation on real data
    from flox_spark.operators.dedup import _simhash_signatures_grouped
    from flox_spark.sources import load_table

    real = load_table(spark, "/root/testdata/sf0.001", "documents")
    for frame in (docs, real):
        # grouped witness is md5-only: pin the row-local side to md5
        a = sorted(map(tuple, simhash_signatures(frame, hash_impl="md5").collect()))
        b = sorted(map(tuple, _simhash_signatures_grouped(frame).collect()))
        assert a == b


def test_simhash_zero_exchange_plan(spark):
    from flox_spark.sources import load_table

    real = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = simhash_signatures(real)._jdf.queryExecution().executedPlan().toString()
    # the only exchange is ensure_parallelism's round-robin fan-out of
    # the single-file scan; no hash shuffle (the old groupBy is gone)
    assert "Exchange hashpartitioning" not in plan


def test_simhash_null_text_dropped_matches_grouped(spark):
    from flox_spark.operators.dedup import _simhash_signatures_grouped

    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["alpha beta", None, "gamma"]})
    df = spark.createDataFrame(pdf)
    a = sorted(map(tuple, simhash_signatures(df, hash_impl="md5").collect()))
    b = sorted(map(tuple, _simhash_signatures_grouped(df).collect()))
    assert a == b
    assert [t[0] for t in a] == [0, 2]  # NULL-text doc dropped, both paths


def test_dedup_clusters_string_ids_long_chain(spark):
    # regression (ADVICE r2): sum-based convergence was NULL==NULL for
    # string ids and stopped after one round; a diameter-4 path graph
    # exposes it — every node must reach the lexicographic minimum
    from flox_spark.operators import dedup_clusters

    pairs = spark.createDataFrame(
        [("d", "e"), ("c", "d"), ("b", "c"), ("a", "b")],
        ["id_a", "id_b"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {x: "a" for x in "abcde"}


def test_minhash_xxhash64_production_path(spark, docs):
    # the fast non-oracle hash: same LSH structure, long mins instead
    # of md5 hex strings; exact + near dups still pair, and the output
    # is deterministic under repartitioning
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(
            docs, num_hashes=16, bands=16, hash_impl="xxhash64"
        ).collect()
    )
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup at r=1 banding
    again = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(
            docs.repartition(7), num_hashes=16, bands=16, hash_impl="xxhash64"
        ).collect()
    )
    assert pairs == again
    sig = minhash_signatures(docs, num_hashes=4, hash_impl="xxhash64")
    assert dict(sig.dtypes)["mh0"] == "bigint"  # longs, not hex strings


def test_simhash_xxhash64_production_path(spark, docs):
    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash_signatures(docs, hash_impl="xxhash64").collect()}
    assert sigs[0] == sigs[1]  # exact dups share the signature
    assert len(sigs[0]) == 8
    # near dup differs in at most a few bits
    diff_bits = sum(
        bin(int(a, 16) ^ int(b, 16)).count("1")
        for a, b in zip(sigs[0], sigs[2])
    )
    assert diff_bits <= 8
    assert sigs[0] != sigs[4]  # unrelated doc diverges
    with pytest.raises(ValueError, match="at most 16 hex chars"):
        simhash_signatures(docs, hex_chars=17, hash_impl="xxhash64")


def test_hash_impl_rejects_unknown(spark, docs):
    with pytest.raises(ValueError, match="hash_impl"):
        minhash_signatures(docs, hash_impl="sha9")
    with pytest.raises(ValueError, match="hash_impl"):
        simhash_signatures(docs, hash_impl="sha9")


def test_simhash_pairs_hamming(spark, docs):
    from flox_spark.operators import simhash_pairs

    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_pairs(docs, hex_chars=16, bands=16, max_hamming=8).collect()}
    assert got.get((0, 1)) == 0  # exact dups: distance 0
    # near dup of 0 within a few bits (if banding surfaced it)
    for pair, h in got.items():
        assert h <= 8
    # recall guarantee: max_hamming < bands => a pair within the
    # threshold shares >= 1 band, so (0,1) can never be missed
    got2 = {(r["id_a"], r["id_b"]) for r in
            simhash_pairs(docs, max_hamming=3, bands=4).collect()}
    assert (0, 1) in got2


def test_simhash_pairs_matches_bruteforce(spark, docs):
    # differential: banding+filter == brute-force hamming over all
    # pairs when max_hamming < bands (pigeonhole recall guarantee)
    from flox_spark.operators import simhash_pairs, simhash_signatures

    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(int(sigs[a], 16) ^ int(sigs[b], 16)).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_pairs(docs, max_hamming=3, bands=4).collect()}
    assert got == want


def test_simhash_pairs_validates(spark, docs):
    from flox_spark.operators import simhash_pairs

    with pytest.raises(ValueError, match="divide"):
        simhash_pairs(docs, hex_chars=8, bands=3)


def test_simhash_pairs_first_match_band_dedup(spark, docs):
    # r11: the UNCAPPED path (max_bucket=None) dedups by emitting a
    # pair only from its first matching band instead of a
    # candidate-sized distinct.  Exact dups share ALL bands — they
    # must surface exactly once — and the whole uncapped pair set
    # must equal the capped path's on an input with no degenerate
    # buckets (both equal brute force by the pigeonhole guarantee).
    from flox_spark.operators import simhash_pairs

    unc = [
        ((r["id_a"], r["id_b"]), r["hamming"])
        for r in simhash_pairs(
            docs, max_hamming=3, bands=4, max_bucket=None
        ).collect()
    ]
    assert len(unc) == len(dict(unc))  # no pair emitted twice
    capped = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=3, bands=4).collect()
    }
    assert dict(unc) == capped
    assert capped.get((0, 1)) == 0  # the all-bands-match exact dup


def test_simhash_pairs_16_chars_no_overflow(spark, docs):
    # 64-bit signatures with the top bit set: hamming must not
    # silently NULL out (conv->long overflow on the full string)
    from flox_spark.operators import simhash_pairs, simhash_signatures

    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash_signatures(docs, hex_chars=16).collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(int(sigs[a], 16) ^ int(sigs[b], 16)).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_pairs(docs, hex_chars=16, bands=4, max_hamming=3).collect()}
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 0
    # the uncapped first-match path at 16 chars (two xor slices, r=4
    # band substrings) must agree too
    unc = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_pairs(docs, hex_chars=16, bands=4, max_hamming=3,
                         max_bucket=None).collect()}
    assert unc == want


def test_simhash_pairs_rejects_hamming_ge_bands(spark, docs):
    from flox_spark.operators import simhash_pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, bands=4, max_hamming=4)


def test_minhash_jaccard_estimate(spark, docs):
    from flox_spark.operators import minhash_jaccard_estimate

    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 0], "id_b": [1, 4]})
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_jaccard_estimate(docs, pairs, num_hashes=16).collect()
    }
    assert got[(0, 1)] == 1.0  # exact duplicates agree on every slot
    assert got[(0, 4)] < 0.5  # unrelated docs mostly disagree
    # estimate granularity is 1/num_hashes
    assert all(abs(v * 16 - round(v * 16)) < 1e-9 for v in got.values())


def test_fuzzy_join_finds_near_matches(spark):
    from flox_spark.operators import fuzzy_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "lid": [1, 2, 3],
                "name": ["jonathan smith", "maria garcia", "wei zhang"],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": [10, 11, 12, 13],
                "name2": [
                    "jonathon smith",   # 1 edit from lid=1
                    "Maria  Garcia",    # trims/case -> 1 edit (double space)
                    "completely other", # no match
                    "wei zhang",        # exact
                ],
            }
        )
    )
    out = {
        (r["lid"], r["rid"]): r["edit_dist"]
        for r in fuzzy_join(
            left, right, "lid", "name", "rid", "name2", max_dist=2, bands=16
        ).collect()
    }
    assert out[(1, 10)] == 1
    assert out[(3, 13)] == 0
    assert (2, 11) in out and out[(2, 11)] <= 2
    assert not any(rid == 12 for (_, rid) in out)


def test_fuzzy_join_respects_max_dist(spark):
    from flox_spark.operators import fuzzy_join

    left = spark.createDataFrame(pd.DataFrame({"lid": [1], "s": ["abcdef"]}))
    right = spark.createDataFrame(
        pd.DataFrame({"rid": [1, 2], "s2": ["abcdxx", "abcdef"]})
    )
    out = {
        r["rid"]: r["edit_dist"]
        for r in fuzzy_join(
            left, right, "lid", "s", "rid", "s2", max_dist=1, bands=16
        ).collect()
    }
    assert out == {2: 0}  # the 2-edit candidate is certified away


def test_fuzzy_join_plan_never_cross_joins(spark):
    from flox_spark.operators import fuzzy_join
    from flox_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("name")
    )
    left = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("lid"), "name"
    )
    right = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("rid"), "name"
    )
    plan = (
        fuzzy_join(left, right, "lid", "name", "rid", "name", max_dist=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_carry_rejects_reserved_names(spark, docs):
    # carrying a column named like a staged/output column would
    # silently clobber the pipeline — must raise loudly
    from flox_spark.operators.dedup import band_buckets

    for bad in ("band", "bkey", "__sh", "mh0"):
        staged = docs.withColumn(bad, F.lit("x"))
        with pytest.raises(ValueError, match="carry"):
            band_buckets(staged, num_hashes=8, bands=2, carry=(bad,)).collect()


def test_simhash_first_match_hypothesis_differential(spark):
    # property differential for the r11 first-match-band dedup:
    # random small corpora (repeated words so signatures cluster and
    # pairs share MULTIPLE bands) must produce identical pair sets
    # through the uncapped first-match path, the capped distinct
    # path (cap high enough to never bite), and brute force.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flox_spark.operators import simhash_pairs, simhash_signatures

    words = ["aa", "bb", "cc", "dd"]

    @st.composite
    def corpora(draw):
        n = draw(st.integers(4, 9))
        return {
            i: " ".join(
                draw(st.lists(st.sampled_from(words), min_size=1, max_size=5))
            )
            for i in range(n)
        }

    @given(corpora())
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    def check(texts):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": list(texts), "text": list(texts.values())}
            )
        )
        sigs = {
            r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()
        }
        ids = sorted(sigs)
        want = {}
        for ix, a in enumerate(ids):
            for b in ids[ix + 1:]:
                h = bin(int(sigs[a], 16) ^ int(sigs[b], 16)).count("1")
                if h <= 3:
                    want[(a, b)] = h
        unc = [
            ((r["id_a"], r["id_b"]), r["hamming"])
            for r in simhash_pairs(
                df, max_hamming=3, bands=4, max_bucket=None
            ).collect()
        ]
        assert len(unc) == len(dict(unc))  # first-match: exactly once
        assert dict(unc) == want
        capped = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(
                df, max_hamming=3, bands=4, max_bucket=10**6
            ).collect()
        }
        assert capped == want

    check()
