"""Cross-corpus dedup, pair refinement, corpus stats, sharding."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import (
    assign_shards,
    dedup_against,
    levenshtein_refine,
    ngram_counts,
    shard_stats,
    tfidf_top_terms,
    write_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )


def test_dedup_against_drops_known_content(spark):
    ref = _docs(spark, [(1, "the quick brown fox"), (2, "hello world")])
    batch = _docs(
        spark,
        [
            (10, "THE  quick   Brown fox "),  # normalized dup of ref 1
            (11, "hello world"),  # exact dup of ref 2
            (12, "something new entirely"),
            (13, "hello worlds"),  # one char off => NOT a dup
        ],
    )
    out = dedup_against(batch, ref)
    assert sorted(r["doc_id"] for r in out.collect()) == [12, 13]
    # surviving rows keep their original columns untouched
    assert set(out.columns) == {"doc_id", "text"}


def test_dedup_against_empty_reference_keeps_all(spark):
    ref = spark.createDataFrame([], "doc_id long, text string")
    batch = _docs(spark, [(1, "a"), (2, "b")])
    assert dedup_against(batch, ref).count() == 2


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_refine_matches_python(spark):
    texts = {
        1: "the quick brown fox jumps",
        2: "the quick brown fox jumped",
        3: "a completely different sentence",
        4: "the quick brown cat jumps",
    }
    docs = _docs(spark, list(texts.items()))
    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 4)], columns=["id_a", "id_b"]
        ).astype("int64")
    )
    out = levenshtein_refine(pairs, docs, max_dist=5)
    got = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out.collect()}
    want = {
        (a, b): _py_lev(texts[a], texts[b])
        for a, b in [(1, 2), (1, 3), (1, 4), (2, 4)]
        if _py_lev(texts[a], texts[b]) <= 5
    }
    assert got == want
    assert (1, 3) not in got  # above threshold dropped


def test_levenshtein_refine_prefix_truncation(spark):
    # distance computed on the first prefix_chars only: long docs with
    # identical prefixes count as distance 0
    docs = _docs(spark, [(1, "abcd" + "x" * 50), (2, "abcd" + "y" * 50)])
    pairs = spark.createDataFrame(pd.DataFrame([(1, 2)], columns=["id_a", "id_b"]).astype("int64"))
    out = levenshtein_refine(pairs, docs, max_dist=0, prefix_chars=4).collect()
    assert len(out) == 1 and out[0]["edit_dist"] == 0


def test_tfidf_top_terms_exact(spark):
    import math

    docs = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
    )
    out = tfidf_top_terms(docs, k=2)
    got = {(r["doc_id"], r["term"]): r["score"] for r in out.collect()}
    # idf: apple ln(3/1), banana ln(3/2), cherry ln(3/2), durian ln(3/1)
    def s(tf, df):
        return round(tf * math.log(3 / df), 6)

    assert got[(1, "apple")] == pytest.approx(s(2, 1))
    assert got[(1, "banana")] == pytest.approx(s(1, 2))
    assert got[(3, "cherry")] == pytest.approx(s(2, 2))
    assert got[(3, "durian")] == pytest.approx(s(1, 1))
    # doc 2: both terms have equal score ln(3/2); tie broken by term asc
    assert {(d, t) for (d, t) in got if d == 2} == {(2, "banana"), (2, "cherry")}
    # k=2 per doc
    counts = pd.Series([d for (d, _) in got]).value_counts()
    assert (counts <= 2).all()


def test_ngram_counts_exact(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c a b c"),
            (2, "a b c d"),
            (3, "zz"),  # shorter than n: contributes nothing
        ],
    )
    out = ngram_counts(docs, n=3, top=10).collect()
    got = [(r["ngram"], r["n_occurrences"]) for r in out]
    # doc1: "a b c","b c a","c a b","a b c"; doc2: "a b c","b c d"
    assert got[0] == ("a b c", 3)
    assert dict(got) == {"a b c": 3, "b c a": 1, "c a b": 1, "b c d": 1}
    # deterministic full order: count desc then ngram asc
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))


def test_assign_shards_deterministic_and_in_range(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(500)])
    a = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 8).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs.repartition(13), 8).collect()
    }
    assert a == b  # partitioning-independent
    assert set(a.values()) <= set(range(8))
    c = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 8, seed="1").collect()}
    assert a != c  # seed changes the draw
    x = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, 8, hash_impl="xxhash64").collect()
    }
    assert set(x.values()) <= set(range(8))


def test_shard_stats_totals(spark):
    docs = _docs(spark, [(i, "x" * (i % 7)) for i in range(300)]).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    st = shard_stats(docs, 4, size_col="n_chars").collect()
    assert sum(r["n_rows"] for r in st) == 300
    assert sum(r["total_size"] for r in st) == sum(i % 7 for i in range(300))
    assert [r["shard"] for r in st] == sorted(r["shard"] for r in st)


def test_write_shards_roundtrip(spark, tmp_path):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    path = str(tmp_path / "shards")
    write_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) <= set(
        range(4)
    )
    # shard column matches assign_shards exactly
    want = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 4).collect()}
    got = {r["doc_id"]: int(r["shard"]) for r in back.collect()}
    assert got == want
    # one data file per shard directory (single writer task per shard)
    import glob

    for d in glob.glob(path + "/shard=*"):
        files = [f for f in glob.glob(d + "/*") if f.endswith(".parquet")]
        assert len(files) == 1, d


def test_assign_shards_validates_n(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="n_shards"):
        assign_shards(docs, 0)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_ops_plan_shapes(spark):
    # the scale-critical physical choices, pinned: tfidf's per-doc
    # top-k must map-side pre-trim (WindowGroupLimit), ngram top-N
    # must be a distributed partial top-N (TakeOrderedAndProject, not
    # a global sort), and dedup_against's small fingerprint set must
    # broadcast into a LeftAnti hash join
    docs = _docs(spark, [(i, f"some text number {i} with words") for i in range(50)])
    assert "WindowGroupLimit" in _plan(tfidf_top_terms(docs, k=2))
    assert "TakeOrderedAndProject" in _plan(ngram_counts(docs))
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    p = _plan(dedup_against(batch, ref))
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_minhash_against_flags_near_dups(spark):
    from flox_spark.operators import minhash_against, minhash_candidates

    base = "the quick brown fox jumps over the lazy dog again and again today"
    ref = _docs(spark, [(100, base), (101, "completely unrelated reference text here")])
    batch = _docs(
        spark,
        [
            (1, base.replace("today", "tomorrow")),  # near-dup of ref 100
            (2, "a totally different new document about spark plans"),
            (3, base),  # exact dup of ref 100
        ],
    )
    flagged = sorted(r["doc_id"] for r in minhash_against(batch, ref).collect())
    assert 3 in flagged  # identical signature must always share all bands
    assert 2 not in flagged
    # consistency with the within-corpus candidate generator: flagging
    # batch-vs-ref equals pairs restricted to (batch, ref) on the union
    uni = batch.union(ref)
    pairs = minhash_candidates(uni).collect()
    want = sorted(
        {r["id_a"] for r in pairs if r["id_b"] >= 100 and r["id_a"] < 100}
        | {r["id_b"] for r in pairs if r["id_a"] >= 100 and r["id_b"] < 100}
    )
    assert flagged == want


def test_dedup_lines_first_occurrence_wins(spark):
    from flox_spark.operators import dedup_lines

    docs = _docs(
        spark,
        [
            (1, "unique opening line\nshared sentence here\nok"),
            (2, "shared sentence here\nanother unique line\nok"),
            (3, "shared sentence here"),
        ],
    )
    out = {r["doc_id"]: r["text_clean"] for r in dedup_lines(docs, min_chars=5).collect()}
    # doc 1 owns the first occurrence (smallest id); "ok" is under
    # min_chars and passes through everywhere
    assert out[1] == "unique opening line\nshared sentence here\nok"
    assert out[2] == "another unique line\nok"
    assert out[3] == ""  # reduced to nothing but still present


def test_dedup_lines_word_granularity(spark):
    from flox_spark.operators import dedup_lines

    docs = _docs(spark, [(1, "alpha beta alpha"), (2, "beta gamma")])
    out = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(docs, sep_re="\\s+", joiner=" ", min_chars=4).collect()
    }
    # within-doc repeats also dedup (first position wins)
    assert out[1] == "alpha beta"
    assert out[2] == "gamma"


def test_shard_stats_reports_empty_shards(spark):
    docs = _docs(spark, [(1, "one doc only")])
    st = shard_stats(docs, 16, size_col=None)
    rows = st.collect()
    assert len(rows) == 16  # every shard present
    assert sum(r["n_rows"] for r in rows) == 1
    assert sorted(r["shard"] for r in rows) == list(range(16))
    st2 = shard_stats(docs.withColumn("n_chars", F.length("text").cast("long")), 16, size_col="n_chars").collect()
    assert sum(r["total_size"] for r in st2) == 12
    assert all(r["total_size"] == 0 for r in st2 if r["n_rows"] == 0)


def test_table_diff_statuses(spark):
    from flox_spark.operators import table_diff

    old = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "text": ["a", "b", "c", None],
            "lang": ["en", "en", "fr", "en"],
        })
    )
    new = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": pd.array([2, 3, 4, 5], dtype="int64"),
            "text": ["b", "C", None, "e"],  # 3 changed, 4 unchanged (null==null)
            "lang": ["de", "fr", "en", "en"],  # 2 changed too
        })
    )
    rows = {r["doc_id"]: (r["status"], r["changed_cols"]) for r in table_diff(old, new, "doc_id").collect()}
    assert rows[1] == ("removed", "")
    assert rows[5] == ("added", "")
    assert rows[2] == ("changed", "lang")
    assert rows[3] == ("changed", "text")
    assert 4 not in rows  # unchanged omitted (null-safe equality)
    withu = {r["doc_id"]: r["status"] for r in table_diff(old, new, "doc_id", include_unchanged=True).collect()}
    assert withu[4] == "unchanged"


def test_table_diff_compare_subset_and_validation(spark):
    from flox_spark.operators import table_diff

    old = spark.createDataFrame(pd.DataFrame({"k": pd.array([1], dtype="int64"), "a": [1.0], "b": [2.0]}))
    new = spark.createDataFrame(pd.DataFrame({"k": pd.array([1], dtype="int64"), "a": [1.0], "b": [9.0]}))
    # only compare 'a': the b change is invisible
    assert table_diff(old, new, "k", compare=["a"]).count() == 0
    with pytest.raises(ValueError, match="absent"):
        table_diff(old, new, "k", compare=["zzz"])


def test_tfidf_null_id_document(spark):
    # a term appearing ONLY in NULL-id docs: count_distinct skips
    # NULLs, so __df was 0 and the ANSI division threw; NULL is one
    # document value (same rule as the span family)
    from pyspark.sql.types import StructType

    from flox_spark.operators import tfidf_top_terms

    schema = StructType.fromDDL("doc_id bigint, text string")
    df = spark.createDataFrame(
        [(None, "solo unique words here"), (1, "shared shared tokens"),
         (2, None), (3, "")],
        schema=schema,
    )
    rows = tfidf_top_terms(df, k=2).collect()
    ids = {r["doc_id"] for r in rows}
    assert None in ids and 1 in ids
    # the NULL-id doc's exclusive terms score with df=1: tf*ln(4/1)
    import math

    solo = {r["term"]: r["score"] for r in rows if r["doc_id"] is None}
    assert all(abs(v - round(math.log(4.0), 6)) < 1e-9 for v in solo.values())


def test_pack_sequences_missing_column_fails_at_build(spark):
    import pandas as pd
    import pytest as _pytest

    from flox_spark.operators import pack_sequences

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with _pytest.raises(ValueError, match="n_tokens"):
        pack_sequences(df, budget=10)


def test_minhash_candidates_prebuilt_buckets_identical(spark):
    # r14 optimization plumbing: a caller that also audits the banding
    # builds (id, band, bkey) once and passes it via ``buckets=`` —
    # the pair set must be IDENTICAL to the self-built path, and the
    # prebuilt plan must not contain a second banding pipeline (no
    # second scan of the docs source).
    from flox_spark.operators import minhash_candidates
    from flox_spark.plans.util import materialize_shared
    from flox_spark.streaming import minhash_band_keys

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base.replace("today", "tomorrow")),
            (3, "a totally different new document about spark plans"),
            (4, base),
        ],
    )
    want = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(docs, max_bucket=None).collect()
    )
    bk = materialize_shared(minhash_band_keys(docs))
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(docs, max_bucket=None, buckets=bk).collect()
    )
    assert got == want and (1, 4) in got
    # max_bucket still applies on the prebuilt path (the quadratic
    # guard is re-applied to the caller's frame)
    capped = minhash_candidates(docs, max_bucket=1, buckets=bk).collect()
    assert capped == []


def test_minhash_pairs_xx_sig_prefilter_differential(spark):
    # r14 optimization: the audit's dup-shingle-group aggregate is
    # prefiltered through signature-equal groups of the materialized
    # band keys instead of running a full-corpus exact-key aggregate.
    # Differential: brute-force the dup shingle-set pair count in
    # Python over the sf0.1 corpus (same tokenize/shingle rules,
    # >=k-token docs only, sorted-distinct shingle set as the key)
    # and pin every audit counter — including completeness
    # (dup_captured == dup_shingle_pairs: equal sets are captured by
    # EVERY band under any hash when max_bucket=None).
    import itertools
    import re

    import pyarrow.parquet as pq

    import __spark_entry__ as em

    d = "/root/testdata/sf0.1"  # the only SF whose fixture seeds exact dups
    row = em.queries()["minhash_pairs_xx"](spark, d).collect()[0]

    tab = pq.read_table(f"{d}/documents.parquet", columns=["doc_id", "text"])
    groups: dict[tuple, int] = {}
    for doc_id, text in zip(tab["doc_id"].to_pylist(), tab["text"].to_pylist()):
        if text is None:
            continue
        # ASCII-equivalent of Java/Spark's \s and trim(): Python's \s
        # and str.strip() also match Unicode whitespace (U+00A0 etc.)
        # and would silently tokenize differently from the Spark side
        _ws = " \t\n\x0b\f\r"
        toks = re.split(f"[{_ws}]+", text.strip(_ws).lower())
        if len(toks) < 3:
            continue
        key = tuple(sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}))
        groups[key] = groups.get(key, 0) + 1
    want_pairs = sum(n * (n - 1) // 2 for n in groups.values() if n > 1)
    assert want_pairs > 0  # the fixture seeds exact duplicates
    assert row["dup_shingle_pairs"] == want_pairs
    assert row["dup_captured"] == want_pairs
    assert row["n_bad_order"] == 0 and row["n_dup_pairs"] == 0
    assert row["n_unknown_ids"] == 0 and row["n_uneven_bands"] == 0
