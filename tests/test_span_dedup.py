"""duplicate_spans / remove_duplicate_spans vs a pure-Python oracle.

The reference implementation below is the direct transcription of the
declared semantics (Lee et al. 2021-style exact span dedup at word
granularity): mark every 1-based token position starting a k-token
window whose lower-cased content occurs >= min_occurrences times
corpus-wide (optionally in >= 2 distinct docs), merge marks p < q
with q <= p + k into maximal spans, and for removal drop covered
tokens everywhere except the window-content's global first
occurrence (smallest (id, pos))."""

import random

import pandas as pd
import pytest

from flox_spark.operators import duplicate_spans, remove_duplicate_spans


def _toks(text):
    return text.strip().lower().split()


def _orig_toks(text):
    return text.strip().split()


def _ref_marks(corpus, k, min_occurrences, cross_doc_only, drop_first):
    # corpus: dict id -> text
    occ = {}
    for i, text in corpus.items():
        t = _toks(text)
        for p in range(len(t) - k + 1):
            occ.setdefault(" ".join(t[p : p + k]), []).append((i, p + 1))
    marks = {}
    for g, sites in occ.items():
        if len(sites) < min_occurrences:
            continue
        if cross_doc_only and len({i for i, _ in sites}) < 2:
            continue
        keep = set(sites)
        if drop_first:
            keep.discard(min(sites))
        for i, p in keep:
            marks.setdefault(i, set()).add(p)
    return marks


def _ref_spans(corpus, k, min_occurrences=2, cross_doc_only=False, drop_first=False):
    marks = _ref_marks(corpus, k, min_occurrences, cross_doc_only, drop_first)
    out = []
    for i, ps in marks.items():
        ps = sorted(ps)
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > k:
                out.append((i, start, prev + k - 1, prev + k - start))
                start = p
            prev = p
        out.append((i, start, prev + k - 1, prev + k - start))
    return sorted(out)


def _ref_removed(corpus, k, min_occurrences=2, cross_doc_only=False):
    spans = _ref_spans(corpus, k, min_occurrences, cross_doc_only, drop_first=True)
    out = {}
    for i, text in corpus.items():
        t = _orig_toks(text)
        rm = set()
        for di, s, e, _ in spans:
            if di == i:
                rm.update(range(s, e + 1))
        out[i] = " ".join(tok for j, tok in enumerate(t, 1) if j not in rm)
    return out


def _spark_spans(spark, corpus, **kw):
    pdf = pd.DataFrame(
        {"doc_id": list(corpus), "text": [corpus[i] for i in corpus]}
    )
    rows = duplicate_spans(spark.createDataFrame(pdf), **kw).collect()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"]) for r in rows
    )


def _spark_removed(spark, corpus, **kw):
    pdf = pd.DataFrame(
        {"doc_id": list(corpus), "text": [corpus[i] for i in corpus]}
    )
    rows = remove_duplicate_spans(spark.createDataFrame(pdf), **kw).collect()
    return {r["doc_id"]: r["text_clean"] for r in rows}


CORPUS = {
    # doc 1/2 share an 8-token run ("the quick brown fox jumps over the lazy")
    1: "Alpha the quick brown fox jumps over the lazy dog tail omega",
    2: "Beta prefix the quick brown fox jumps over the lazy dog end",
    # doc 3 repeats a 6-token phrase WITHIN itself, twice
    3: "one two three four five six filler one two three four five six",
    # doc 4 is shorter than most k values
    4: "tiny doc",
    # doc 5 shares nothing
    5: "completely unrelated content with no duplicated window at all here",
}


@pytest.mark.parametrize("k", [4, 6, 8])
def test_spans_match_python_reference(spark, k):
    assert _spark_spans(spark, CORPUS, k=k) == _ref_spans(CORPUS, k)


@pytest.mark.parametrize("k", [4, 6])
def test_cross_doc_only_ignores_within_doc_repeats(spark, k):
    got = _spark_spans(spark, CORPUS, k=k, cross_doc_only=True)
    assert got == _ref_spans(CORPUS, k, cross_doc_only=True)
    # doc 3's self-repeat must be gone; the doc-1/2 share must survive
    assert all(d != 3 for d, *_ in got)
    assert {d for d, *_ in got} >= {1, 2}


def test_min_occurrences_threshold(spark):
    c = {
        1: "a b c d x1 filler1 end1",
        2: "a b c d x2 filler2 end2",
        3: "a b c d x3 filler3 end3",
    }
    # the 4-gram "a b c d" occurs 3 times: >=3 keeps it, >=4 drops it
    assert _spark_spans(spark, c, k=4, min_occurrences=3) == _ref_spans(
        c, 4, min_occurrences=3
    )
    assert _spark_spans(spark, c, k=4, min_occurrences=4) == []


def test_overlapping_windows_merge_to_one_span(spark):
    # a 10-token shared run with k=4 marks 7 window starts that must
    # merge into ONE span of 10 tokens
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    c = {1: f"left {run} right", 2: f"other {run} tail"}
    got = _spark_spans(spark, c, k=4)
    assert got == _ref_spans(c, 4)
    assert got == [(1, 2, 11, 10), (2, 2, 11, 10)]


def test_gapped_duplicates_stay_separate_spans(spark):
    # two shared 4-gram runs separated by > k unshared tokens
    c = {
        1: "s1 s2 s3 s4 u1 u2 u3 u4 u5 t1 t2 t3 t4",
        2: "s1 s2 s3 s4 v1 v2 v3 v4 v5 t1 t2 t3 t4",
    }
    got = _spark_spans(spark, c, k=4)
    assert got == _ref_spans(c, 4)
    assert got == [
        (1, 1, 4, 4), (1, 10, 13, 4), (2, 1, 4, 4), (2, 10, 13, 4),
    ]


def test_short_docs_produce_no_windows(spark):
    got = _spark_spans(spark, CORPUS, k=8)
    assert all(d != 4 for d, *_ in got)


@pytest.mark.parametrize("hash_impl", ["exact", "md5", "xxhash64"])
def test_hash_impls_agree(spark, hash_impl):
    assert _spark_spans(spark, CORPUS, k=6, hash_impl=hash_impl) == _ref_spans(
        CORPUS, 6
    )


def test_removal_matches_python_reference(spark):
    got = _spark_removed(spark, CORPUS, k=6)
    assert got == _ref_removed(CORPUS, 6)
    # every doc survives, the global first occurrence keeps its copy
    assert set(got) == set(CORPUS)


def test_removal_keeps_exactly_one_copy(spark):
    run = "p1 p2 p3 p4 p5 p6"
    c = {1: f"a {run} b", 2: f"c {run} d", 3: f"e {run} f"}
    got = _spark_removed(spark, c, k=6)
    assert got == _ref_removed(c, 6)
    # doc 1 (smallest id) keeps the run; docs 2/3 lose it
    assert got[1] == f"a {run} b"
    assert got[2] == "c d"
    assert got[3] == "e f"


def test_removal_preserves_original_case(spark):
    c = {1: "AAA SHARED RUN OF WORDS x", 2: "yy shared run of words zz"}
    got = _spark_removed(spark, c, k=4)
    assert got == _ref_removed(c, 4)
    assert got[1] == "AAA SHARED RUN OF WORDS x"  # first occurrence, case kept
    assert got[2] == "yy zz"


def test_removal_can_empty_a_doc(spark):
    c = {1: "x1 x2 x3 x4", 2: "x1 x2 x3 x4"}
    got = _spark_removed(spark, c, k=4)
    assert got[1] == "x1 x2 x3 x4"
    assert got[2] == ""


def test_no_duplicates_is_identity_modulo_whitespace(spark):
    c = {1: "some  spaced   text here", 2: "other words entirely now"}
    assert _spark_spans(spark, c, k=3) == []
    got = _spark_removed(spark, c, k=3)
    assert got[1] == "some spaced text here"  # whitespace normalized, tokens kept
    assert got[2] == "other words entirely now"


def test_validation(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b c"]}))
    with pytest.raises(ValueError):
        duplicate_spans(df, k=1)
    with pytest.raises(ValueError):
        duplicate_spans(df, min_occurrences=1)
    with pytest.raises(ValueError):
        duplicate_spans(df, hash_impl="sha9000").collect()


def test_randomized_differential(spark):
    rng = random.Random(11)
    vocab = [f"t{j}" for j in range(12)]
    for trial in range(4):
        corpus = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 24)))
            for i in range(1, 9)
        }
        for k in (3, 5):
            for cdo in (False, True):
                assert _spark_spans(
                    spark, corpus, k=k, cross_doc_only=cdo
                ) == _ref_spans(corpus, k, cross_doc_only=cdo), (trial, k, cdo, corpus)
        assert _spark_removed(spark, corpus, k=3) == _ref_removed(corpus, 3), (
            trial,
            corpus,
        )


def test_small_window_path_matches_groupby_join_path(spark):
    # the <32MB stats gate takes a one-exchange window form; a
    # stats-less frame (localCheckpoint) forces the groupBy + join
    # scale path — every (k, cross_doc_only, drop_first) combination
    # must agree between them
    pdf = pd.DataFrame(
        {"doc_id": list(CORPUS), "text": [CORPUS[i] for i in CORPUS]}
    )
    df = spark.createDataFrame(pdf)  # LocalRelation: small stats
    dfu = df.localCheckpoint(eager=True)  # stats-less: big path
    for k in (4, 6):
        for cdo in (False, True):
            a = sorted(map(tuple, duplicate_spans(df, k=k, cross_doc_only=cdo).collect()))
            b = sorted(map(tuple, duplicate_spans(dfu, k=k, cross_doc_only=cdo).collect()))
            assert a == b == _ref_spans(CORPUS, k, cross_doc_only=cdo)
        ra = {r["doc_id"]: r["text_clean"]
              for r in remove_duplicate_spans(df, k=k).collect()}
        rb = {r["doc_id"]: r["text_clean"]
              for r in remove_duplicate_spans(dfu, k=k).collect()}
        assert ra == rb == _ref_removed(CORPUS, k)


# ---- cross-corpus (against) family ----------------------------------


def _ref_against_spans(batch, reference, k):
    ref_grams = set()
    for text in reference.values():
        t = _toks(text)
        for p in range(len(t) - k + 1):
            ref_grams.add(" ".join(t[p : p + k]))
    marks = {}
    for i, text in batch.items():
        t = _toks(text)
        for p in range(len(t) - k + 1):
            if " ".join(t[p : p + k]) in ref_grams:
                marks.setdefault(i, set()).add(p + 1)
    out = []
    for i, ps in marks.items():
        ps = sorted(ps)
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > k:
                out.append((i, start, prev + k - 1, prev + k - start))
                start = p
            prev = p
        out.append((i, start, prev + k - 1, prev + k - start))
    return sorted(out)


def _ref_against_removed(batch, reference, k):
    spans = _ref_against_spans(batch, reference, k)
    out = {}
    for i, text in batch.items():
        t = _orig_toks(text)
        rm = set()
        for di, s, e, _ in spans:
            if di == i:
                rm.update(range(s, e + 1))
        out[i] = " ".join(tok for j, tok in enumerate(t, 1) if j not in rm)
    return out


REFERENCE = {
    101: "held out benchmark question about the quick brown fox jumps over things",
    102: "another eval item one two three four five six answer key",
}


def _mk(spark, corpus):
    pdf = pd.DataFrame({"doc_id": list(corpus), "text": [corpus[i] for i in corpus]})
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("k", [4, 6])
def test_against_spans_match_python_reference(spark, k):
    from flox_spark.operators import duplicate_spans_against

    got = sorted(
        map(
            tuple,
            duplicate_spans_against(
                _mk(spark, CORPUS), _mk(spark, REFERENCE), k=k
            ).collect(),
        )
    )
    assert got == _ref_against_spans(CORPUS, REFERENCE, k)
    assert got  # the shared fox run / one-two-three run must mark


def test_against_ignores_batch_internal_repeats(spark):
    from flox_spark.operators import duplicate_spans_against

    batch = {1: "z1 z2 z3 z4 mid z1 z2 z3 z4", 2: "z1 z2 z3 z4 tail pad pad2"}
    ref = {9: "nothing shared here at all right now"}
    got = duplicate_spans_against(_mk(spark, batch), _mk(spark, ref), k=4).collect()
    assert got == []


def test_against_removed_matches_python_reference(spark):
    from flox_spark.operators import remove_spans_against

    got = {
        r["doc_id"]: r["text_clean"]
        for r in remove_spans_against(
            _mk(spark, CORPUS), _mk(spark, REFERENCE), k=4
        ).collect()
    }
    assert got == _ref_against_removed(CORPUS, REFERENCE, 4)
    assert set(got) == set(CORPUS)  # every batch doc survives


def test_against_removes_all_copies_no_keep_first(spark):
    from flox_spark.operators import remove_spans_against

    batch = {1: "a p1 p2 p3 p4 b", 2: "c p1 p2 p3 p4 d"}
    ref = {9: "x p1 p2 p3 p4 y"}
    got = {
        r["doc_id"]: r["text_clean"]
        for r in remove_spans_against(_mk(spark, batch), _mk(spark, ref), k=4).collect()
    }
    # BOTH batch copies cut (the reference holds the canonical copy)
    assert got == {1: "a b", 2: "c d"}


def test_against_ref_text_col(spark):
    from flox_spark.operators import duplicate_spans_against

    ref = _mk(spark, REFERENCE).withColumnRenamed("text", "content")
    got = sorted(
        map(
            tuple,
            duplicate_spans_against(
                _mk(spark, CORPUS), ref, k=4, ref_text_col="content"
            ).collect(),
        )
    )
    assert got == _ref_against_spans(CORPUS, REFERENCE, 4)


# ---- hypothesis property differential --------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

hyp = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def corpora(draw):
    # tiny vocab + random case flips + messy separators: forces heavy
    # gram collisions, exercises lowercasing and the \s+ tokenizer
    vocab = ["aa", "Bb", "CC", "d"]
    sep = st.sampled_from([" ", "  ", "\t", " \t ", "\n"])
    n_docs = draw(st.integers(1, 7))
    docs = {}
    for i in range(1, n_docs + 1):
        toks = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=18))
        seps = [draw(sep) for _ in toks]
        docs[i] = "".join(t + s for t, s in zip(toks, seps)).rstrip()
    return docs


@hyp
@given(corpora(), st.integers(2, 4), st.booleans())
def test_hypothesis_spans_differential(spark, corpus, k, cdo):
    assert _spark_spans(spark, corpus, k=k, cross_doc_only=cdo) == _ref_spans(
        corpus, k, cross_doc_only=cdo
    )


@hyp
@given(corpora(), st.integers(2, 3))
def test_hypothesis_removal_differential(spark, corpus, k):
    assert _spark_removed(spark, corpus, k=k) == _ref_removed(corpus, k)


@hyp
@given(corpora(), corpora(), st.integers(2, 3))
def test_hypothesis_against_differential(spark, batch, ref, k):
    from flox_spark.operators import duplicate_spans_against

    got = sorted(
        map(
            tuple,
            duplicate_spans_against(_mk(spark, batch), _mk(spark, ref), k=k).collect(),
        )
    )
    assert got == _ref_against_spans(batch, ref, k)


# ---- streaming twin ---------------------------------------------------


def test_stream_decontaminate_spans_matches_batch(spark):
    # stateless stream-static span decontamination: identical output
    # to the batch remove_spans_against over the union of all batches
    import shutil
    import tempfile
    import time as _time

    from flox_spark.operators import remove_spans_against
    from flox_spark.streaming import stream_decontaminate_spans

    tmp = tempfile.mkdtemp(prefix="flox_sspans_")
    try:
        ref = _mk(spark, REFERENCE)
        f0 = pd.DataFrame(
            {"doc_id": [1, 2], "text": [CORPUS[1], CORPUS[2]]}
        )
        f1 = pd.DataFrame(
            {"doc_id": [3, 4, 5], "text": [CORPUS[3], CORPUS[4], CORPUS[5]]}
        )
        spark.createDataFrame(f0).coalesce(1).write.parquet(f"{tmp}/in/f0")
        _time.sleep(1.1)
        spark.createDataFrame(f1).coalesce(1).write.parquet(f"{tmp}/in/f1")
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = stream_decontaminate_spans(stream, ref, k=4)
        q = (
            out.writeStream.format("memory").queryName("flox_sspans")
            .outputMode("append").option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["text_clean"]
            for r in spark.sql("SELECT * FROM flox_sspans").collect()
        }
        want = {
            r["doc_id"]: r["text_clean"]
            for r in remove_spans_against(_mk(spark, CORPUS), ref, k=4).collect()
        }
        assert got == want == _ref_against_removed(CORPUS, REFERENCE, 4)
        assert set(got) == set(CORPUS)  # nothing dropped, every doc rewritten
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_decontaminate_spans_empty_reference(spark):
    # an empty reference marks nothing: output is whitespace-normalized
    # identity (collect_set over zero rows -> empty array)
    from flox_spark.operators import remove_spans_against
    from flox_spark.streaming import stream_decontaminate_spans

    # two empty shapes: a filtered-to-empty frame and a truly
    # zero-row createDataFrame reference
    for ref in (
        _mk(spark, {9: "zz"}).filter("doc_id < 0"),
        spark.createDataFrame([], schema="doc_id bigint, text string"),
    ):
        # batch comparison on a static frame exercises the same
        # expressions (collect_set over zero rows -> empty array)
        got = {
            r["doc_id"]: r["text_clean"]
            for r in stream_decontaminate_spans(_mk(spark, CORPUS), ref, k=4).collect()
        }
        want = {
            r["doc_id"]: r["text_clean"]
            for r in remove_spans_against(_mk(spark, CORPUS), ref, k=4).collect()
        }
        assert got == want


def test_null_text_and_null_id_edges(spark):
    # NULL text: no windows (size(NULL) = -1), removal rewrites to ""
    # (split(NULL) -> NULL tokens -> concat_ws skips) — the doc
    # SURVIVES.  NULL id: windows still count toward occurrence
    # totals; spans report under the NULL id
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("doc_id bigint, text string")
    df = spark.createDataFrame(
        [(1, "s1 s2 s3 s4 x"), (2, None), (None, "s1 s2 s3 s4 y")], schema=schema
    )
    spans = duplicate_spans(df, k=4).collect()
    by_id = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in spans}
    assert by_id == {1: (1, 4), None: (1, 4)}
    removed = {r["doc_id"]: r["text_clean"] for r in remove_duplicate_spans(df, k=4).collect()}
    assert set(removed.keys()) == {1, 2, None}
    assert removed[2] == ""  # NULL text -> empty, row kept
    # keep-first: struct ordering puts NULL id first, so it keeps
    assert removed[None] == "s1 s2 s3 s4 y"
    assert removed[1] == "x"


def test_null_id_non_first_occurrence_is_cut(spark):
    # code-review finding: _cut_spans' plain left join dropped spans
    # computed FOR NULL-id rows (NULL-rejecting equality) — the
    # NULL-id doc whose gram first occurs in doc 1 must lose its copy
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("doc_id bigint, text string")
    df = spark.createDataFrame(
        [(1, "s1 s2 s3 s4 x"), (None, "y s1 s2 s3 s4")], schema=schema
    )
    # first occurrence = (NULL, 2)? No: struct min orders NULL id
    # FIRST, so the NULL doc keeps and doc 1 is cut
    removed = {r["doc_id"]: r["text_clean"]
               for r in remove_duplicate_spans(df, k=4).collect()}
    assert removed[None] == "y s1 s2 s3 s4"
    assert removed[1] == "x"
    # and cross-corpus removal (no keep-first) cuts the NULL-id row
    from flox_spark.operators import remove_spans_against

    batch = spark.createDataFrame([(None, "a s1 s2 s3 s4 b")], schema=schema)
    ref = spark.createDataFrame([(9, "s1 s2 s3 s4")], schema=schema)
    got = remove_spans_against(batch, ref, k=4).collect()
    assert got[0]["text_clean"] == "a b"


def test_against_reference_without_id_column(spark):
    # the documented contract: references are often bare text suites
    from flox_spark.operators import duplicate_spans_against, remove_spans_against
    from flox_spark.streaming import stream_decontaminate_spans

    ref = spark.createDataFrame(
        pd.DataFrame({"text": [REFERENCE[i] for i in REFERENCE]})
    )
    got = sorted(
        map(tuple, duplicate_spans_against(_mk(spark, CORPUS), ref, k=4).collect())
    )
    assert got == _ref_against_spans(CORPUS, REFERENCE, 4)
    rem = {r["doc_id"]: r["text_clean"]
           for r in remove_spans_against(_mk(spark, CORPUS), ref, k=4).collect()}
    assert rem == _ref_against_removed(CORPUS, REFERENCE, 4)
    srem = {r["doc_id"]: r["text_clean"]
            for r in stream_decontaminate_spans(_mk(spark, CORPUS), ref, k=4).collect()}
    assert srem == rem


def test_cross_doc_only_counts_null_id_as_a_document(spark):
    # code-review finding: min(id) != max(id) skips NULLs, dropping a
    # genuine cross-doc duplicate between a NULL-id doc and one
    # non-NULL doc.  Spec (python reference): NULL is ONE id value —
    # (NULL, 1) share -> 2 docs (marked); (NULL, NULL) -> 1 (not)
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("doc_id bigint, text string")
    df = spark.createDataFrame(
        [(None, "s1 s2 s3 s4 a"), (1, "b s1 s2 s3 s4")], schema=schema
    )
    dfu = df.localCheckpoint(eager=True)  # big path too
    for frame in (df, dfu):
        got = sorted(
            (
                (r["doc_id"], r["span_start"])
                for r in duplicate_spans(frame, k=4, cross_doc_only=True).collect()
            ),
            key=str,
        )
        assert got == sorted([(1, 2), (None, 1)], key=str)
    two_nulls = spark.createDataFrame(
        [(None, "s1 s2 s3 s4 a"), (None, "b s1 s2 s3 s4")], schema=schema
    )
    for frame in (two_nulls, two_nulls.localCheckpoint(eager=True)):
        assert duplicate_spans(frame, k=4, cross_doc_only=True).collect() == []


@hyp
@given(corpora(), st.integers(2, 4), st.booleans(), st.integers(2, 3))
def test_hypothesis_small_vs_big_branch(spark, corpus, k, cdo, mo):
    # r11 VERDICT #7: the <32MB window form and the groupBy+join scale
    # form are ALGORITHMICALLY different implementations of the same
    # mark rule; the fixed-corpus branch test can't see a divergence a
    # future edit introduces off its corpus.  Force BOTH branches on
    # the same random corpus (LocalRelation = small stats -> window
    # path; localCheckpoint = stats-less -> join path) and require
    # identical span sets, for spans AND removal.
    pdf = pd.DataFrame(
        {"doc_id": list(corpus), "text": [corpus[i] for i in corpus]}
    )
    df = spark.createDataFrame(pdf)
    dfu = df.localCheckpoint(eager=True)
    key = lambda r: (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])  # noqa: E731
    small = sorted(
        map(key, duplicate_spans(df, k=k, cross_doc_only=cdo,
                                 min_occurrences=mo).collect())
    )
    big = sorted(
        map(key, duplicate_spans(dfu, k=k, cross_doc_only=cdo,
                                 min_occurrences=mo).collect())
    )
    assert small == big
    rs = {r["doc_id"]: r["text_clean"]
          for r in remove_duplicate_spans(df, k=k).collect()}
    rb = {r["doc_id"]: r["text_clean"]
          for r in remove_duplicate_spans(dfu, k=k).collect()}
    assert rs == rb


def test_removal_out_column_collision_raises(spark):
    # r11 ADVICE: a pre-existing `out` column used to be silently
    # renamed to 'text_clean_' (undiscoverable); now it raises at
    # build time like the family's other contract checks
    from flox_spark.operators import remove_duplicate_spans, remove_spans_against
    from flox_spark.streaming import stream_decontaminate_spans

    pdf = pd.DataFrame({"doc_id": [1], "text": ["a b c d"],
                        "text_clean": ["already here"]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="text_clean"):
        remove_duplicate_spans(df, k=2)
    with pytest.raises(ValueError, match="text_clean"):
        remove_spans_against(df, df.select("text"), k=2)
    with pytest.raises(ValueError, match="text_clean"):
        stream_decontaminate_spans(df, df.select("text"), k=2)
    # a fresh name still works
    out = remove_duplicate_spans(df, k=2, out="cleaned")
    assert "cleaned" in out.columns and "text_clean" in out.columns
