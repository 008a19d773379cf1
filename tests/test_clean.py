import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import (
    normalize_whitespace,
    redact_pii,
    remove_boilerplate_lines,
)


def test_redact_email_url_phone(spark):
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2, 3],
            "text": [
                "contact alice.smith+x@sub.example.co.uk for details",
                "see https://user@host.example.com/a/b?q=1 and http://plain.org now",
                "call 555-123-4567 or 555.987.6543 today",
                "no pii here at all",
            ],
        }
    )
    out = {r["id"]: r["text"] for r in redact_pii(spark.createDataFrame(pdf)).collect()}
    assert out[0] == "contact <REDACTED> for details"
    assert out[1] == "see <REDACTED> and <REDACTED> now"
    assert out[2] == "call <REDACTED> or <REDACTED> today"
    assert out[3] == "no pii here at all"


def test_redact_url_before_email(spark):
    # a userinfo URL must not leave a half-redacted email tail
    pdf = pd.DataFrame({"id": [0], "text": ["x https://bob@evil.example.com/p y"]})
    out = redact_pii(spark.createDataFrame(pdf)).collect()[0]["text"]
    assert out == "x <REDACTED> y"


def test_normalize_whitespace(spark):
    pdf = pd.DataFrame({"id": [0], "text": ["  a\t\tb \n c   d  "]})
    out = normalize_whitespace(spark.createDataFrame(pdf)).collect()[0]["text"]
    assert out == "a b c d"


def test_remove_boilerplate_lines(spark):
    footer = "Copyright Example Corp"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                f"unique zero\n{footer}\nalso unique",
                f"{footer}\ndifferent body",
                "totally separate\nno footer here",
            ],
        }
    )
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines(spark.createDataFrame(pdf), min_docs=2).collect()
    }
    assert out[0] == "unique zero\nalso unique"
    assert out[1] == "different body"
    assert out[2] == "totally separate\nno footer here"


def test_remove_boilerplate_doc_frac_and_empty(spark):
    shared = "shared line"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [shared, shared, f"{shared}\nextra", "solo"],
        }
    )
    # frac 0.9: shared in 3/4 docs = 0.75 < 0.9 -> kept
    kept = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines(
            spark.createDataFrame(pdf), min_docs=2, max_doc_frac=0.9
        ).collect()
    }
    assert kept[0] == shared
    # frac 0.5: dropped everywhere; fully-boilerplate docs -> ""
    dropped = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines(
            spark.createDataFrame(pdf), min_docs=2, max_doc_frac=0.5
        ).collect()
    }
    assert dropped[0] == "" and dropped[1] == ""
    assert dropped[2] == "extra" and dropped[3] == "solo"


def test_boilerplate_case_insensitive_matching(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["Header Line\nbody a", "header line\nbody b"],
        }
    )
    out = {
        r["doc_id"]: r["text_clean"]
        for r in remove_boilerplate_lines(spark.createDataFrame(pdf), min_docs=2).collect()
    }
    assert out == {0: "body a", 1: "body b"}


def test_decontaminate_ngram(spark):
    import pandas as _pd

    from flox_spark.operators import contamination_report, decontaminate

    bench = spark.createDataFrame(
        _pd.DataFrame(
            [(100, "the capital of france is paris and the capital of spain is madrid")],
            columns=["doc_id", "text"],
        )
    )
    corpus = spark.createDataFrame(
        _pd.DataFrame(
            [
                # verbatim leak of a benchmark span (>= 5 shared 5-grams)
                (0, "trivia time the capital of france is paris and the capital of spain is madrid obviously"),
                (1, "completely unrelated text about query engines and shuffles here"),
                # short partial overlap (< threshold)
                (2, "the capital of france is a lovely place in europe today"),
            ],
            columns=["doc_id", "text"],
        )
    )
    rep = {r["doc_id"]: r["n_shared"] for r in
           contamination_report(corpus, bench, n=5).collect()}
    assert rep.get(0, 0) >= 5
    assert 1 not in rep
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, n=5, min_shared=5).collect())
    assert kept == [1, 2]


def test_decontaminate_exact(spark):
    import pandas as _pd

    from flox_spark.operators import decontaminate

    bench = spark.createDataFrame(
        _pd.DataFrame([(0, "Secret  Eval Question?")], columns=["doc_id", "text"])
    )
    corpus = spark.createDataFrame(
        _pd.DataFrame(
            [(10, "secret eval question?"), (11, "something else")],
            columns=["doc_id", "text"],
        )
    )
    kept = [r["doc_id"] for r in decontaminate(corpus, bench, method="exact").collect()]
    assert kept == [11]  # case/whitespace-normalized match dropped


def test_decontaminate_rejects_unknown(spark):
    import pandas as _pd

    from flox_spark.operators import decontaminate

    df = spark.createDataFrame(_pd.DataFrame([(0, "x")], columns=["doc_id", "text"]))
    with pytest.raises(ValueError, match="ngram|exact"):
        decontaminate(df, df, method="fuzzy")


def test_quality_filter_first_fail_reason(spark):
    import pandas as _pd

    from flox_spark.operators import annotate_quality_filter, quality_filter_report

    rows = [
        (0, "the cat sat on the mat and it was good enough for everyone there"),  # keep
        (1, "too short"),                                     # n_tokens fails first
        (2, "a b c d e f g h i j k l"),                       # 1-char tokens: mean_tok_len
        (3, "the cat!!! sat;;; on,,, the... mat??? here!!!"),  # punct_ratio
    ]
    df = spark.createDataFrame(_pd.DataFrame(rows, columns=["doc_id", "text"]))
    ann = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in
           annotate_quality_filter(df).collect()}
    assert ann[0] == (True, None)
    assert ann[1] == (False, "n_tokens")
    assert ann[2] == (False, "mean_tok_len")
    assert ann[3][0] is False
    rep = {r["outcome"]: r["n"] for r in quality_filter_report(df).collect()}
    assert rep["kept"] == 1
    assert sum(rep.values()) == 4


def test_decontaminate_empty_docs_not_cross_matched(spark):
    import pandas as _pd

    from flox_spark.operators import contamination_report, decontaminate

    bench = spark.createDataFrame(
        _pd.DataFrame([(0, ""), (1, "   "), (2, None)], columns=["doc_id", "text"]))
    corpus = spark.createDataFrame(
        _pd.DataFrame(
            [(10, ""), (11, None), (12, "real content stays here")],
            columns=["doc_id", "text"],
        )
    )
    # contentless benchmark docs must not contaminate contentless
    # corpus docs through the '' sentinel shingle
    assert contamination_report(corpus, bench, n=3).count() == 0
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect())
    assert kept == [10, 11, 12]


def test_decontaminate_benchmark_needs_no_id_column(spark):
    import pandas as _pd

    from flox_spark.operators import decontaminate

    bench = spark.createDataFrame(
        _pd.DataFrame({"text": ["the capital of france is paris today ok"]})
    )
    corpus = spark.createDataFrame(
        _pd.DataFrame(
            [(0, "verbatim the capital of france is paris today ok leak"),
             (1, "unrelated")],
            columns=["doc_id", "text"],
        )
    )
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench, n=3, min_shared=3).collect())
    assert kept == [1]


def test_decontaminate_exact_fp_name_collision(spark):
    import pandas as _pd

    from flox_spark.operators import decontaminate

    corpus = spark.createDataFrame(
        _pd.DataFrame(
            [(0, "match me", "precious"), (1, "other", "data")],
            columns=["doc_id", "text", "__fp"],
        )
    )
    bench = spark.createDataFrame(_pd.DataFrame({"text": ["match  ME"]}))
    rows = {r["doc_id"]: r["__fp"] for r in
            decontaminate(corpus, bench, method="exact").collect()}
    assert rows == {1: "data"}  # user column survives intact


def test_quality_filter_null_text_fails_first_rule(spark):
    import pandas as _pd

    from flox_spark.operators import annotate_quality_filter

    df = spark.createDataFrame(
        _pd.DataFrame([(0, None), (1, "")], columns=["doc_id", "text"]))
    got = {r["doc_id"]: r["drop_reason"] for r in annotate_quality_filter(df).collect()}
    assert got == {0: "n_tokens", 1: "n_tokens"}


def test_quality_filter_rejects_column_collisions(spark):
    import pandas as _pd

    from flox_spark.operators import annotate_quality_filter

    df = spark.createDataFrame(
        _pd.DataFrame([(0, "x", True)], columns=["doc_id", "text", "keep"]))
    with pytest.raises(ValueError, match="already exist"):
        annotate_quality_filter(df)


def test_k_anonymity_report(spark):
    pdf = pd.DataFrame(
        {
            "age": [30] * 6 + [40] * 2 + [50],
            "zip": ["111"] * 6 + ["222"] * 2 + [None],
        }
    )
    from flox_spark.operators import k_anonymity_report

    out = {
        (r["age"], r["zip"]): r["group_size"]
        for r in k_anonymity_report(spark.createDataFrame(pdf), ["age", "zip"], k=5).collect()
    }
    # the 6-row combo is releasable; the 2-row and the NULL-zip combos violate
    assert out == {(40, "222"): 2, (50, None): 1}
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity_report(spark.createDataFrame(pdf), [], k=5)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(spark.createDataFrame(pdf), ["age"], k=1)


def test_decontaminate_literal_path_matches_declarative(spark):
    # r12: the gated literal NOT-IN fast path must agree with the
    # declarative anti-join on every branch — NULL corpus ids are
    # KEPT, NULL hit ids are dropped from the literal list (one NULL
    # inside NOT IN(...) would null the predicate and drop every
    # clean row), string ids take the local-frame branch, and a
    # stats-less corpus keeps the declarative join
    import pandas as pd

    from flox_spark.operators import decontaminate

    rows = []
    for i in range(200):
        txt = f"alpha beta gamma delta {i % 7} epsilon zeta"
        rows.append((None if i % 19 == 0 else i, txt))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    corpus = spark.createDataFrame(pdf.astype({"doc_id": "object"}),
                                   "doc_id bigint, text string")
    bench = corpus.filter((F.col("doc_id") % 5 == 0) | F.col("doc_id").isNull())
    for ms in (1, 3):
        lit_ids = sorted(
            (r["doc_id"] is None, r["doc_id"])
            for r in decontaminate(corpus, bench, n=3, min_shared=ms).collect()
        )
        dec_ids = sorted(
            (r["doc_id"] is None, r["doc_id"])
            for r in decontaminate(
                corpus.localCheckpoint(eager=True), bench, n=3, min_shared=ms
            ).collect()
        )
        assert lit_ids == dec_ids, ms
    # string ids: local-frame branch, same agreement
    scorp = corpus.withColumn("doc_id", F.concat(F.lit("d"), "doc_id"))
    sbench = bench.withColumn("doc_id", F.concat(F.lit("d"), "doc_id"))
    a = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in decontaminate(scorp, sbench, n=3, min_shared=3).collect()
    )
    b = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in decontaminate(
            scorp.localCheckpoint(eager=True), sbench, n=3, min_shared=3
        ).collect()
    )
    assert a == b
    # no contamination at all: corpus returned whole
    clean_bench = spark.createDataFrame(
        [("totally unrelated words only here",)], "text string"
    )
    assert decontaminate(corpus, clean_bench, n=3).count() == corpus.count()


# ---- hypothesis branch differential (r12) -----------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_hyp = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def _decon_corpora(draw):
    # tiny vocab forces heavy shingle collisions; sprinkle NULL ids
    # and empty docs to exercise the NULL/empty contracts
    vocab = ["x", "yy", "Zz", "q"]
    n = draw(st.integers(2, 12))
    rows = []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=12))
        rid = None if draw(st.booleans()) and i % 5 == 0 else i
        rows.append((rid, " ".join(toks)))
    return rows


@_hyp
@given(_decon_corpora(), st.integers(1, 4), st.integers(2, 3))
def test_hypothesis_decontaminate_branch_differential(spark, rows, ms, n):
    # r12: the gated literal NOT-IN path and the declarative anti-join
    # are different physical shapes of the same drop rule — force both
    # on the same random corpus (LocalRelation = stats -> literal;
    # localCheckpoint = stats-less -> declarative) and require the
    # same surviving id multiset, NULL ids included
    from flox_spark.operators import decontaminate

    corpus = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = corpus.filter(
        F.coalesce(F.col("doc_id") % 3 == 0, F.lit(True))
    )
    lit = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in decontaminate(corpus, bench, n=n, min_shared=ms).collect()
    )
    dec = sorted(
        (r["doc_id"] is None, r["doc_id"])
        for r in decontaminate(
            corpus.localCheckpoint(eager=True), bench, n=n, min_shared=ms
        ).collect()
    )
    assert lit == dec
