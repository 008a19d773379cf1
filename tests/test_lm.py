"""Bigram-LM perplexity: differential against a pure-Python
re-derivation, NULL policy, model reuse, filter semantics, and the
broadcast plan shape."""

import math
from collections import Counter

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import doc_perplexity, perplexity_filter, train_bigram_lm

DOCS = {
    0: "the cat sat on the mat",
    1: "the dog sat on the log",
    2: "the cat sat on the mat again and again",
    3: "zzz qqq xxx yyy www vvv",  # out-of-distribution
    4: "single",  # one token -> no bigrams
    5: "",  # empty -> no bigrams
}


def _py_ppl(texts: dict, train_ids=None, k: float = 1.0) -> dict:
    def bigrams(t):
        toks = [w for w in t.lower().strip().split() if w != ""]
        return [
            (a, b)
            for a, b in zip(toks, toks[1:])
            if a != "" and b != ""
        ]

    train = [i for i in texts if train_ids is None or i in train_ids]
    tbg = [bg for i in train for bg in bigrams(texts[i])]
    big = Counter(tbg)
    ctx = Counter(a for a, _ in tbg)
    vocab = {w for p in tbg for w in p}
    V = len(vocab)
    out = {}
    for i, t in texts.items():
        bgs = bigrams(t)
        if not bgs:
            out[i] = (None, None)
            continue
        lps = [
            math.log((big.get(p, 0) + k) / (ctx.get(p[0], 0) + k * V)) for p in bgs
        ]
        out[i] = (len(bgs), math.exp(-sum(lps) / len(lps)))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
    return spark.createDataFrame(pdf)


def test_self_perplexity_matches_python(spark, docs_df):
    got = {r["doc_id"]: r for r in doc_perplexity(docs_df).collect()}
    exp = _py_ppl(DOCS)
    assert set(got) == set(exp)
    for i, (n, ppl) in exp.items():
        if n is None:
            assert got[i]["n_bigrams"] is None and got[i]["ppl"] is None, i
        else:
            assert got[i]["n_bigrams"] == n, i
            assert got[i]["ppl"] == pytest.approx(ppl, rel=1e-12), i


def test_reference_model_scores_ood_higher(spark, docs_df):
    ref = docs_df.filter(F.col("doc_id") <= 2)
    got = {r["doc_id"]: r["ppl"] for r in doc_perplexity(docs_df, reference=ref).collect()}
    exp = _py_ppl(DOCS, train_ids={0, 1, 2})
    for i, (_, ppl) in exp.items():
        if ppl is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(ppl, rel=1e-12), i
    # the out-of-distribution doc must look most surprising
    scored = {i: p for i, p in got.items() if p is not None}
    assert max(scored, key=scored.get) == 3


def test_model_reuse_equals_inline_training(spark, docs_df):
    ref = docs_df.filter(F.col("doc_id") <= 2)
    model = train_bigram_lm(ref)
    a = sorted(map(tuple, doc_perplexity(docs_df, reference=ref).collect()))
    b = sorted(map(tuple, doc_perplexity(docs_df, model=model).collect()))
    assert a == b


def test_perplexity_filter_keeps_null_and_below(spark, docs_df):
    ref = docs_df.filter(F.col("doc_id") <= 2)
    exp = _py_ppl(DOCS, train_ids={0, 1, 2})
    thr = 6.0  # between the in-distribution ppls (~4-5) and the OOD doc (9.0)
    expected_keep = {
        i for i, (_, p) in exp.items() if p is None or round(p, 6) <= thr
    }
    kept = {
        r["doc_id"]
        for r in perplexity_filter(docs_df, max_ppl=thr, reference=ref).collect()
    }
    assert kept == expected_keep
    assert 4 in kept and 5 in kept  # no-evidence docs never dropped
    assert 3 not in kept  # the OOD doc is the one filtered


def test_smooth_k_validation(spark, docs_df):
    with pytest.raises(ValueError, match="smooth_k"):
        doc_perplexity(docs_df, smooth_k=0.0)


def test_score_joins_broadcastable(spark, docs_df):
    # with the hint forced, the model join(s) must be broadcast hash
    # joins and the corpus side never sort-merge-shuffles (a small
    # corpus takes the fused one-lookup shape: ONE model join; the
    # large shape has two); the default (no hint) leaves the same
    # decision to AQE's runtime sizes
    plan = (
        doc_perplexity(docs_df, broadcast_model=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1  # fused lookup join
    assert "SortMergeJoin" not in plan


def test_broadcast_model_false_forbids_broadcast(spark, docs_df):
    # broadcast_model=False must actually keep the model joins off the
    # broadcast path (shuffle_hash hint outranks AQE's size-based
    # conversion); only the constant vocab scalar may broadcast
    plan = (
        doc_perplexity(docs_df, broadcast_model=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every model join (one fused-lookup join on a small corpus, the
    # bigram w1+w2 + context w1 pair on a large one) must be a
    # shuffled hash join; the single-row vocab crossJoin is
    # corpus-side and may still broadcast
    assert plan.count("ShuffledHashJoin") >= 1
    assert "w1" not in "".join(
        ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln
    )


def test_fused_lookup_gated_on_model_size(spark, docs_df):
    # the fused map<w2,c> lookup shape must engage only when BOTH the
    # corpus AND the model are small: scoring a small corpus against a
    # large precomputed reference model would otherwise build per-w1
    # map aggregation buffers over the full model (stopword fan-out)
    from flox_spark.operators.lm import train_bigram_lm

    # plan-stats-large synthetic reference (never executed — we only
    # read the plan): ~50M rows of word soup
    big_ref = spark.range(50_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("w"), (F.col("id") % 500).cast("string")),
            F.concat(F.lit("w"), ((F.col("id") + 1) % 500).cast("string")),
            F.concat(F.lit("w"), ((F.col("id") + 2) % 500).cast("string")),
        ).alias("text"),
    )
    model = train_bigram_lm(big_ref)
    plan_big = (
        doc_perplexity(docs_df, model=model)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "map_from_entries" not in plan_big and "__cm" not in plan_big  # two-join

    # positive control: small model keeps the fused shape
    small_model = train_bigram_lm(docs_df)
    plan_small = (
        doc_perplexity(docs_df, model=small_model)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # r9: the small shape is now the LITERAL fused lookup — the
    # map<w2,c> is built on the driver and lands in the plan as a
    # LocalRelation/LogicalRDD carrying the __cm column, with no
    # map_from_entries aggregate (and no vocab subtree) left to run
    assert "__cm" in plan_small and "map_from_entries" not in plan_small


def test_literal_model_path_matches_declarative(spark, docs_df, tmp_path):
    # r9: parquet-backed frames carry plan stats, so the SMALL gate
    # routes self-trained scoring through the driver-literal model
    # (LocalRelation lookup + literal V).  Its scores and the filter's
    # keep set must match the declarative two-join shape exactly
    # (broadcast_model=False forbids the literal path by contract).
    docs_df.write.parquet(str(tmp_path / "docs"))
    pq = spark.read.parquet(str(tmp_path / "docs"))

    lit_plan = doc_perplexity(pq)
    assert "__cm" in lit_plan._jdf.queryExecution().optimizedPlan().toString()
    lit = {r["doc_id"]: r for r in lit_plan.collect()}
    dec = {r["doc_id"]: r for r in doc_perplexity(pq, broadcast_model=False).collect()}
    assert set(lit) == set(dec)
    for i in lit:
        assert lit[i]["n_bigrams"] == dec[i]["n_bigrams"]
        if dec[i]["ppl"] is None:
            assert lit[i]["ppl"] is None
        else:
            assert lit[i]["ppl"] == pytest.approx(dec[i]["ppl"], rel=1e-12)

    cut = sorted(v["ppl"] for v in dec.values() if v["ppl"] is not None)[1]
    keep_lit = {r["doc_id"] for r in perplexity_filter(pq, cut).collect()}
    keep_dec = {
        r["doc_id"]
        for r in perplexity_filter(pq, cut, broadcast_model=False).collect()
    }
    assert keep_lit == keep_dec
    # NULL-evidence docs (no bigrams) always survive
    assert {4, 5} <= keep_lit


def test_literal_model_empty_bigram_corpus(spark, tmp_path):
    # corpus with no bigrams at all: the literal model is EMPTY (V=0,
    # empty Arrow lookup) — every doc scores NULL and the filter keeps
    # all of them (no evidence never drops)
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "  ", "single"]})
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "docs"))
    pq = spark.read.parquet(str(tmp_path / "docs"))
    out = {r["doc_id"]: (r["n_bigrams"], r["ppl"]) for r in doc_perplexity(pq).collect()}
    assert out == {1: (None, None), 2: (None, None), 3: (None, None)}
    assert sorted(r["doc_id"] for r in perplexity_filter(pq, 10.0).collect()) == [1, 2, 3]


def test_literal_model_hypothesis_parity(spark, tmp_path):
    # property differential for the r9 literal-model rewrite: random
    # small corpora (short vocab so unknown-bigram smoothing paths
    # fire) must score identically through the literal Arrow lookup
    # and the declarative two-join shape, and both must match the
    # pure-Python re-derivation
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = ["a", "b", "cc", "ddd", "e"]

    @st.composite
    def corpora(draw):
        n = draw(st.integers(3, 8))
        return {
            i: " ".join(
                draw(st.lists(st.sampled_from(words), min_size=0, max_size=6))
            )
            for i in range(n)
        }

    counter = {"i": 0}

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
        counter["i"] += 1
        path = str(tmp_path / f"c{counter['i']}")
        pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
        pq = spark.read.parquet(path)
        lit = {r["doc_id"]: r for r in doc_perplexity(pq).collect()}
        dec = {
            r["doc_id"]: r
            for r in doc_perplexity(pq, broadcast_model=False).collect()
        }
        exp = _py_ppl(texts)
        assert set(lit) == set(dec) == set(exp)
        for i, (nb, ppl) in exp.items():
            for got in (lit[i], dec[i]):
                if nb is None:
                    assert got["n_bigrams"] is None and got["ppl"] is None, i
                else:
                    assert got["n_bigrams"] == nb, i
                    assert got["ppl"] == pytest.approx(ppl, rel=1e-12), i
        # r10: the fused keep-in-plan filter must keep exactly the
        # python-derived set at a threshold that splits the scores
        finite = sorted(p for _, p in exp.values() if p is not None)
        thr = finite[len(finite) // 2] if finite else 1.0
        want = {
            i for i, (_, p) in exp.items() if p is None or round(p, 6) <= thr
        }
        got_fused = {
            r["doc_id"] for r in perplexity_filter(pq, max_ppl=thr).collect()
        }
        got_decl = {
            r["doc_id"]
            for r in perplexity_filter(
                pq, max_ppl=thr, broadcast_model=False
            ).collect()
        }
        assert got_fused == got_decl == want

    check()


def test_supplied_pruned_model_matches_declarative(spark):
    # r9 ADVICE: a persisted model whose bigram counts were pruned
    # (KenLM-style min-count trim) has c1/V that are NOT derivable
    # from the surviving bigram rows — the literal collapse must ship
    # the SUPPLIED contexts/vocab instead of recomputing them
    import pandas as pd

    texts = {i: t for i, t in DOCS.items()}
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    corpus = spark.createDataFrame(pdf)
    bigrams, contexts, vocab = train_bigram_lm(corpus)
    # prune: drop singleton bigrams, keep contexts/vocab from the FULL
    # counts; rebuild all three as Arrow LocalRelations so plan stats
    # are known and the 8 MB literal gate passes
    bp = bigrams.filter(F.col("c") >= 2).toPandas()
    cp = contexts.toPandas()
    vp = vocab.toPandas()
    pruned = (
        spark.createDataFrame(bp, schema=bigrams.schema),
        spark.createDataFrame(cp, schema=contexts.schema),
        spark.createDataFrame(vp, schema=vocab.schema),
    )
    lit = sorted(map(tuple, doc_perplexity(corpus, model=pruned).collect()))
    dec = sorted(
        map(
            tuple,
            doc_perplexity(corpus, model=pruned, broadcast_model=False).collect(),
        )
    )
    assert lit == dec
    # and the pruned model really scores differently from the raw one
    raw = sorted(map(tuple, doc_perplexity(corpus).collect()))
    assert lit != raw


def test_fused_filter_matches_declarative_and_keeps_duplicates(spark):
    # the fused small-gate plan (score + keep decision in ONE
    # aggregate) must return exactly the declarative semi-join's rows,
    # including BOTH physical rows of a duplicated doc_id
    import pandas as pd

    texts = dict(DOCS)
    pdf = pd.DataFrame(
        {
            # duplicate id 0 plus a NULL id: the fused plan must keep
            # both dup rows and DROP the NULL-id row (the declarative
            # left-semi equality join never matches NULL — r10 ADVICE)
            "doc_id": pd.Series(list(texts) + [0, None], dtype="Int64"),
            "text": list(texts.values()) + [texts[0], texts[1]],
            "extra": [f"x{i}" for i in range(len(texts))] + ["xdup", "xnull"],
        }
    )
    corpus = spark.createDataFrame(pdf)
    thr = 6.0
    ref = corpus.filter(F.col("doc_id") <= 2)
    fused = sorted(
        map(tuple, perplexity_filter(corpus, max_ppl=thr, reference=ref).collect())
    )
    decl = sorted(
        map(
            tuple,
            perplexity_filter(
                corpus, max_ppl=thr, reference=ref, broadcast_model=False
            ).collect(),
        )
    )
    assert fused == decl
    assert [r[0] for r in fused].count(0) == 2  # both dup-id rows survive
    assert all(r[0] is not None for r in fused)  # NULL-id row dropped
    # schema passes through unchanged (order, names)
    out = perplexity_filter(corpus, max_ppl=thr, reference=ref)
    assert out.columns == corpus.columns
    # self-trained fused path agrees with its declarative twin too
    f2 = sorted(map(tuple, perplexity_filter(corpus, max_ppl=thr).collect()))
    d2 = sorted(
        map(
            tuple,
            perplexity_filter(corpus, max_ppl=thr, broadcast_model=False).collect(),
        )
    )
    assert f2 == d2


def test_scoped_tiny_collect_thread_isolation(spark):
    # mandate r9 #6: the session-global AQE/shuffle-partition window
    # around tiny collects must not leak between two guard users on
    # one SparkSession — the shared lock serializes them and each
    # restores the exact prior conf
    import threading
    import time as _time

    from flox_spark.plans.util import scoped_tiny_collect

    conf = spark.conf
    before = (
        conf.get("spark.sql.adaptive.enabled", "true"),
        conf.get("spark.sql.shuffle.partitions", "200"),
    )
    seen = []
    errs = []

    def worker(tag):
        try:
            with scoped_tiny_collect(spark):
                # inside the guard the window is ours alone
                assert conf.get("spark.sql.adaptive.enabled") == "false"
                assert conf.get("spark.sql.shuffle.partitions") == "4"
                seen.append((tag, "in"))
                _time.sleep(0.05)
                # reentrant: a nested guarded helper must not deadlock
                with scoped_tiny_collect(spark):
                    assert conf.get("spark.sql.shuffle.partitions") == "4"
                seen.append((tag, "out"))
        except Exception as e:  # pragma: no cover
            errs.append((tag, e))

    # r10 VERDICT #7: one of the guard users is a REAL operator-level
    # call (perplexity_filter's fused path collects the literal model
    # through the guard at plan-build time) — the operator must
    # interleave with the raw guard users without deadlock or conf
    # leak, and still return the right rows
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": list(DOCS), "text": list(DOCS.values())}
    )
    corpus = spark.createDataFrame(pdf)
    op_rows = []

    def op_worker():
        try:
            op_rows.extend(
                perplexity_filter(corpus, max_ppl=1e9).select("doc_id").collect()
            )
        except Exception as e:  # pragma: no cover
            errs.append(("op", e))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    ts.append(threading.Thread(target=op_worker))
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    after = (
        conf.get("spark.sql.adaptive.enabled", "true"),
        conf.get("spark.sql.shuffle.partitions", "200"),
    )
    assert after == before
    assert {r["doc_id"] for r in op_rows} == set(DOCS)  # nothing dropped
    # the lock serializes: each thread's in/out are adjacent
    for i in range(0, len(seen), 2):
        assert seen[i][0] == seen[i + 1][0]
        assert (seen[i][1], seen[i + 1][1]) == ("in", "out")


def test_supplied_overpruned_contexts_matches_declarative(spark):
    # a contexts frame pruned MORE aggressively than the bigrams (a
    # bigram's w1 with no c1 row) must score like the declarative left
    # join (coalesce(c1, 0)), not crash the literal collapse
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
    corpus = spark.createDataFrame(pdf)
    bigrams, contexts, vocab = train_bigram_lm(corpus)
    bp = bigrams.toPandas()
    cp = contexts.toPandas()
    cp = cp[cp["w1"] != "the"]  # prune the most common context
    vp = vocab.toPandas()
    pruned = (
        spark.createDataFrame(bp, schema=bigrams.schema),
        spark.createDataFrame(cp, schema=contexts.schema),
        spark.createDataFrame(vp, schema=vocab.schema),
    )
    lit = sorted(map(tuple, doc_perplexity(corpus, model=pruned).collect()))
    dec = sorted(
        map(
            tuple,
            doc_perplexity(corpus, model=pruned, broadcast_model=False).collect(),
        )
    )
    assert len(lit) == len(dec)
    for a, b in zip(lit, dec):
        assert a[:2] == b[:2]
        # scores agree to last-ulp class (avg fold order differs
        # between the fused lookup and the two-join shape)
        if a[2] is None:
            assert b[2] is None
        else:
            assert a[2] == pytest.approx(b[2], rel=1e-12)
