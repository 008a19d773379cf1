import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import ann_recall, dedup_documents
from flox_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far into the woods tonight"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,
                base,  # exact dup of 0
                base.replace("lazy", "sleepy"),  # near-dup of 0
                "completely different content about query engines",
                "another unrelated piece of text entirely here",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_dedup_exact_method(spark, dup_docs):
    kept = sorted(r["doc_id"] for r in dedup_documents(dup_docs, method="exact").collect())
    # only the exact dup (1) goes; the near-dup survives exact dedup
    assert kept == [0, 2, 3, 4]


def test_dedup_minhash_method(spark, dup_docs):
    # r=1 banding: collision prob ~1 at Jaccard ~0.65 (the one-word
    # edit), still ~0 for unrelated docs — deterministic expectation
    kept = sorted(
        r["doc_id"]
        for r in dedup_documents(
            dup_docs, method="minhash", num_hashes=16, bands=16, shingle_k=3, max_bucket=None
        ).collect()
    )
    # 1 and 2 both collapse into 0's cluster
    assert kept == [0, 3, 4]


def test_dedup_simhash_method(spark, dup_docs):
    kept = sorted(
        r["doc_id"] for r in dedup_documents(dup_docs, method="simhash").collect()
    )
    # exact dups share a signature; near-dup may or may not at 32 bits
    assert 1 not in kept
    assert 0 in kept and 3 in kept and 4 in kept


def test_dedup_unknown_method(spark, dup_docs):
    with pytest.raises(ValueError, match="method must be"):
        dedup_documents(dup_docs, method="lsh")


def test_dedup_embedding_method(spark):
    # vec 5 is a near-copy of vec 3 (crafted); embedding dedup drops it
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 8)).astype(np.float64)
    base[5] = base[3] + rng.normal(scale=1e-3, size=8)
    pdf = pd.DataFrame({"vec_id": range(20), "embedding": [v.tolist() for v in base]})
    df = spark.createDataFrame(pdf)
    kept = sorted(
        r["vec_id"]
        for r in dedup_documents(
            df, method="embedding", id_col="vec_id",
            threshold=0.999, planes=8, bands=4, dim=8,
        ).collect()
    )
    assert 5 not in kept and 3 in kept
    assert len(kept) == 19


def test_ann_recall_full_probe_is_one(spark):
    emb = load_table(spark, SF, "embeddings")
    nclusters = emb.select("label").distinct().count()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probing every cluster makes IVF exhaustive -> recall exactly 1
    full = ann_recall(emb, queries, k=10, nprobe=nclusters)
    rows = full.collect()
    assert len(rows) == 5
    assert all(r["recall_at_k"] == 1.0 and r["k"] == 10 for r in rows)
    # probing 1 of several clusters cannot beat the exhaustive scan
    part = ann_recall(emb, queries, k=10, nprobe=1).collect()
    assert all(r["recall_at_k"] <= 1.0 for r in part)


def test_dedup_simhash_degenerate_bucket_capped(spark):
    # 200 identical docs share one signature; with max_bucket below
    # that, the bucket is dropped BEFORE the quadratic self-join and
    # every doc survives (degenerate buckets belong to dedup_exact)
    pdf = pd.DataFrame(
        {"doc_id": range(200), "text": ["same boilerplate text"] * 200}
    )
    df = spark.createDataFrame(pdf)
    kept = dedup_documents(df, method="simhash", max_bucket=50).count()
    assert kept == 200
    # with the cap above the bucket size the join dedups them to one
    kept2 = dedup_documents(df, method="simhash", max_bucket=None).count()
    assert kept2 == 1


def test_curate_corpus_stages_and_report(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from flox_spark.operators import curate_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array(range(8), dtype="int64"),
        "text": [
            "tiny",                                   # dropped by quality (min_tokens)
            base,                                     # survives everything
            base,                                     # exact dup of 1 -> dropped by dedup
            "already known reference content here today",  # in reference -> dedup_against
            "some benchmark question appears here verbatim for the eval set",  # contaminated
            "a perfectly fine unique document about spark physical plans",
            "another good document discussing the shuffle partitioning strategy",
            "yet another clean document on broadcast joins and skew",
        ],
    }))
    reference = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array([100], dtype="int64"),
        "text": ["Already  KNOWN reference content here today"],  # normalized match
    }))
    bench = spark.createDataFrame(pd.DataFrame({
        "doc_id": pd.array([200], dtype="int64"),
        "text": ["some benchmark question appears here verbatim for the eval set"],
    }))
    curated, report = curate_corpus(
        docs,
        quality={"min_tokens": 3, "min_stop_ratio": 0.0},
        reference=reference,
        dedup="exact",
        benchmarks=bench,
        decontaminate_kw={"method": "exact"},
        n_shards=4,
    )
    ids = sorted(r["doc_id"] for r in curated.collect())
    assert ids == [1, 5, 6, 7]
    assert "shard" in curated.columns
    assert set(r["shard"] for r in curated.collect()) <= set(range(4))
    rep = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert rep == {"input": 8, "quality": 7, "dedup_against": 6, "dedup": 5, "decontaminate": 4}
    order = [r["stage"] for r in report.collect()]
    assert order == ["input", "quality", "dedup_against", "dedup", "decontaminate"]


def test_curate_corpus_perplexity_stage(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
            ] * 6
            + ["zz qq xx vv ww uu tt ss rr"] * 2,
        }
    )
    df = spark.createDataFrame(pdf)
    from flox_spark.operators import curate_corpus, doc_perplexity

    # train on the full corpus; the OOD docs score worse — pick a
    # threshold between the two score groups
    ppls = sorted(
        r["ppl"] for r in doc_perplexity(df).collect() if r["ppl"] is not None
    )
    thr = (ppls[0] + ppls[-1]) / 2
    cur, report = curate_corpus(
        df, quality=None, dedup=None, max_ppl=thr,
        perplexity_kw={"reference": df},
    )
    kept = {r["doc_id"] for r in cur.collect()}
    rep = {r["stage"]: r["n_docs"] for r in report.collect()}
    assert rep["input"] == 8
    assert rep["perplexity"] == len(kept)
    assert len(kept) < 8 and kept <= set(range(8))
