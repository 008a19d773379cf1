"""Document chunking + embedding pooling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flox_spark.operators import average_embeddings, chunk_documents


@pytest.fixture(scope="module")
def corpus(spark):
    docs = [
        (0, " ".join(f"t{i}" for i in range(10))),
        (1, "one two three"),
        (2, "solo"),
        (3, None),
        (4, "   "),
    ]
    return spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))


def test_chunks_cover_and_preserve_order(spark, corpus):
    rows = chunk_documents(corpus, max_tokens=4, overlap=0).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 10 tokens -> 4+4+2
    texts = [r["chunk_text"] for r in by_doc[0]]
    assert texts == ["t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]
    assert [r["n_tokens"] for r in by_doc[0]] == [4, 4, 2]
    assert [r["chunk_id"] for r in by_doc[0]] == [0, 1, 2]
    assert [r["chunk_text"] for r in by_doc[1]] == ["one two three"]
    assert [r["chunk_text"] for r in by_doc[2]] == ["solo"]
    assert 3 not in by_doc and 4 not in by_doc  # NULL/blank: no rows


def test_chunks_overlap(spark, corpus):
    rows = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(corpus, max_tokens=4, overlap=2).collect()
        if r["doc_id"] == 0
    )
    # stride 2: starts 0,2,4,6,8
    assert rows[0] == (0, "t0 t1 t2 t3")
    assert rows[1] == (1, "t2 t3 t4 t5")
    assert rows[-1] == (4, "t8 t9")
    # consecutive chunks share exactly `overlap` tokens
    for (_, a), (_, b) in zip(rows, rows[1:]):
        assert a.split()[2:] == b.split()[: len(a.split()[2:])]


def test_chunk_validation(spark, corpus):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(corpus, max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(corpus, max_tokens=0)


def test_average_embeddings_pools(spark):
    rng = np.random.default_rng(61)
    vecs = rng.normal(size=(9, 4))
    pdf = pd.DataFrame(
        {
            "doc": [0, 0, 0, 1, 1, 2, 2, 2, 2],
            "embedding": [v.tolist() for v in vecs],
        }
    )
    got = {
        r["doc"]: r["embedding"]
        for r in average_embeddings(
            spark.createDataFrame(pdf), "doc", dim=4
        ).collect()
    }
    for doc, grp in pdf.groupby("doc"):
        want = np.mean(np.array(grp["embedding"].tolist()), axis=0)
        assert np.allclose(got[doc], want, rtol=1e-12), doc


def test_chunk_text_preserves_case_and_punctuation(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(0, 'The CEO said "NO"\n\tTwice!')], columns=["doc_id", "text"])
    )
    rows = chunk_documents(df, max_tokens=3).collect()
    texts = sorted((r["chunk_id"], r["chunk_text"]) for r in rows)
    # tokens verbatim; whitespace runs collapse to single spaces
    assert texts == [(0, 'The CEO said'), (1, '"NO" Twice!')]


def test_average_embeddings_keeps_all_null_groups_and_validates_dim(spark):
    import pyspark

    pdf = pd.DataFrame(
        {
            "doc": [0, 0, 1, 1],
            "embedding": [[1.0, 2.0], [3.0, 4.0], None, None],
        }
    )
    got = {r["doc"]: r["embedding"] for r in
           average_embeddings(spark.createDataFrame(pdf), "doc", dim=2).collect()}
    assert got[0] == [2.0, 3.0]
    assert got[1] is None  # all-NULL group stays, with NULL vector
    ragged = pd.DataFrame(
        {"doc": [0, 0], "embedding": [[1.0, 2.0], [1.0, 2.0, 3.0]]}
    )
    with pytest.raises(Exception, match="expected dim 2"):
        average_embeddings(spark.createDataFrame(ragged), "doc", dim=2).collect()


def test_chunk_documents_streaming(spark, tmp_path):
    # chunk_documents is a pure projection (explode over sequence):
    # the identical call runs on a Structured Streaming frame
    src = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d e f", "x y"]}
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = chunk_documents(stream, max_tokens=3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("flox_chunks")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM flox_chunks").collect()
    )
    assert rows == [(0, 0, "a b c"), (0, 1, "d e f"), (1, 0, "x y")]
