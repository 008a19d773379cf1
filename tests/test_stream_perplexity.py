"""Streaming LM perplexity scoring: stream-static model joins +
windowed per-doc mean; equality vs the batch scorer at watermark
close."""

import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.operators import doc_perplexity, train_bigram_lm
from flox_spark.streaming import doc_perplexity_stream


def test_perplexity_stream_equals_batch(spark):
    rng = np.random.default_rng(31)
    words = [f"w{i}" for i in range(30)]
    base = dt.datetime(2024, 6, 1)
    n = 200
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in sorted(rng.integers(0, 2 * 3600, n))
            ],
            "text": [
                " ".join(rng.choice(words, rng.integers(2, 12)))
                for _ in range(n)
            ],
        }
    )
    ref = spark.createDataFrame(pdf.iloc[:100][["doc_id", "text"]])
    from flox_spark.plans.util import materialize_shared

    model = tuple(materialize_shared(m) for m in train_bigram_lm(ref))

    flush = pd.DataFrame(
        {"doc_id": [9999], "ts": [base + dt.timedelta(days=2)], "text": ["a b"]}
    )
    batches = [pdf.iloc[:120], pdf.iloc[120:], flush]
    tmp = tempfile.mkdtemp(prefix="flox_ppl_stream_")
    try:
        for i, b in enumerate(batches):
            spark.createDataFrame(b).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
            time.sleep(1.1)
        schema = spark.read.parquet(f"{tmp}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = doc_perplexity_stream(
            stream, model, time_col="ts", window="1 hour", watermark="0 seconds"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("flox_ppl_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["ppl"])
            for r in spark.sql("SELECT * FROM flox_ppl_stream").collect()
            if r["doc_id"] != 9999
        }
        exp = {
            r["doc_id"]: (r["n_bigrams"], r["ppl"])
            for r in doc_perplexity(
                spark.createDataFrame(pdf[["doc_id", "text"]]), model=model
            ).collect()
            if r["ppl"] is not None  # no-bigram docs can't appear on a stream
        }
        assert set(got) == set(exp)
        for i, (n_b, ppl) in exp.items():
            assert got[i][0] == n_b, i
            assert got[i][1] == pytest.approx(ppl, rel=1e-12), i
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
