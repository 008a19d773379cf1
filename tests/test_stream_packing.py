"""Streaming sequence packing: invariants across micro-batches and
the single-batch == batch-operator equivalence."""

import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from flox_spark.streaming import stream_pack_sequences


def _run(spark, tmp, batches, qname, **kw):
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        time.sleep(1.1)
    schema = spark.read.parquet(f"{tmp}/in/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/*")
    )
    out = stream_pack_sequences(stream, "n_tokens", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {qname}").collect()


def _check_invariants(rows, pdfs, budget):
    # every input row assigned exactly once
    want = sorted(d for pdf in pdfs for d in pdf["doc_id"])
    got = sorted(r["doc_id"] for r in rows)
    assert got == want
    toks = {d: t for pdf in pdfs for d, t in zip(pdf["doc_id"], pdf["n_tokens"])}
    loads: dict = {}
    for r in rows:
        # oversize == (tokens > budget), and oversize bins are singleton
        assert r["oversize"] == (toks[r["doc_id"]] > budget), r
        loads.setdefault(r["bin_id"], []).append(
            (toks[r["doc_id"]], r["oversize"])
        )
    for b, members in loads.items():
        if any(o for _, o in members):
            assert len(members) == 1, f"oversize bin {b} not singleton"
        else:
            # capacity holds ACROSS micro-batches (the state carry)
            assert sum(t for t, _ in members) <= budget, (b, members)


def test_bins_carry_capacity_across_batches(spark):
    tmp = tempfile.mkdtemp(prefix="flox_spack_")
    try:
        # batch 0 leaves bin 0 with 40/100 free; batch 1's 30-token doc
        # must land in it, its 50-token doc must open a new bin
        f0 = pd.DataFrame({"doc_id": [0, 1], "n_tokens": [60, 90]})
        f1 = pd.DataFrame({"doc_id": [2, 3], "n_tokens": [30, 50]})
        rows = _run(spark, tmp, [f0, f1], "flox_spk1", budget=100)
        _check_invariants(rows, [f0, f1], 100)
        bins = {r["doc_id"]: r["bin_id"] for r in rows}
        assert bins[2] == bins[0]  # rode the carried residual
        assert bins[3] not in (bins[0], bins[1])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_invariants_random_stream_with_oversize_and_shards(spark):
    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp(prefix="flox_spack_")
    try:
        batches = [
            pd.DataFrame(
                {
                    "doc_id": range(i * 40, i * 40 + 40),
                    "n_tokens": rng.integers(1, 160, 40),  # some > budget
                }
            )
            for i in range(3)
        ]
        rows = _run(
            spark, tmp, batches, "flox_spk2",
            budget=128, id_col="doc_id", n_shards=4,
        )
        _check_invariants(rows, batches, 128)
        # shard isolation: bin ids never collide across shards
        from flox_spark.streaming.packing import _SHARD_STRIDE

        shards = {r["bin_id"] // _SHARD_STRIDE for r in rows}
        assert shards <= {0, 1, 2, 3} and len(shards) > 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_single_batch_matches_batch_operator(spark):
    # a stream replayed as ONE micro-batch with one shard packs
    # identically to the batch operator on one partition
    from flox_spark.operators import pack_sequences

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"doc_id": range(60), "n_tokens": rng.integers(1, 90, 60)})
    tmp = tempfile.mkdtemp(prefix="flox_spack_")
    try:
        rows = _run(spark, tmp, [pdf], "flox_spk3", budget=64)
        got = {r["doc_id"]: (r["bin_id"] % (1 << 40), r["oversize"]) for r in rows}
        brows = pack_sequences(
            spark.createDataFrame(pdf).coalesce(1), "n_tokens", budget=64
        ).collect()
        want = {r["doc_id"]: (r["bin_id"] % (1 << 40), r["oversize"]) for r in brows}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_open_bin_cap_retires_fullest(spark):
    # max_open_bins=2: after a batch that opens 3 bins, only the two
    # with the LARGEST residuals stay; a later doc exactly fitting a
    # retired bin's residual must open a new bin instead
    tmp = tempfile.mkdtemp(prefix="flox_spack_")
    try:
        # budget 100: docs 95, 60, 55 -> three bins, residuals 5, 40, 45
        f0 = pd.DataFrame({"doc_id": [0, 1, 2], "n_tokens": [95, 60, 55]})
        # 5 fits ONLY the retired bin (residual 5) -> must open bin 3
        f1 = pd.DataFrame({"doc_id": [3], "n_tokens": [5]})
        rows = _run(spark, tmp, [f0, f1], "flox_spk4", budget=100, max_open_bins=2)
        _check_invariants(rows, [f0, f1], 100)
        bins = {r["doc_id"]: r["bin_id"] for r in rows}
        assert bins[3] != bins[0]
        # it rode one of the surviving bins (40 or 45 free), not a new one
        assert bins[3] in (bins[1], bins[2])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "n_tokens": [3]}))
    with pytest.raises(ValueError, match="budget"):
        stream_pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="token"):
        stream_pack_sequences(df, token_col="missing")
    with pytest.raises(ValueError, match="id_col"):
        stream_pack_sequences(df, n_shards=4)
    with pytest.raises(ValueError, match="max_open_bins"):
        stream_pack_sequences(df, max_open_bins=0)


def test_state_survives_query_restart(spark):
    # the production guarantee: a NEW query started on the SAME
    # checkpoint resumes the open-bin state — batch 1 arrives after a
    # full stop/start and must still ride batch 0's residual capacity
    tmp = tempfile.mkdtemp(prefix="flox_spack_")
    try:
        schema = "doc_id bigint, n_tokens bigint"

        def start():
            # file sink, not memory: only durable sinks support
            # restarting from a checkpoint
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/in/*")
            )
            out = stream_pack_sequences(stream, "n_tokens", budget=100)
            return (
                out.writeStream.format("parquet")
                .option("path", f"{tmp}/out")
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )

        f0 = pd.DataFrame({"doc_id": [0, 1], "n_tokens": [60, 90]})
        spark.createDataFrame(f0).coalesce(1).write.parquet(f"{tmp}/in/f0")
        q = start()
        q.awaitTermination(120)
        first = {r["doc_id"]: r["bin_id"]
                 for r in spark.read.parquet(f"{tmp}/out").collect()}

        # full stop, new files, new query on the same checkpoint
        f1 = pd.DataFrame({"doc_id": [2, 3], "n_tokens": [30, 50]})
        spark.createDataFrame(f1).coalesce(1).write.parquet(f"{tmp}/in/f1")
        q2 = start()
        q2.awaitTermination(120)
        second = {r["doc_id"]: r["bin_id"]
                  for r in spark.read.parquet(f"{tmp}/out").collect()
                  if r["doc_id"] in (2, 3)}

        # doc 2 (30 tokens) rides doc 0's bin (40 free after restart);
        # doc 3 (50) opens a fresh bin with an id the counter never
        # reused across the restart
        assert second[2] == first[0]
        assert second[3] not in (first[0], first[1])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
