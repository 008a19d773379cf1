"""Randomized invariants for the round-5 operators: upsampling grid
laws, value_counts mass conservation, minhash formula bounds, and
perplexity bounds — the repo's property-test strategy (SURVEY §5)
applied to the new surface."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_upsample_grid_invariants(spark, seed):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    n = 120
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n),
            "ts": [
                base + dt.timedelta(minutes=int(m))
                for m in rng.integers(0, 5000, n)
            ],
            "v": rng.normal(size=n),
        }
    )
    from flox_spark import resample_upsample, time_bucket

    out = resample_upsample(
        spark.createDataFrame(pdf), "k", time_col="ts", value="v",
        freq="1h", method="ffill",
    ).collect()
    by_k: dict = {}
    for r in out:
        by_k.setdefault(r["k"], []).append((r["ts"], r["v"]))
    for k, grp in pdf.groupby("k"):
        rows = sorted(by_k[k.item() if hasattr(k, "item") else k])
        ts = [t for t, _ in rows]
        # 1. grid is REGULAR: consecutive timestamps exactly 1h apart
        for a, b in zip(ts, ts[1:]):
            assert (b - a) == dt.timedelta(hours=1)
        # 2. bounds = floor(min obs) .. floor(max obs)
        floor = lambda t: t.replace(minute=0, second=0, microsecond=0)
        assert ts[0] == floor(grp.ts.min()) and ts[-1] == floor(grp.ts.max())
        # 3. every carried value IS one of the group's observed values
        observed = set(grp.v)
        assert {v for _, v in rows if v is not None} <= observed
        # 4. no NULLs after the first bucket (ffill from a present obs)
        assert all(v is not None for _, v in rows)


@pytest.mark.parametrize("seed", [0, 1])
def test_value_counts_mass_conservation(spark, seed):
    rng = np.random.default_rng(seed)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n),
            "v": rng.choice(list("abcdef"), n),
        }
    )
    from flox_spark import groupby_value_counts

    df = spark.createDataFrame(pdf)
    counts = groupby_value_counts(df, "k", value="v").collect()
    sums: dict = {}
    for r in counts:
        sums[r["k"]] = sums.get(r["k"], 0) + r["count"]
    assert sums == pdf.groupby("k").size().to_dict()
    props = groupby_value_counts(df, "k", value="v", normalize=True).collect()
    psums: dict = {}
    for r in props:
        psums[r["k"]] = psums.get(r["k"], 0.0) + r["count"]
    for k, p in psums.items():
        assert p == pytest.approx(1.0, rel=1e-12), k


def test_minhash_values_bounded_and_permutation_consistent(spark):
    # every signature slot is in [0, P); seed 0's value is h1-only
    # (mh0 = min h1 % P), and signatures of identical docs coincide
    from flox_spark.operators.dedup import MINHASH_P, minhash_signatures

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["x y z w", "x y z w", "completely different words here"],
        }
    )
    for impl in ("md5", "xxhash64"):
        rows = {
            r["doc_id"]: [r[f"mh{i}"] for i in range(8)]
            for r in minhash_signatures(
                spark.createDataFrame(pdf), num_hashes=8, hash_impl=impl
            ).collect()
        }
        for vals in rows.values():
            assert all(0 <= v < MINHASH_P for v in vals), impl
        assert rows[0] == rows[1], impl
        assert rows[0] != rows[2], impl


@pytest.mark.parametrize("seed", [0, 1])
def test_perplexity_bounds(spark, seed):
    # add-1-smoothed bigram perplexity is bounded by the vocabulary
    # size: 1 <= ppl <= (max_c1 + V) for any doc (each factor's
    # probability is at least k/(c1_max + kV) and at most 1)
    rng = np.random.default_rng(seed)
    words = [f"t{i}" for i in range(12)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(rng.choice(words, rng.integers(2, 9))) for _ in range(30)
            ],
        }
    )
    from flox_spark.operators import doc_perplexity

    rows = doc_perplexity(spark.createDataFrame(pdf)).collect()
    V = len(set(w for t in pdf.text for w in t.split()))
    n_bg_total = sum(max(len(t.split()) - 1, 0) for t in pdf.text)
    for r in rows:
        if r["ppl"] is None:
            continue
        assert 1.0 <= r["ppl"] <= n_bg_total + V + 1, r
