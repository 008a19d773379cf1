"""Scale evidence for SCALE.md: measures how plans behave when data
grows, on synthetic frames built with spark.range (testdata untouched).

1. Giant-group scan crossover: one group of N rows — plain
   ``groupby_scan`` serializes the WindowExec on a single task;
   ``groupby_scan_blocked`` splits into order blocks.  Sweeps N to
   find where blocking starts winning, plus a many-groups control
   where plain should win.
2. Reduction scaling: headline reductions on lineitem-shaped synthetic
   frames at 600k vs 6M rows (the sf0.1 -> sf1 step): wall-time ratio
   vs the 10x data ratio shows how much of the sf0.1 cost is fixed
   overhead vs data-proportional work.

Usage: python tools/bench_scale.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flox_spark import groupby_reduce, groupby_scan
from flox_spark.scan_blocked import groupby_scan_blocked
from flox_spark.session import get_spark


def force(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def synth_events(spark, n_rows: int, n_groups: int):
    """Deterministic event-shaped frame: integer-LCG pseudo-random
    values, contiguous order column."""
    return (
        spark.range(n_rows)
        .withColumn("k", (F.col("id") % n_groups).cast("long"))
        .withColumn("ord", F.col("id"))
        .withColumn("v", ((F.col("id") * 1103515245 + 12345) % 1000000).cast("double") / 1000.0)
    )


def scan_crossover(spark, quick: bool) -> dict:
    sizes = [1_000_000, 4_000_000] if quick else [1_000_000, 4_000_000, 16_000_000]
    out = {}
    for n in sizes:
        df = synth_events(spark, n, 1)  # ONE giant group
        plain = min(force(groupby_scan(df, "k", func="nancumsum", value="v", order_by="ord")) for _ in range(2))
        blocked = min(force(
            groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="ord", num_blocks=32)
        ) for _ in range(2))
        out[f"giant_group_n{n}"] = {"plain_window_s": plain, "blocked_s": blocked}
    # control: many groups — plain's per-group parallelism suffices
    df = synth_events(spark, sizes[-1], 10_000)
    out["many_groups_control"] = {
        "plain_window_s": min(force(groupby_scan(df, "k", func="nancumsum", value="v", order_by="ord")) for _ in range(2)),
        "blocked_s": min(force(
            groupby_scan_blocked(df, "k", func="nancumsum", value="v", order_by="ord", num_blocks=32)
        ) for _ in range(2)),
    }
    return out


def reduction_scaling(spark, quick: bool) -> dict:
    cases = {
        "sum_fewgroups": lambda d: groupby_reduce(d, "k", func="nansum", value="v"),
        "mean_fewgroups": lambda d: groupby_reduce(d, "k", func="nanmean", value="v"),
        "quantile_p90": lambda d: groupby_reduce(
            d, "k", func="nanquantile", value="v", finalize_kwargs={"q": 0.9}
        ),
        "highcard_sum": lambda d: groupby_reduce(d, "hk", func="nansum", value="v"),
    }
    small_n, big_n = (600_000, 6_000_000)
    out = {}
    for label, n in (("600k", small_n), ("6M", big_n)):
        df = (
            synth_events(spark, n, 6)
            .withColumn("hk", (F.col("id") % 20_000).cast("long"))
        )
        for cname, fn in cases.items():
            out.setdefault(cname, {})[label] = min(force(fn(df)) for _ in range(2))
    for cname, d in out.items():
        d["wall_ratio_for_10x_data"] = round(d["6M"] / d["600k"], 2) if d["600k"] > 0 else None
    return out


def kmeans_scaling(spark, quick: bool) -> dict:
    """Lloyd-loop wall time vs point count: the zero-shuffle fold
    assignment means per-iteration cost should track the scan, not a
    data-sized exchange."""
    from flox_spark.operators.kmeans import kmeans_fit

    def synth_vecs(n: int):
        dim = 16
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: ((F.col("id") * 1103515245 + i * 12345) % 1000).cast("double") / 100.0,
            ).alias("embedding"),
        )

    sizes = [100_000] if quick else [100_000, 1_000_000]
    out = {}
    for n in sizes:
        df = synth_vecs(n)
        t0 = time.perf_counter()
        kmeans_fit(df, k=16, max_iter=3).collect()
        out[f"{n}_pts_k16_iter3"] = round(time.perf_counter() - t0, 3)
    if len(sizes) == 2:
        out["wall_ratio_for_10x_data"] = round(
            out["1000000_pts_k16_iter3"] / out["100000_pts_k16_iter3"], 2
        )
    return out


def synth_docs(spark, n: int):
    """Deterministic word-soup documents (~40 words each) built from
    spark.range — no testdata dependency, scales to any n."""
    word = lambda j: F.concat(
        F.lit("w"), ((F.col("id") * (1103515245 + j) + 12345 * j) % 500).cast("string")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(40)]).alias("text"),
    )


def quantile_arrow_zone(spark, quick: bool) -> dict:
    """The r11 arrow-vs-agg exact-quantile comparison at the top of
    the stats-auto small zone (~40 MB parquet, the largest input the
    zone admits): the np.quantile grouped-agg kernel vs the JVM
    percentile ObjectHashAggregate vs refine, identical results."""
    import os
    import tempfile

    from flox_spark import groupby_reduce, set_options

    n = 1_000_000 if quick else 5_000_000
    path = os.path.join(tempfile.gettempdir(), f"flox_qzone_{n}.parquet")
    if not os.path.exists(path):
        spark.range(n).select(
            (F.col("id") % 8).cast("string").alias("k"),
            (F.rand(7) * 1000).alias("v"),
        ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    from flox_spark.plans.util import estimate_size_bytes

    out: dict = {"rows": n, "stats_bytes": estimate_size_bytes(df)}
    for s in ("agg", "arrow", "refine"):
        with set_options(quantile_impl=s):
            q = groupby_reduce(
                df, "k", func="quantile", value="v", alias="p",
                finalize_kwargs={"q": 0.9},
            )
            force(q)
            out[s] = {"wall_s": min(force(q) for _ in range(3))}
    return out


def spans_scaling(spark, quick: bool) -> dict:
    """100x-data wall ratios for the r11 span-dedup family.  The
    synthetic word-soup docs (500-word vocab, 40 words/doc) collide
    heavily at k=8, so the gram aggregate and mark-back join both
    carry real volume.  At the big point the >32 MB estimated input
    leaves the small-path gate and the groupBy + AQE-skew-splittable
    join shape (the 100 TB plan) runs — the ratio column is the
    linearity evidence, and big_path confirms which branch executed."""
    from flox_spark.operators import duplicate_spans, duplicate_spans_against

    # both points sit ABOVE the 32 MB small-path gate (~200k docs
    # estimate ~50 MB), so the ratio compares the SAME plan — the
    # groupBy + AQE-skew-splittable join shape that runs at 100 TB
    small_n, big_n = (200_000, 2_000_000) if quick else (200_000, 6_000_000)
    out: dict = {}
    small, big = synth_docs(spark, small_n), synth_docs(spark, big_n)
    for name, fn in {
        "dup_spans": lambda d: duplicate_spans(d, k=8),
        "dup_spans_against": lambda d: duplicate_spans_against(
            d.filter(F.col("doc_id") % 2 == 1),
            d.filter(F.col("doc_id") % 2 == 0),
            k=8,
        ),
    }.items():
        t_small = force(fn(small))
        t_big = force(fn(big))
        out[name] = {
            "small_n": small_n,
            "big_n": big_n,
            "t_small_s": t_small,
            "t_big_s": t_big,
            "ratio": round(t_big / max(t_small, 1e-9), 2),
            "data_ratio": round(big_n / small_n, 1),
        }
        if name == "dup_spans":
            # only dup_spans HAS a small/window branch; its small path
            # is join-free (pure windows), so a Join node in the big
            # plan proves the scale branch ran.  _spans_against always
            # semi-joins — the flag would be vacuously true there.
            plan = fn(big)._jdf.queryExecution().executedPlan().toString()
            out[name]["big_path_join"] = "Join" in plan
    return out


def corpus_scaling(spark, quick: bool) -> dict:
    """10x-data wall ratios for the corpus operators: all are
    single-pass explode+aggregate (or window) plans, so the ratio
    should stay well under 10 at these sizes (fixed overhead) and
    approach ~10 only when data-proportional work dominates."""
    from flox_spark.operators import (
        dedup_against,
        dedup_lines,
        minhash_against,
        ngram_counts,
        tfidf_top_terms,
    )

    small_n, big_n = (20_000, 200_000) if quick else (60_000, 600_000)
    cases = {
        "tfidf_top_terms": lambda d: tfidf_top_terms(d, k=2),
        "ngram_counts": lambda d: ngram_counts(d, n=3, top=50),
        "dedup_lines_words": lambda d: dedup_lines(
            d, sep_re="\\s+", joiner=" ", min_chars=2
        ),
        "dedup_against_selfhalf": lambda d: dedup_against(
            d.filter(F.col("doc_id") % 2 == 1), d.filter(F.col("doc_id") % 2 == 0)
        ),
        "minhash_against_selfhalf": lambda d: minhash_against(
            d.filter(F.col("doc_id") % 2 == 1), d.filter(F.col("doc_id") % 2 == 0)
        ),
    }
    out = {}
    for name, fn in cases.items():
        t_small = min(force(fn(synth_docs(spark, small_n))) for _ in range(2))
        t_big = min(force(fn(synth_docs(spark, big_n))) for _ in range(2))
        out[name] = {
            "small_s": t_small,
            "big_s": t_big,
            "wall_ratio_for_10x_data": round(t_big / max(t_small, 1e-9), 2),
        }
    return out


def r5_scaling(spark, quick: bool) -> dict:
    """10x-data wall ratios for the round-5 reworked operators
    (universal-hash minhash banding, single-fold simhash, declarative
    media features) — all zero-exchange projections (plus the banding
    explode), so the ratio should approach data-proportional ~10 only
    as fixed overhead amortizes."""
    from flox_spark.operators.dedup import simhash_signatures
    from flox_spark.operators.multimodal import media_features
    from flox_spark.streaming import minhash_band_keys

    small_n, big_n = (20_000, 200_000) if quick else (60_000, 600_000)

    def media(d):
        return d.select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "utf-8").alias("content"),
        )

    cases = {
        "minhash_bands_xx": lambda d: minhash_band_keys(d),
        "minhash_bands_md5": lambda d: minhash_band_keys(d, hash_impl="md5"),
        "simhash_xx": lambda d: simhash_signatures(d),
        "simhash_md5": lambda d: simhash_signatures(d, hash_impl="md5"),
        "media_features": lambda d: media_features(media(d)),
    }
    out = {}
    for name, fn in cases.items():
        t_small = min(force(fn(synth_docs(spark, small_n))) for _ in range(2))
        t_big = min(force(fn(synth_docs(spark, big_n))) for _ in range(2))
        out[name] = {
            "small_s": t_small,
            "big_s": t_big,
            "wall_ratio_for_10x_data": round(t_big / max(t_small, 1e-9), 2),
        }
    return out


def r5b_scaling(spark, quick: bool) -> dict:
    """10x-data wall ratios for the round-5 second-wave operators:
    perplexity (two vocab-sized count joins + per-doc mean), semdedup
    (k-means cells + in-cell cosine — cost is sum of cell^2, so the
    ratio approaches 100x only if cells grow linearly; k should scale
    with data), fuzzy_join (char-gram banding + thresholded
    levenshtein)."""
    import numpy as np

    from flox_spark.operators import fuzzy_join
    from flox_spark.operators.lm import doc_perplexity
    from flox_spark.operators.similarity import semantic_dedup_pairs

    small_n, big_n = (20_000, 200_000) if quick else (60_000, 600_000)

    def synth_vecs(n, dim=16):
        comp = [
            ((F.col("id") * (2654435761 + 97 * j) + 12345 * j) % 1000 / 500.0 - 1.0)
            .cast("float")
            for j in range(dim)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        )

    out = {}
    for name, build in {
        "perplexity_self": lambda n: doc_perplexity(synth_docs(spark, n)),
        # k scales LINEARLY with n so cells stay ~constant-sized
        # (in-cell cost is quadratic in cell size — the documented
        # SemDeDup posture: more data means more cells, not bigger
        # ones)
        "semdedup_pairs": lambda n: semantic_dedup_pairs(
            synth_vecs(n), k=max(4, n // 250), threshold=0.95,
            dim=16, max_iter=0,
        ),
        # entity-resolution shape: SHORT name-like strings (40-char
        # prefixes).  The full word-soup text is a pathological case
        # for char-2-gram banding (a ~12-char alphabet makes most
        # signatures collide) — real names are diverse; prefixes are.
        "fuzzy_join_halves": lambda n: fuzzy_join(
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            "doc_id", "nm", "doc_id", "nm", max_dist=3,
            bands=8, shingle_k=2, max_bucket=200,
        ).select(F.col("edit_dist")),
    }.items():
        t_small = min(force(build(small_n)) for _ in range(2))
        t_big = min(force(build(big_n)) for _ in range(2))
        out[name] = {
            "small_s": t_small,
            "big_s": t_big,
            "wall_ratio_for_10x_data": round(t_big / max(t_small, 1e-9), 2),
        }
    return out


def r6big_scaling(spark, only: str | None = None) -> dict:
    """100x points (60k -> 6M docs, single-shot) for the round-5
    second-wave operators — verdict r5 item 7.  Same builders as
    ``r5b_scaling``; semdedup keeps the linear-k protocol (k grows
    with n so cells stay constant-sized and in-cell quadratic cost
    stays bounded)."""
    from flox_spark.operators import fuzzy_join
    from flox_spark.operators.lm import doc_perplexity
    from flox_spark.operators.similarity import semantic_dedup_pairs

    def synth_vecs(n, dim=16):
        comp = [
            ((F.col("id") * (2654435761 + 97 * j) + 12345 * j) % 1000 / 500.0 - 1.0)
            .cast("float")
            for j in range(dim)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        )

    builders = {
        "perplexity_self": lambda n: doc_perplexity(synth_docs(spark, n)),
        "semdedup_pairs": lambda n: semantic_dedup_pairs(
            synth_vecs(n), k=max(4, n // 250), threshold=0.95,
            dim=16, max_iter=0,
        ),
        "fuzzy_join_halves": lambda n: fuzzy_join(
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            "doc_id", "nm", "doc_id", "nm", max_dist=3,
            bands=8, shingle_k=2, max_bucket=200,
        ).select(F.col("edit_dist")),
    }
    out = {}
    for name, build in builders.items():
        if only is not None and name != only:
            continue
        t_small = force(build(60_000))
        t_big = force(build(6_000_000))
        out[name] = {
            "60k_s": t_small,
            "6M_s": t_big,
            "wall_ratio_for_100x_data": round(t_big / max(t_small, 1e-9), 2),
        }
    return out


def r6_quantizer(spark, quick: bool) -> dict:
    """Flat vs two-level assignment at large k (round-6 item): at
    k=4096 the flat fold is O(k*dim) per row and pins assignment CPU;
    the coarse-then-fine quantizer is O(2*sqrt(k)*dim).  Also reports
    the flat/two-level agreement fraction (approximation cost)."""
    from flox_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_two_level,
    )

    dim = 16
    n = 50_000 if quick else 100_000
    comp = [
        ((F.col("id") * (2654435761 + 97 * j) + 12345 * j) % 1000 / 500.0 - 1.0)
        .cast("float")
        for j in range(dim)
    ]
    base = spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
    )
    out = {}
    for k in ([1024] if quick else [1024, 4096]):
        ccomp = [
            (((F.col("id") + 7) * (40503 + 131 * j) + 777 * j) % 1000 / 500.0 - 1.0)
            .cast("double")
            for j in range(dim)
        ]
        cents = spark.range(k).select(
            F.col("id").cast("int").alias("__cid"), F.array(*ccomp).alias("centroid")
        )
        t_flat = min(force(assign_clusters(base, cents)) for _ in range(2))
        t_two = min(
            force(assign_clusters_two_level(base, cents)) for _ in range(2)
        )
        a = assign_clusters(base, cents, out="c_flat")
        b = assign_clusters_two_level(base, cents, out="c_two")
        agree = (
            a.join(b, "vec_id")
            .select(F.avg((F.col("c_flat") == F.col("c_two")).cast("double")).alias("agree"))
            .collect()[0]["agree"]
        )
        out[f"k{k}"] = {
            "flat_s": t_flat,
            "two_level_s": t_two,
            "speedup": round(t_flat / max(t_two, 1e-9), 2),
            "agreement": round(float(agree), 4),
        }
    return out


def r6_100x(spark) -> dict:
    """100x (60k -> 6M docs) wall points for the round-5 second wave
    (round-6 item 7): perplexity, fuzzy_join, semdedup with the
    linear-k protocol (k scales with n so cells stay constant-sized;
    past k=1024 the two-level quantizer engages automatically)."""
    from flox_spark.operators import fuzzy_join
    from flox_spark.operators.lm import doc_perplexity
    from flox_spark.operators.similarity import semantic_dedup_pairs

    def synth_vecs(n, dim=16):
        comp = [
            ((F.col("id") * (2654435761 + 97 * j) + 12345 * j) % 1000 / 500.0 - 1.0)
            .cast("float")
            for j in range(dim)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        )

    small_n, big_n = 60_000, 6_000_000
    builds = {
        "perplexity_self": lambda n: doc_perplexity(synth_docs(spark, n)),
        "semdedup_pairs": lambda n: semantic_dedup_pairs(
            synth_vecs(n), k=max(4, n // 250), threshold=0.95, dim=16, max_iter=0,
        ),
        "fuzzy_join_halves": lambda n: fuzzy_join(
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            synth_docs(spark, n).filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", F.substring("text", 1, 40).alias("nm")),
            "doc_id", "nm", "doc_id", "nm", max_dist=3,
            bands=8, shingle_k=2, max_bucket=200,
        ).select(F.col("edit_dist")),
    }
    out = {}
    for name, build in builds.items():
        t_small = force(build(small_n))
        t_big = force(build(big_n))
        out[name] = {
            "60k_s": t_small,
            "6M_s": t_big,
            "wall_ratio_for_100x_data": round(t_big / max(t_small, 1e-9), 2),
        }
    return out


def r9_dim768(spark, quick: bool) -> dict:
    """The interpreted-HOF boundary at PRODUCTION dim (768): the r8
    A/B evidence for the fold/numpy split was dim-16; embeddings in
    the wild are 384-4096, so this is the load-bearing regime.  Two
    kernels:

    - pair verify (embedding_near_duplicates): expr fold vs the
      Arrow einsum pass over a duplicate-rich corpus (every vector
      appears twice, so LSH emits ~n/2 guaranteed candidate pairs).
    - cluster assignment: the declarative packed-centroid fold vs
      assign_clusters_numpy at k=64.

    Fold points are kept SMALL on purpose — the fold is
    O(rows*k*dim) at ~0.3 us/element interpreted, so even 10k rows x
    k=64 x dim=768 is ~2 minutes; numpy runs the same work at memory
    bandwidth.  Crossover = where fold wall exceeds the numpy fixed
    cost (~1-2 s)."""
    import math

    from flox_spark.operators.kmeans import assign_clusters_numpy, _packed_centroids, _nearest_cid
    from flox_spark.operators.similarity import (
        cosine_topk,
        embedding_near_duplicates,
        lsh_signature_bits,
    )

    DIM = 768

    def synth_vecs(n, families=None):
        # families=F: n rows over F distinct vectors -> the LSH emits
        # ~F * (n/F choose 2) guaranteed candidate pairs, so the pair
        # VERIFY volume is controlled exactly
        base = F.col("id") % families if families else F.col("id")
        comp = [
            ((base * (2654435761 + 97 * j) + 12345 * j) % 1000 / 500.0 - 1.0)
            .cast("float")
            for j in range(DIM)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*comp).alias("embedding")
        )

    out = {}
    # --- pair verify ---
    # planes=16, bands=2: 8-bit band keys (256 buckets/band).  The
    # stock planes=16/bands=4 gives 4-bit keys — fine for the 64-dim
    # corpus, but these synthetic vectors collide into ~1.3M
    # candidate pairs at n=2000, which measures the pair EXPANSION,
    # not the verify kernel.  ~n^2/128 candidates keeps the verify
    # stage the dominant term on both kernels.
    for n in ([2_000] if quick else [2_000, 4_000]):
        df = synth_vecs(n, families=20).localCheckpoint()
        kw = dict(threshold=0.98, dim=DIM, planes=16, bands=2)
        row = {}
        for mode in ("numpy", "expr"):
            t = min(
                force(embedding_near_duplicates(df, verify=mode, **kw))
                for _ in range(2)
            )
            row[f"{mode}_s"] = t
        row["pairs"] = embedding_near_duplicates(df, verify="numpy", **kw).count()
        out[f"verify_n{n}"] = row
    # --- assignment ---
    cents_rows = [
        (
            j,
            [
                math.sin(0.7 * j + 0.01 * d) for d in range(DIM)
            ],
        )
        for j in range(64)
    ]
    cents = spark.createDataFrame(cents_rows, "__cid int, centroid array<double>")
    # --- LSH signatures (touch EVERY row: the dominant 100 TB term) ---
    nsig = 20_000
    dfs = synth_vecs(nsig).localCheckpoint()
    sig_fold = force(lsh_signature_bits(dfs, dim=DIM, kernel="expr"))  # ~24 s, 1 rep
    sig_np = min(
        force(lsh_signature_bits(dfs, dim=DIM, kernel="numpy")) for _ in range(2)
    )
    out[f"signatures_n{nsig}"] = {"fold_s": sig_fold, "numpy_s": sig_np}
    # --- brute-force top-k ---
    qn = 8 if quick else 64
    qdf = dfs.filter(F.col("vec_id") < qn).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).localCheckpoint()
    bt_fold = force(cosine_topk(dfs, qdf, k=10, dim=DIM, kernel="expr"))
    bt_np = min(
        force(cosine_topk(dfs, qdf, k=10, dim=DIM, kernel="numpy")) for _ in range(2)
    )
    out[f"brute_topk_n{nsig}_q{qn}"] = {"fold_s": bt_fold, "numpy_s": bt_np}
    # --- cluster assignment ---
    for n in ([1_000] if quick else [1_000, 4_000]):
        df = synth_vecs(n).localCheckpoint()
        # ONE rep: the fold at dim 768 x k=64 is ~15 s per 1k rows —
        # the point being demonstrated
        fold = force(
            df.crossJoin(_packed_centroids(cents))
            .withColumn("cluster", _nearest_cid("embedding"))
            .select("vec_id", "cluster")
        )
        np_t = min(
            force(
                assign_clusters_numpy(df, cents_rows).select("vec_id", "cluster")
            )
            for _ in range(2)
        )
        out[f"assign_n{n}_k64"] = {
            "fold_s": fold,
            "numpy_s": np_t,
            "elements": n * 64 * DIM,
        }
    return out


def _build_sf1(spark, src: str = "/root/testdata/sf0.1",
               dst: str = "/tmp/flox_sf1", copies: int = 10) -> str:
    """Synthesize an sf1-scale dataset (10x sf0.1) for the extras leg:
    documents/lineitem re-key their ids per copy, embeddings get FRESH
    deterministic vectors for copies > 0 (exact duplicates of every
    vector would inflate near-dup pair volume x100, not x10 — a
    quadratic contamination, not a scale point), and the remaining
    tables symlink to sf0.1 (none of the four flagged extras read
    them at volume).  Idempotent via a _DONE marker."""
    import os

    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    from flox_spark.sources import load_table

    cp = None

    def copies_of(df):
        nonlocal cp
        if cp is None:
            cp = [F.lit(i) for i in range(copies)]
        return df.withColumn("__copy", F.explode(F.array(*cp)))

    docs = copies_of(load_table(spark, src, "documents"))
    docs = docs.withColumn(
        "doc_id", F.col("doc_id").cast("long")
        + F.col("__copy").cast("long") * F.lit(1_000_000_000)
    ).drop("__copy")
    docs.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    li = copies_of(load_table(spark, src, "lineitem"))
    li = li.withColumn(
        "l_orderkey", F.col("l_orderkey").cast("long")
        + F.col("__copy").cast("long") * F.lit(1_000_000_000)
    ).drop("__copy")
    li.write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))

    emb = copies_of(load_table(spark, src, "embeddings"))
    fresh = F.transform(
        F.col("embedding"),
        lambda x, i: (
            (
                (F.col("vec_id") * F.lit(7919) + F.col("__copy") * F.lit(104729)
                 + i * F.lit(31)) % F.lit(997)
            ).cast("double")
            / F.lit(498.0)
            - F.lit(1.0)
        ),
    )
    emb = emb.select(
        (F.col("vec_id").cast("long")
         + F.col("__copy").cast("long") * F.lit(1_000_000_000)).alias("vec_id"),
        F.when(F.col("__copy") == 0, F.col("embedding"))
        .otherwise(fresh)
        .alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding", "__copy")],
    )
    emb.write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))

    for t in "region nation customer supplier part orders events".split():
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)
    open(marker, "w").write("ok")
    return dst


def extras_sf1(spark, runs: int = 2) -> dict:
    """The r9 VERDICT's flag-line question, answered with data: the
    four extras that oscillate around net 2x at sf0.1 (perplexity,
    perplexity_filter, semdedup_pairs, winsorize) re-measured at 10x
    data with the bench's own best-of-N protocol.  Per-job scheduling
    floors are fixed; data-proportional work is not — if the sf0.1
    flags measure the floor, net ratios must fall here.  Writes the
    result to /root/repo/SCALE_extras_sf1.json so bench.py surfaces it
    in the driver record."""
    import os

    import duckdb

    import __spark_entry__ as entrymod

    dst = _build_sf1(spark)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = ["perplexity", "perplexity_filter", "semdedup_pairs", "winsorize"]

    def spark_best(name, sf_dir):
        best = None
        for _ in range(runs):
            spark.catalog.clearCache()
            t = force(qs[name](spark, sf_dir))
            best = t if best is None else min(best, t)
        return best

    spark_best("sum", dst)  # warm footers + JVM paths
    # the per-job scheduling floor measured where data cost is nil
    floor = spark_best("sum", "/root/testdata/sf0.001")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(dst, f"{t}.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
    con.sql(oracles["sum"]).fetchall()  # warm

    out = {}
    for name in names:
        s = spark_best(name, dst)
        d = None
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            d = dt if d is None else min(d, dt)
        out[name] = {
            "spark_s": round(s, 3),
            "duckdb_s": round(d, 3),
            "ratio": round(s / d, 2),
            "net_ratio": round(max(s - floor, 0.0) / d, 2),
        }
    result = {
        "sf": 1.0,
        "protocol": f"best-of-{runs}; 10x sf0.1 synthesized (re-keyed ids, "
                    "fresh vectors for copies>0); floor from sf0.001 sum",
        "floor_s": round(floor, 3),
        "queries": out,
    }
    with open("/root/repo/SCALE_extras_sf1.json", "w") as f:
        json.dump(result, f, indent=1)
    return result


def streaming_state_scaling(spark, quick: bool) -> dict:
    """r9 VERDICT #7: the applyInPandasWithState operators carry
    O(keys)/O(buckets) state claims with no measured table.  Drive
    1M+ events over 100k keys (and 100k+ docs through the LSH bucket
    memory) in multiple availableNow micro-batches and record, per
    batch, what StreamingQueryProgress reports: input rows, batch
    latency, state rows, state memory."""
    import json as _json
    import os
    import shutil

    from flox_spark.streaming import stream_minhash_neardup, stream_sessionize

    base = "/tmp/flox_stream_scale"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    def pdict(p):
        if isinstance(p, dict):
            return p
        j = p.json() if callable(getattr(p, "json", None)) else p.json
        return _json.loads(j)

    def run(qdf, name):
        q = (
            qdf.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(base, f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = []
        for p in map(pdict, q.recentProgress):
            if not p.get("stateOperators") or p.get("numInputRows", 0) == 0:
                continue
            so = p["stateOperators"][0]
            batches.append(
                {
                    "input_rows": p["numInputRows"],
                    "batch_ms": p.get("batchDuration"),
                    "state_rows": so.get("numRowsTotal"),
                    "state_updated": so.get("numRowsUpdated"),
                    "state_mem_mb": round(
                        so.get("memoryUsedBytes", 0) / 1e6, 1
                    ),
                }
            )
        total_rows = sum(b["input_rows"] for b in batches)
        total_ms = sum(b["batch_ms"] or 0 for b in batches)
        return {
            "batches": batches,
            "total_input_rows": total_rows,
            "final_state_rows": batches[-1]["state_rows"] if batches else None,
            "max_state_mem_mb": max(
                (b["state_mem_mb"] for b in batches), default=None
            ),
            "rows_per_sec": round(total_rows / max(total_ms / 1000.0, 1e-9)),
        }

    out = {}
    # 1) sessionize: state is ONE (last_ts, sid) row per entity —
    # O(keys), must plateau at n_keys regardless of event volume
    n_events, n_keys, n_files = (
        (300_000, 30_000, 3) if quick else (1_200_000, 100_000, 6)
    )
    src = os.path.join(base, "events_src")
    per = n_events // n_files

    def ev(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000).cast("long") + F.col("id") / F.lit(1000.0)
            ).alias("ts"),
            ((F.col("id") * 1103515245 + 12345) % 1000).cast("double").alias(
                "value"
            ),
        )

    for i in range(n_files):
        ev(i * per, (i + 1) * per).coalesce(1).write.mode("append").parquet(src)
    sch = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out[f"sessionize_{n_events}ev_{n_keys}keys"] = run(
        stream_sessionize(stream, "user_id", ts="ts", gap_seconds=60.0), "sess"
    )

    # 1b) the ROLLUP route (r10 VERDICT #2): the same event stream
    # through the JVM session_window aggregation
    # (stream_session_stats) — rollup-shaped sessionization must not
    # pay the stateful Python operator's per-group worker cost, so
    # this leg records the throughput ratio between the two routes
    from flox_spark.streaming import stream_session_stats

    stream_roll = (
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src)
    )
    roll = run(
        stream_session_stats(
            stream_roll, "user_id", ts="ts", gap_seconds=60.0,
            watermark="10 minutes",
        ),
        "sessroll",
    )
    stateful = out[f"sessionize_{n_events}ev_{n_keys}keys"]
    roll["speedup_vs_stateful"] = (
        round(roll["rows_per_sec"] / stateful["rows_per_sec"], 2)
        if stateful.get("rows_per_sec")
        else None
    )
    out[f"session_stats_rollup_{n_events}ev_{n_keys}keys"] = roll

    # 2) LSH near-dup bucket memory: state is one (rep, n) row per
    # (band, bkey) bucket — O(distinct buckets), the family whose
    # growth is data-dependent
    n_docs, n_dfiles = (20_000, 2) if quick else (120_000, 4)
    dsrc = os.path.join(base, "docs_src")
    dper = n_docs // n_dfiles
    for i in range(n_dfiles):
        synth_docs(spark, n_docs).filter(
            (F.col("doc_id") >= i * dper) & (F.col("doc_id") < (i + 1) * dper)
        ).coalesce(1).write.mode("append").parquet(dsrc)
    dsch = spark.read.parquet(dsrc).schema
    dstream = (
        spark.readStream.schema(dsch).option("maxFilesPerTrigger", 1).parquet(dsrc)
    )
    out[f"minhash_neardup_{n_docs}docs"] = run(
        stream_minhash_neardup(dstream), "neardup"
    )
    return out


def decon_paths_sf1(spark, runs: int = 3) -> dict:
    """r12 leg: decontaminate's gated literal NOT-IN path vs the
    declarative anti-join at 10x data (the sf1 synth corpus still sits
    under the 32 MB gate, so BOTH paths are reachable there — the
    literal by default, the declarative by stripping plan stats with a
    localCheckpoint, exactly how the parity test forces it).  Records
    that the literal path's advantage persists at 10x and that the
    declarative web-scale shape is not pathological — the crossover
    the gate encodes is fixed-cost vs scan-count, not correctness."""
    from flox_spark.operators import decontaminate
    from flox_spark.operators.clean import contamination_report
    from flox_spark.sources import load_table

    dst = _build_sf1(spark)

    def run_path(declarative: bool):
        best = None
        for _ in range(runs):
            docs = load_table(spark, dst, "documents")
            bench = docs.filter(F.col("doc_id") % 50 == 0)
            if declarative:
                # the pre-r12 shape verbatim (same plan the stats-less
                # gate falls back to), against the same cold parquet —
                # NOT a localCheckpoint, which would pre-materialize
                # the scan and time only the tail
                hits = (
                    contamination_report(docs, bench, "doc_id", "text", 3)
                    .filter(F.col("n_shared") >= 5).select("doc_id")
                )
                out = docs.join(hits, "doc_id", "left_anti").select("doc_id")
            else:
                out = decontaminate(docs, bench, n=3, min_shared=5).select("doc_id")
            t = force(out)
            best = t if best is None else min(best, t)
        return round(best, 3)

    lit = run_path(False)
    dec = run_path(True)
    return {"rows": "10x sf0.1 documents", "literal_s": lit,
            "declarative_s": dec, "literal_speedup": round(dec / lit, 2)}


def main() -> None:
    quick = "--quick" in sys.argv
    if "--decon" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"decon_paths_sf1": decon_paths_sf1(spark)}, indent=2))
        return
    if "--streaming" in sys.argv:
        spark = get_spark("bench_scale")
        print(
            json.dumps(
                {"streaming_state": streaming_state_scaling(spark, quick)},
                indent=2,
            )
        )
        return
    if "--qarrow" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"quantile_arrow_zone": quantile_arrow_zone(spark, quick)}, indent=2))
        return
    if "--spans" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"spans_100x": spans_scaling(spark, quick)}, indent=2))
        return
    if "--extras-sf1" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"extras_sf1": extras_sf1(spark)}, indent=2))
        return
    if "--r9dim" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"r9_dim768": r9_dim768(spark, quick)}, indent=2))
        return
    if "--r5" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"r5": r5_scaling(spark, quick)}, indent=2))
        return
    if "--r6" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"r6_quantizer": r6_quantizer(spark, quick)}, indent=2))
        return
    if "--r6big" in sys.argv:
        only = None
        if "--case" in sys.argv:
            only = sys.argv[sys.argv.index("--case") + 1]
        spark = get_spark("bench_scale")
        print(json.dumps({"r6_100x": r6big_scaling(spark, only)}, indent=2))
        return
    if "--r5b" in sys.argv:
        spark = get_spark("bench_scale")
        print(json.dumps({"r5b": r5b_scaling(spark, quick)}, indent=2))
        return
    if "--r5big" in sys.argv:
        # 100x point: 60k -> 6M synthetic docs, single-shot
        from flox_spark.operators.dedup import simhash_signatures
        from flox_spark.streaming import minhash_band_keys

        spark = get_spark("bench_scale")
        out = {}
        for name, fn in {
            "minhash_bands_xx": lambda d: minhash_band_keys(d),
            "simhash_xx": lambda d: simhash_signatures(d),
        }.items():
            t_small = force(fn(synth_docs(spark, 60_000)))
            t_big = force(fn(synth_docs(spark, 6_000_000)))
            out[name] = {"60k_s": t_small, "6M_s": t_big,
                         "wall_ratio_for_100x_data": round(t_big / max(t_small, 1e-9), 2)}
        print(json.dumps({"r5_100x": out}, indent=2))
        return
    spark = get_spark("bench_scale")
    force(synth_events(spark, 10_000, 10).groupBy("k").count())  # warm
    result = {
        "scan_crossover": scan_crossover(spark, quick),
        "reduction_scaling": reduction_scaling(spark, quick),
        "kmeans_scaling": kmeans_scaling(spark, quick),
        "corpus_scaling": corpus_scaling(spark, quick),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
