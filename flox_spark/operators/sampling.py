"""Deterministic sampling for training-data pipelines.

Beyond the reference's surface (SURVEY §2.5); pipeline-operator suite
per the engine's north star (BASELINE.json).  All selection decisions
are pure functions of (row id, seed) via md5 — reproducible across
runs, engines, partitionings, and cluster sizes, unlike Spark's
``df.sample`` whose output depends on the physical partitioning.

Three shapes, by physical cost:

- ``sample_bernoulli`` — keep each row iff a 12-hex-digit prefix of
  ``md5(id || ':' || seed)`` falls under the fraction threshold.  A
  pure filter projection: ZERO shuffles, runs inside whole-stage
  codegen, pushes through scans — the 100 TB default.
- ``split_train_test`` — same hash, but labels rows instead of
  dropping them; the split is a deterministic partition of the id
  space (disjoint, exhaustive).
- ``sample_exact_per_group`` — exactly ``min(n, |group|)`` rows per
  group, the hash ordering making it a uniform reproducible draw.
  One shuffle + rank filter; Spark 3.5+ rewrites the rank<=n filter
  into ``WindowGroupLimit`` (partial per-partition top-k BEFORE the
  exchange), so the shuffle carries at most ``n * P`` rows per group,
  not the whole group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "leakage_safe_split",
    "sample_bernoulli",
    "sample_exact_global",
    "sample_exact_per_group",
    "sample_mixture",
    "sample_stratified",
    "sample_to_token_budget",
    "sample_weighted_per_group",
    "split_by_group",
    "split_train_test",
]

_HEX_DIGITS = 12  # 16^12 buckets: fraction resolution ~3.6e-16


def _hash_key(id_col: Column, seed: str) -> Column:
    return F.md5(F.concat(id_col.cast("string"), F.lit(":" + seed)))


def _threshold(fraction: float) -> str:
    """Hex threshold for ``key < thresh`` keep decisions.  Clamped:
    fraction >= 1.0 returns the 'g' sentinel (lexicographically above
    every hex key -> always keep); an unclamped 1.0 would format to 13
    hex chars ('1000…') which sorts BELOW ~94% of 12-char keys and
    silently keeps only ~6% of rows.  fraction <= 0.0 returns '' (no
    key < '' -> keep none)."""
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return ""
    n = min(int(fraction * 16**_HEX_DIGITS), 16**_HEX_DIGITS - 1)
    return format(n, f"0{_HEX_DIGITS}x")


def sample_bernoulli(
    df: DataFrame, id_col: str, fraction: float, seed: str = "0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by id hash.
    Shuffle-free; selection is stable under repartitioning."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    key = F.substring(_hash_key(F.col(id_col), seed), 1, _HEX_DIGITS)
    return df.filter(key < F.lit(_threshold(fraction)))


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    default_fraction: float = 0.0,
    seed: str = "0",
) -> DataFrame:
    """Per-stratum Bernoulli rates (downsample common strata, keep
    rare ones): each row keeps with its stratum's fraction, decided by
    the same id hash — still a pure filter projection, zero shuffles,
    stable under repartitioning.  Strata absent from ``fractions``
    use ``default_fraction``."""
    key = F.substring(_hash_key(F.col(id_col), seed), 1, _HEX_DIGITS)
    thresh = F.lit(_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(_threshold(frac))
        ).otherwise(thresh)
    return df.filter(key < thresh)


def sample_mixture(
    df: DataFrame,
    source_col: str,
    shares: dict,
    id_col: str,
    seed: str = "0",
    return_rates: bool = False,
):
    """Downsample to a TARGET MIXTURE: given per-source share weights
    (e.g. ``{"web": 0.5, "books": 0.3, "code": 0.2}``), keep the
    largest corpus whose source proportions match the weights — the
    dataset-mixing step of every pretraining pipeline.

    Per-source rates are derived from the feasibility bound
    ``T = min_s(n_s / w_s)`` (the binding source is kept whole,
    ``rate = 1``); others get ``rate_s = w_s * T / n_s``.  Shares need
    not sum to 1 — only ratios matter.  Sources absent from ``shares``
    are dropped.  Selection is then the stratified hash gate
    (``sample_stratified``): a pure filter projection, zero shuffles
    on the fact side, reproducible under any partitioning.

    The one non-projection cost is a source-cardinality count
    aggregate collected to the driver (tens of rows — the
    expected-groups pattern, not a data collect)."""
    if not shares:
        raise ValueError("shares must be non-empty")
    for s, w in shares.items():
        if not w > 0:
            raise ValueError(f"share for {s!r} must be > 0 (got {w})")
    srcs = sorted(shares)
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(source_col).isin(srcs))
        .groupBy(source_col)
        .count()
        .collect()
    }
    present = [s for s in srcs if counts.get(s)]
    absent = [s for s in srcs if not counts.get(s)]
    if absent:
        # declared-but-empty sources make the requested mixture
        # infeasible as stated; surface it loudly (the bound below is
        # renormalized over the PRESENT sources only)
        import warnings

        warnings.warn(
            f"sample_mixture: declared sources with zero rows {absent}; "
            "the feasibility bound and output mixture are renormalized "
            "over the present sources only",
            stacklevel=2,
        )
    if not present:
        empty = df.filter(F.lit(False))
        return (empty, {}) if return_rates else empty
    # plain-float arithmetic, in this exact order, so an external
    # re-derivation (the DuckDB oracle) lands on bit-identical rates.
    # Binding source(s) — those achieving the min — are clamped to
    # exactly 1.0 ("kept whole" as documented): the round-trip
    # shares[s] * (counts[s]/shares[s]) / counts[s] is not guaranteed
    # to land on 1.0 in floating point, and 0.999... would drop a
    # max-hash sliver of the binding corpus
    feasible_total = min(counts[s] / shares[s] for s in present)
    rates = {
        s: 1.0
        if counts[s] / shares[s] == feasible_total
        else shares[s] * feasible_total / counts[s]
        for s in present
    }
    out = sample_stratified(
        df.filter(F.col(source_col).isin(present)),
        source_col,
        rates,
        id_col,
        default_fraction=0.0,
        seed=seed,
    )
    return (out, rates) if return_rates else out


def split_train_test(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    seed: str = "0",
    out: str = "split",
) -> DataFrame:
    """Label each row 'test' or 'train' — a disjoint, exhaustive,
    deterministic partition of the id space (the same id always lands
    in the same split, across runs and datasets)."""
    key = F.substring(_hash_key(F.col(id_col), seed), 1, _HEX_DIGITS)
    return df.withColumn(
        out,
        F.when(key < F.lit(_threshold(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def sample_weighted_per_group(
    df: DataFrame, *by: str, n: int, id_col: str, weight_col: str, seed: str = "0"
) -> DataFrame:
    """Weighted sample without replacement: ``min(n, |group|)`` rows
    per group, each row's inclusion probability proportional to its
    weight (Efraimidis-Spirakis A-Res: rank by ``ln(u) / w`` with a
    deterministic hash uniform ``u``, keep the top n).  Reproducible
    like the other samplers — the draw is a pure function of
    (id, seed) — and the rank filter compiles to WindowGroupLimit.

    Rows with NULL or non-positive weights are excluded (zero weight
    means never sampled; the key would be undefined)."""
    df = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    u = (
        F.conv(F.substring(_hash_key(F.col(id_col), seed), 1, _HEX_DIGITS), 16, 10).cast("long")
        + F.lit(0.5)
    ) / F.lit(float(16**_HEX_DIGITS))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*by).orderBy(F.desc(key), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(n))
        .drop("__rn")
    )


def sample_to_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str,
    seed: str = "0",
    return_rate: bool = False,
):
    """Downsample so the kept rows hold ~``budget`` tokens in total
    (the "give me a 50B-token subset" pipeline verb): one sum
    aggregate derives ``rate = budget / total_tokens``, then the
    Bernoulli hash gate keeps each row independently — expected kept
    tokens = budget, unbiased across the length distribution (a
    row's keep chance does not depend on its length).

    The only non-projection cost is the single-value sum collect
    (one number, not data).  NULL/negative token counts contribute 0
    to the total and are never the reason a row is dropped."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    tok = F.when(F.col(token_col) > 0, F.col(token_col)).otherwise(F.lit(0))
    total = df.agg(F.sum(tok.cast("long")).alias("t")).collect()[0]["t"] or 0
    if total <= budget:
        return (df, 1.0) if return_rate else df
    # plain-float division, mirrored bit-exactly by the SQL oracle
    rate = budget / total
    out = sample_bernoulli(df, id_col, rate, seed=seed)
    return (out, rate) if return_rate else out


def sample_exact_global(
    df: DataFrame, n: int, id_col: str, seed: str = "0"
) -> DataFrame:
    """Exactly ``min(n, |df|)`` rows drawn uniformly from the WHOLE
    frame, deterministic by hash order (the global counterpart of
    ``sample_exact_per_group``).

    Plans as ``TakeOrderedAndProject``: every partition keeps its
    local hash-order top-n and the driver merges n-sized heaps — no
    global sort, no single-task shuffle.  The result transfers
    through the driver, so this is for human-scale n (eval sets,
    debugging draws); for billion-row subsets use the rate-based
    samplers."""
    key = _hash_key(F.col(id_col), seed)
    return df.orderBy(key, F.col(id_col)).limit(n)


def split_by_group(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.1,
    seed: str = "0",
    out: str = "split",
) -> DataFrame:
    """GROUP-level train/test split: every row of a group lands in
    the same split (hash the group label, not the row id).  This is
    the leakage-safe splitter — near-duplicate rows cluster within
    domains/documents/users, and a row-level split puts one twin in
    train and the other in test, inflating eval scores.  Same
    deterministic hash gate as ``split_train_test``; a pure
    projection, zero shuffles."""
    return split_train_test(df, group_col, test_fraction, seed=seed, out=out)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    test_fraction: float = 0.1,
    seed: str = "0",
    out: str = "split",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = 1000,
    hash_impl: str = "xxhash64",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """NEAR-DUP-AWARE train/test split: rows whose texts are LSH
    near-duplicates of each other always land on the SAME side.  A
    row-level split puts one twin in train and the other in test, and
    the eval score silently measures memorization — the standard
    leakage guard for training-corpus splits.

    Composition: MinHash-LSH candidate pairs -> connected components
    (``dedup_clusters`` min-label propagation) -> each row's split
    key is its cluster representative (its own id when it appears in
    no pair) -> the same deterministic md5 gate as
    ``split_train_test``.  Pass a precomputed ``(doc_id, cluster_id)``
    frame via ``clusters`` to reuse pipeline dedup output.

    100 TB posture: the cluster frame is PAIR-GRAPH-sized (orders of
    magnitude below the corpus — only docs appearing in some LSH
    bucket pair), so the rep lookup is a broadcast left join; the
    gate itself is a pure projection.  Note the split fractions hold
    over CLUSTERS, not rows: a giant near-dup cluster moves as one
    unit (that is the point).
    """
    if clusters is None:
        from flox_spark.operators.dedup import dedup_clusters, minhash_candidates

        pairs = minhash_candidates(
            df, id_col, text_col, num_hashes, bands, shingle_k,
            max_bucket, hash_impl,
        )
        from flox_spark.operators.dedup import _literal_cc_cap

        clusters = dedup_clusters(pairs, literal_max_pairs=_literal_cc_cap(df))
    cl = clusters.select(
        F.col("doc_id").alias("__lss_id"),
        F.col("cluster_id").alias("__lss_cluster"),
    )
    joined = df.join(
        F.broadcast(cl), df[id_col] == F.col("__lss_id"), "left"
    ).drop("__lss_id")
    rep = F.coalesce(
        F.col("__lss_cluster").cast("string"), F.col(id_col).cast("string")
    )
    key = F.substring(_hash_key(rep, seed), 1, _HEX_DIGITS)
    return joined.withColumn(
        out,
        F.when(key < F.lit(_threshold(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    ).drop("__lss_cluster")


def sample_exact_per_group(
    df: DataFrame, *by: str, n: int, id_col: str, seed: str = "0"
) -> DataFrame:
    """Exactly ``min(n, |group|)`` rows per group, drawn uniformly by
    hash order (reproducible reservoir-sample equivalent).

    The ``row_number() <= n`` filter compiles to WindowGroupLimit:
    each map task pre-keeps its local top-n per group, so the shuffle
    is bounded even when one group holds a billion rows."""
    w = Window.partitionBy(*by).orderBy(_hash_key(F.col(id_col), seed), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(n))
        .drop("__rn")
    )
