"""One-call pipelines composing the dedup / similarity primitives.

``dedup_documents`` is the user-facing entry for "give me a deduped
corpus": candidate generation (exact / minhash / simhash) -> connected
components -> keep representatives, all from the existing oracle-
checked building blocks.  ``ann_recall`` measures an approximate
index's quality against the exact scan — the evaluation loop every
ANN deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flox_spark.operators.dedup import (
    dedup_clusters,
    dedup_exact,
    dedup_keep_representatives,
    minhash_candidates,
    simhash_signatures,
)
from flox_spark.operators.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    ivf_topk,
)

__all__ = ["curate_corpus", "dedup_documents", "ann_recall"]


def dedup_documents(
    df: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Return ``df`` minus near/exact duplicates (each duplicate
    cluster keeps its minimum-id representative).

    ``method``: ``exact`` (normalized-content fingerprint),
    ``minhash`` (LSH candidates -> connected components), ``simhash``
    (identical-signature groups -> connected components), or
    ``embedding`` (cosine near-duplicate pairs over a vector column —
    pass ``vec_col``/``threshold``/``dim`` and use the embedding id
    as ``id_col``).  Extra kwargs pass through to the underlying
    candidate generator (num_hashes/bands/shingle_k/max_bucket for
    minhash, hex_chars for simhash, planes/bands/threshold/dim for
    embedding)."""
    if method == "exact":
        # dedup_exact emits one (fp, keep_id, n_dups) row per distinct
        # content; keep exactly those representative ids
        kept = dedup_exact(df, id_col=id_col, text_col=text_col).select(
            F.col("keep_id").alias(id_col)
        )
        return df.join(kept, id_col, "left_semi")
    if method == "embedding":
        pairs = embedding_near_duplicates(df, id_col=id_col, **kw).select("id_a", "id_b")
    elif method == "minhash":
        pairs = minhash_candidates(df, id_col=id_col, text_col=text_col, **kw)
    elif method == "simhash":
        from flox_spark.operators.dedup import cap_buckets
        from flox_spark.plans.util import materialize_shared

        max_bucket = kw.pop("max_bucket", 1000)
        sigs = simhash_signatures(df, id_col=id_col, text_col=text_col, **kw)
        # same guard as the minhash path: a degenerate corpus
        # (thousands of empty/boilerplate docs sharing one signature)
        # would otherwise expand quadratically in the self-join
        sigs = cap_buckets(sigs, ["simhash"], max_bucket)
        # materialize: the self-join would otherwise recompute the
        # whole signature pipeline for both sides
        sigs = materialize_shared(sigs)
        a, b = sigs.alias("a"), sigs.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.simhash") == F.col("b.simhash"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )
    else:
        raise ValueError(
            f"method must be exact|minhash|simhash|embedding, got {method!r}"
        )
    from flox_spark.operators.dedup import _literal_cc_cap

    clusters = dedup_clusters(pairs, literal_max_pairs=_literal_cc_cap(df))
    return dedup_keep_representatives(df, clusters, id_col=id_col)


def ann_recall(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Recall@k of the IVF index vs the exact cosine scan: per query,
    the fraction of the exact top-k the approximate search returned.
    One row per query plus the standard knob-tuning readout — run
    with increasing ``nprobe`` until recall clears the target."""
    exact = cosine_topk(
        base, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, dim=dim,
    ).select(F.col(query_id_col), F.col(id_col))
    approx = ivf_topk(
        base, queries, k=k, nprobe=nprobe, cluster_col=cluster_col,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col, dim=dim,
    ).select(F.col(query_id_col), F.col(id_col).alias("__aid"))
    hits = exact.join(
        approx,
        (exact[query_id_col] == approx[query_id_col])
        & (exact[id_col] == approx["__aid"]),
        "left",
    ).select(exact[query_id_col].alias("__q"), approx["__aid"].isNotNull().alias("__hit"))
    return (
        hits.groupBy(F.col("__q").alias(query_id_col))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.col("__hit").cast("long")).alias("n_hits"),
            F.round(F.avg(F.col("__hit").cast("double")), 6).alias("recall_at_k"),
        )
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality: dict | None = None,
    reference: DataFrame | None = None,
    dedup: str | None = "minhash",
    dedup_kw: dict | None = None,
    benchmarks: DataFrame | None = None,
    decontaminate_kw: dict | None = None,
    max_ppl: float | None = None,
    perplexity_kw: dict | None = None,
    n_shards: int | None = None,
    seed: str = "0",
) -> tuple[DataFrame, DataFrame]:
    """The end-to-end corpus curation pipeline in one call, composed
    entirely from the oracle-checked stage operators:

    1. quality filter (``quality``: threshold kwargs for
       ``annotate_quality_filter``; ``{}`` for defaults, None skips)
    2. cross-corpus exact dedup against an existing ``reference``
       corpus (``dedup_against``; None skips)
    3. within-corpus dedup (``dedup``: exact/minhash/simhash/
       embedding -> ``dedup_documents``; None skips)
    4. benchmark decontamination (``benchmarks`` frame ->
       ``decontaminate``; None skips)
    5. LM perplexity gate (``max_ppl`` threshold ->
       ``perplexity_filter``; the model trains on the surviving
       corpus unless ``perplexity_kw`` passes ``reference=``/
       ``model=``; None skips)
    6. deterministic shard assignment (``n_shards`` -> ``shard``
       column via ``assign_shards``; None skips)

    Returns ``(curated, report)``: the curated frame (original
    columns, plus ``shard`` when sharded) and a lazy per-stage report
    frame ``(stage_order, stage, n_docs)``.  The report re-evaluates
    each stage's lineage when collected — one corpus pass per stage —
    so collect it for audits, not in the hot path; the curated frame
    itself stays a single composed plan."""
    from flox_spark.operators.clean import decontaminate
    from flox_spark.operators.dedup import dedup_against
    from flox_spark.operators.sharding import assign_shards
    from flox_spark.operators.text import quality_filter

    stages: list[tuple[str, DataFrame]] = [("input", df)]
    cur = df
    if quality is not None:
        cur = quality_filter(cur, text_col=text_col, **quality)
        stages.append(("quality", cur))
    if reference is not None:
        cur = dedup_against(cur, reference, id_col=id_col, text_col=text_col)
        stages.append(("dedup_against", cur))
    if dedup is not None:
        cur = dedup_documents(
            cur, method=dedup, id_col=id_col, text_col=text_col, **(dedup_kw or {})
        )
        stages.append(("dedup", cur))
    if benchmarks is not None:
        cur = decontaminate(
            cur, benchmarks, id_col=id_col, text_col=text_col,
            **(decontaminate_kw or {}),
        )
        stages.append(("decontaminate", cur))
    if max_ppl is not None:
        from flox_spark.operators.lm import perplexity_filter

        cur = perplexity_filter(
            cur, max_ppl, id_col=id_col, text_col=text_col,
            **(perplexity_kw or {}),
        )
        stages.append(("perplexity", cur))
    if n_shards is not None:
        cur = assign_shards(cur, n_shards, id_col=id_col, seed=seed)

    report = None
    for i, (name, frame) in enumerate(stages):
        one = frame.agg(
            F.lit(i).alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        report = one if report is None else report.unionByName(one)
    return cur, report.orderBy("stage_order")
