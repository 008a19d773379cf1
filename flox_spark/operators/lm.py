"""N-gram language-model perplexity scoring — the CCNet/RedPajama
quality-filtering step ("drop documents a reference LM finds
surprising") re-expressed as pure DataFrame ops.

Beyond the reference's surface (BASELINE.json north star).  The
classic pipeline trains a KenLM model on a clean reference corpus and
filters the crawl by per-document perplexity; the statistical core —
an add-k-smoothed word bigram model — is a pair of count aggregates
plus one join, fully declarative:

    train:  bigram counts C(w1, w2) and context counts C(w1) over the
            reference corpus (two hash aggregates, vocab-sized output)
    score:  each document's bigrams left-join the count tables;
            log P(w2 | w1) = ln((C(w1,w2) + k) / (C(w1) + k*V));
            perplexity = exp(-mean log P) per doc (one aggregate)

Scale posture (100 TB corpus, reference-sized model):
- training touches the REFERENCE corpus only; outputs are vocab- and
  bigram-type-sized, not corpus-sized.
- scoring shuffles on the bigram key only when the model is too big
  to broadcast; AQE sees the model's RUNTIME size and converts the
  count joins to broadcast for any curated-reference model, so
  scoring is a pure map-side pipeline over the crawl — zero corpus
  shuffles except the per-doc mean (one hash aggregate on doc_id).
- the vocabulary size V rides the plan as a broadcast one-row frame
  (no driver collect), so the whole thing is lazily composable.

Smoothing: add-k over the vocabulary (unknown bigram -> k / (C(w1) +
k*V); unknown context -> 1/V).  Documents with fewer than 2 tokens
have no bigrams and score NULL (no evidence either way) — filter
treats NULL as "keep", matching the quality-filter convention that
absence of signal never drops a document silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flox_spark.operators.dedup import _word_tokens
from flox_spark.plans import ensure_parallelism

__all__ = ["doc_perplexity", "perplexity_filter", "train_bigram_lm"]


def _doc_bigrams(
    df: DataFrame, id_col: str, text_col: str, keep_empty_docs: bool = False
) -> DataFrame:
    """(id, w1, w2) rows — one per bigram OCCURRENCE (counts weigh
    repeats, like any LM).  Tokens staged in their own select (the
    shingle pipeline's discipline).  The empty-token guard runs INSIDE
    the pair array (identical result to the old post-explode filter),
    so ``keep_empty_docs=True`` can ``explode_outer`` and emit exactly
    ONE (id, NULL, NULL) row for a doc with no valid bigrams — the
    scoring aggregate then covers every document in a single pass,
    with no second corpus-wide distinct + re-attach join."""
    # min_bytes gate: tokenize+explode is a few regex ops per row —
    # under ~8 MB the fan-out exchange costs more than the single-task
    # compute it spreads (ensure_parallelism docstring's measurement)
    toks = ensure_parallelism(df, min_bytes=8 << 20).select(
        F.col(id_col), _word_tokens(F.col(text_col)).alias("__t")
    )
    # ONE expr string: the nested transform/filter built from Python
    # lambdas costs ~0.2 s of py4j round trips per plan build (the
    # similarity._dot discipline)
    valid = F.expr(
        "filter(CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(0, size(__t) - 2), "
        "i -> struct(__t[i] AS w1, __t[i + 1] AS w2)) "
        "ELSE array() END, s -> s.w1 != '' AND s.w2 != '')"
    )
    ex = F.explode_outer(valid) if keep_empty_docs else F.explode(valid)
    return toks.select(F.col(id_col), ex.alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    _bg: DataFrame | None = None,
    _small: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the count model: returns (bigrams, contexts, vocab_size) —
    (w1, w2, c) bigram counts, (w1, c1) context counts, and a ONE-ROW
    frame with the vocabulary size V (distinct tokens, either
    position).  All three are aggregates of the reference corpus; keep
    them (e.g. ``write_table``) to score many batches against one
    model.

    ONE corpus-sized aggregate: only the bigram-type counts touch the
    reference corpus; the context counts are the bigram counts summed
    over w2 (C(w1) = sum_w2 C(w1, w2) — identical by definition) and
    the vocabulary is the distinct words of the bigram TYPES — both
    aggregates over the vocab-sized count frame, never the corpus.
    The count frame is materialized (``materialize_shared``) so its
    corpus-sized aggregation doesn't re-run for each of its three
    consumers (measured: skipping it re-runs the tokenize+explode
    subtree inside every AQE broadcast build — slower even at sf0.1).
    """
    from flox_spark.plans.util import materialize_shared

    bg = _bg if _bg is not None else _doc_bigrams(reference, id_col, text_col)
    bigrams = materialize_shared(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("c").alias("c1"))
    vsrc = bigrams
    if _small:
        # count_distinct is a two-phase agg: partial-distinct exchange
        # + SinglePartition exchange + the broadcast build = three AQE
        # stages for ONE number.  A small count frame collapses to one
        # single-task stage (coalesce is narrow over the checkpoint);
        # web-scale vocabularies keep the parallel two-phase plan.
        vsrc = bigrams.coalesce(1)
    vocab = (
        vsrc.select(F.explode(F.array(F.col("w1"), F.col("w2"))).alias("w"))
        .agg(F.count_distinct(F.col("w")).alias("V"))
    )
    return bigrams, contexts, vocab


def doc_perplexity(
    corpus: DataFrame,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_k: float = 1.0,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Per-document bigram perplexity against the reference corpus
    (default: the corpus itself — self-perplexity, the "how unlike the
    rest of the data is this document" score).  Returns
    (id, n_bigrams, ppl); docs with no bigrams score NULL.

    ``model``: pass ``train_bigram_lm(...)`` output to reuse a fitted
    model; otherwise one is trained from ``reference``/``corpus``.
    ``broadcast_model``: None (default) lets AQE pick the join
    strategy from RUNTIME sizes — it converts to broadcast for any
    normal model and falls back to shuffle for web-scale
    vocabularies, and measured ~30% faster than the forced hint even
    on a 1k-bigram model (the explicit broadcast subtree schedules
    three separate build jobs).  True forces the broadcast hint;
    False forbids it — a ``shuffle_hash`` hint on the model frames,
    which Catalyst/AQE honor over their broadcast preference (for a
    model too large for executor memory)."""
    if smooth_k <= 0:
        raise ValueError(f"smooth_k must be > 0, got {smooth_k}")
    bg = None
    self_trained = False
    if model is None:
        if reference is None:
            self_trained = True
            # self-perplexity: train and score share ONE bigram frame
            # plan.  keep_empty_docs threads the bigram-less docs
            # through as (id, NULL, NULL) rows — they contribute
            # nothing to the counts (NULL keys never join) and come
            # out of the scoring aggregate with NULL scores, so the
            # old second corpus-wide distinct + re-attach join is gone
            # entirely.  bg itself is deliberately NOT checkpointed:
            # its only consumers are the bigram-count aggregate
            # (checkpointed, tiny) and the scoring join — re-running
            # tokenize+explode once beats writing out an intermediate
            # LARGER than the corpus (the exploded bigram rows), and
            # it keeps the whole query a single action.
            bg = _doc_bigrams(corpus, id_col, text_col, keep_empty_docs=True)
            from flox_spark.plans.util import estimate_size_bytes as _est

            csize = _est(corpus)
            if csize is not None and csize < (32 << 20):
                # SMALL corpus: the training agg and the scoring join
                # both consume bg — checkpoint it so tokenize+explode
                # runs once (measured 0.33 s per pass at sf0.1).  At
                # scale bg stays lazy: the exploded bigram rows are
                # LARGER than the corpus, so re-running the projection
                # beats writing them out (the original rationale).
                from flox_spark.plans.util import materialize_shared

                bg = materialize_shared(bg)
            model = train_bigram_lm(
                corpus, id_col, text_col, _bg=bg,
                _small=csize is not None and csize < (32 << 20),
            )
        else:
            model = train_bigram_lm(reference, id_col, text_col)
    bigrams, contexts, vocab = model
    if broadcast_model is True:
        hint = F.broadcast
    elif broadcast_model is False:
        # actually forbid broadcast: the shuffle_hash hint outranks
        # AQE's size-based broadcast conversion
        hint = lambda d: d.hint("shuffle_hash")  # noqa: E731
    else:
        hint = lambda d: d  # noqa: E731 — AQE decides (None)

    if bg is None:
        bg = _doc_bigrams(corpus, id_col, text_col, keep_empty_docs=True)
    # two scoring shapes, picked by corpus plan-stats size:
    #
    # SMALL: the model fused into ONE w1-keyed lookup — per context a
    # map<w2, c> plus c1 (= sum of the map's counts, identical by
    # definition).  One broadcast build + one join instead of two of
    # each; AQE schedules a separate sub-job per broadcast
    # materialization, and at small inputs those fixed jobs ARE the
    # query's cost (measured 9 one-task jobs before the fuse).
    #
    # LARGE: the classic two-join shape.  The fused lookup
    # concentrates a context's whole fan-out into one row (a stopword
    # w1 at web scale = millions of map entries in one aggregation
    # buffer), so it is NOT the scale shape.  BOTH sides gate it:
    # scoring a small corpus against a large precomputed reference
    # model would still build per-w1 map buffers over the full model
    # — the exact stopword fan-out the comment above warns about —
    # so an unknown or >32 MB model also forces the two-join shape.
    from flox_spark.plans.util import estimate_size_bytes

    size = estimate_size_bytes(corpus)
    msize = estimate_size_bytes(bigrams)
    if (
        size is not None
        and size < (32 << 20)
        and msize is not None
        and msize < (32 << 20)
    ):
        # NOTE (round 8): chaining the counts + lookup aggs onto one
        # explicit w1-exchange of bg (hashpartitioning(w1) satisfies
        # both ClusteredDistributions) was tried and REGRESSED 6 -> 7
        # jobs: AQE materializes the repartition exchange as its own
        # stage over the full bigram rows, costing more than the tiny
        # counts re-exchange it replaces.  The materialized-counts
        # route below is the measured optimum (0.92 s at sf0.1).
        lookup = bigrams.filter(F.col("w1").isNotNull()).groupBy("w1").agg(
            F.map_from_entries(F.collect_list(F.struct("w2", "c"))).alias("__cm"),
            F.sum("c").alias("c1"),
        )
        if self_trained:
            # SELF-trained: every non-NULL probe w1 is in the model by
            # construction, so V can ride INSIDE the lookup broadcast
            # (one row-wise crossJoin in the build) — one broadcast
            # job and no per-probe BroadcastNestedLoopJoin.  Sentinel
            # rows (w1 NULL) never join and are excluded from the
            # score mean anyway.  A foreign corpus CAN miss the
            # lookup and still needs V for the unknown-context term,
            # so it keeps the probe-side crossJoin.
            joined = bg.join(hint(lookup.crossJoin(vocab)), ["w1"], "left")
        else:
            joined = bg.join(hint(lookup), ["w1"], "left").crossJoin(
                F.broadcast(vocab)
            )
        c_expr = F.element_at(F.col("__cm"), F.col("w2"))
    else:
        joined = (
            bg.join(hint(bigrams), ["w1", "w2"], "left")
            .join(hint(contexts), ["w1"], "left")
            .crossJoin(F.broadcast(vocab))
        )
        c_expr = F.col("c")
    k = F.lit(float(smooth_k))
    logp = F.log(
        (F.coalesce(c_expr, F.lit(0)) + k)
        / (F.coalesce(F.col("c1"), F.lit(0)) + k * F.col("V"))
    )
    # ONE aggregate covers every document: real bigram rows score,
    # the NULL sentinel rows count 0 and average to NULL
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.col("w1")).alias("__nb"),
        F.avg(F.when(F.col("w1").isNotNull(), logp)).alias("__mlp"),
    )
    return per_doc.select(
        F.col(id_col),
        F.when(F.col("__nb") > 0, F.col("__nb")).alias("n_bigrams"),
        F.exp(-F.col("__mlp")).alias("ppl"),
    )


def perplexity_filter(
    corpus: DataFrame,
    max_ppl: float,
    reference: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth_k: float = 1.0,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    broadcast_model: bool | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """Keep corpus rows whose perplexity is <= ``max_ppl`` (plus docs
    with no bigram evidence — NULL never silently drops).  The CCNet
    decision step; returns surviving rows unchanged.  The comparison
    runs on the score ROUNDED to ``round_digits`` (the engine's usual
    rounded-boundary discipline — keep/drop is stable across engines'
    last-ulp differences in the log-mean; None for raw doubles)."""
    scores = doc_perplexity(
        corpus, reference, id_col, text_col, smooth_k, model, broadcast_model
    )
    scr = (
        F.round(F.col("ppl"), round_digits)
        if round_digits is not None
        else F.col("ppl")
    )
    keep = scores.filter(scr.isNull() | (scr <= F.lit(float(max_ppl)))).select(id_col)
    return corpus.join(keep, [id_col], "left_semi")
