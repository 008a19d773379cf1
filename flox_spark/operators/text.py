"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (SURVEY §2.5 — flox has no scalar/text
functions); designed per the engine's north star (BASELINE.json).
Everything here is built from JVM built-in expressions — no Python
UDFs in the hot path — so a 100 TB documents table runs entirely
inside whole-stage codegen with predicate pushdown intact.

Cross-engine determinism: every function here is also expressible in
ANSI-ish SQL (see __spark_entry__.oracle_sql), using only operations
whose semantics match between Spark and DuckDB (md5, regexp with
explicit global flag, length, array ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic.  Deterministic, alphabetical language order for tie-break.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"),
}

PUNCT_RE = "[.,!?;:]"


def _tokens(text: Column) -> Column:
    """Whitespace tokenization of lower-cased text; empty text -> []."""
    t = F.lower(F.trim(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, _tokens(F.col(text_col)))


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (the cheap BPE-proxy)."""
    return df.withColumn(out, F.size(_tokens(F.col(text_col))).cast("long"))


# GPT-2-style pre-tokenizer segmentation, minus the trailing-space
# lookahead (RE2 engines have no lookahead; dropping it only changes
# how runs of whitespace group, not letter/number/punct segments).
# Leftmost-first alternation semantics match between Java regex and
# RE2, so the DuckDB oracle counts identically.
BPE_SPLIT_RE = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"


def token_count_bpe(df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token count: number of pre-tokenizer segments under the
    GPT-2 split pattern (contractions, space-prefixed letter runs,
    number runs, punctuation runs).  The standard fast LLM-budget
    estimator — actual BPE merges subdivide each segment but the
    segment count tracks token count closely.  One regexp_count
    projection, codegen, no shuffle."""
    return df.withColumn(out, F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_RE)).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text", prefix: str = "q_") -> DataFrame:
    """Heuristic quality features: length, token count, mean token
    length, punctuation ratio, stopword(en) ratio, and a composite
    score.  All ratios are exact rational arithmetic over counts, so
    the DuckDB oracle reproduces them bit-for-bit.

    Physical shape (r14): the tokenization is STAGED once as a real
    column — inlined, the split/lower/trim subtree re-evaluates once
    per CONSUMING expression (the r14 before-plan shows 20 copies in
    ONE Project, which the stopword lambda keeps out of codegen and
    codegen's CSE) — and the composite score references the staged
    ratio COLUMNS instead of re-deriving each (CollapseProject leaves
    multi-referenced non-cheap aliases staged).  The fan-out follows
    the expensive-per-row-fold convention (kmeans assignment): the
    regex/array work here measures ~130 us/doc, orders above the
    exchange cost, so ``ensure_parallelism`` runs ungated; at scale
    the scan already meets default parallelism and it is a no-op."""
    from flox_spark.plans import ensure_parallelism

    text = F.col(text_col)
    tok_col = f"__{prefix}toks"
    while tok_col in df.columns:
        tok_col += "_"
    work = ensure_parallelism(df).withColumn(tok_col, _tokens(text))
    toks = F.col(tok_col)
    n_chars = F.length(text).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = (F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))).cast("long")
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw))).cast("long")
    mean_tok_len = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))

    def c(s: str) -> Column:
        return F.col(f"{prefix}{s}")

    score = (
        F.when((c("n_tokens") >= 5) & (c("n_tokens") <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((c("mean_tok_len") >= 3.0) & (c("mean_tok_len") <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(c("punct_ratio") <= 0.1, F.lit(0.15)).otherwise(F.lit(0.0))
        + F.when(c("stop_ratio") >= 0.05, F.lit(0.15)).otherwise(F.lit(0.0))
    )
    return (
        work.withColumn(f"{prefix}n_tokens", n_tokens)
        .withColumn(f"{prefix}mean_tok_len", mean_tok_len)
        .withColumn(f"{prefix}punct_ratio", punct_ratio)
        .withColumn(f"{prefix}stop_ratio", stop_ratio)
        .withColumn(f"{prefix}score", score)
        .drop(tok_col)
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic: score = number of tokens in
    each language's stopword list; winner = highest score, ties broken
    alphabetically; no hits at all -> 'und' (undetermined).

    Tokens and the per-language hit counts are STAGED as real columns
    (r14, quality_score's rationale): inlined, each language's
    filter-over-split subtree re-evaluates in the argmax AND in every
    tie-break comparison — 3x per language on top of re-tokenizing."""
    from flox_spark.plans import ensure_parallelism

    def _hits(sw: tuple[str, ...]):
        # NB: a one-arg lambda — a second (even defaulted) parameter
        # makes F.filter pass the element index into it
        return lambda t: t.isin(*sw)

    langs = sorted(LANG_STOPWORDS)
    tok_col = "__lid_toks"
    # collision-check every DERIVED staged name too (__lid_toks_<lang>
    # / __lid_toks_best), not just the token column itself: withColumn
    # would silently clobber an input column named like one of them
    def _derived(tc: str) -> list[str]:
        return [tc, *(f"{tc}_{lang}" for lang in langs), f"{tc}_best"]

    while any(c in df.columns for c in _derived(tok_col)):
        tok_col += "_"
    work = ensure_parallelism(df).withColumn(tok_col, _tokens(F.col(text_col)))
    staged: list[str] = []
    for lang in langs:
        sc = f"{tok_col}_{lang}"
        work = work.withColumn(
            sc, F.size(F.filter(F.col(tok_col), _hits(LANG_STOPWORDS[lang])))
        )
        staged.append(sc)
    scores = [(lang, F.col(f"{tok_col}_{lang}")) for lang in langs]
    # argmax with alphabetical tie-break: fold keeping (best_score, lang)
    best_col = f"{tok_col}_best"
    work = work.withColumn(
        best_col,
        F.greatest(*[s for _, s in scores]) if len(scores) > 1 else scores[0][1],
    )
    best = F.col(best_col)
    pick = F.lit("und")
    for lang, s in reversed(scores):  # earlier (alphabetical) languages win ties
        pick = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pick)
    return work.withColumn(out, pick).drop(tok_col, best_col, *staged)


def repetition_ratio(df: DataFrame, text_col: str = "text", prefix: str = "rep_") -> DataFrame:
    """Repetition signals (Gopher-style quality filters): fraction of
    distinct tokens, and the frequency share of the most common token.
    High repetition marks boilerplate/spam.  Pure array expressions.

    Tokens STAGED once (r14, quality_score's rationale): inlined, the
    split/lower/trim subtree re-evaluates under size, array_distinct,
    array_sort AND the run-length aggregate."""
    from flox_spark.plans import ensure_parallelism

    tok_col = "__rep_toks"
    while tok_col in df.columns:
        tok_col += "_"
    df = ensure_parallelism(df).withColumn(tok_col, _tokens(F.col(text_col)))
    toks = F.col(tok_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    distinct_ratio = F.when(n > 0, n_distinct / n).otherwise(F.lit(1.0))
    # most-common-token share: sort tokens, count the longest run via
    # aggregate over the sorted array (no explode/shuffle needed)
    sorted_toks = F.array_sort(toks)
    top_run = F.aggregate(
        sorted_toks,
        F.struct(F.lit(0).alias("best"), F.lit(0).alias("run"), F.lit(None).cast("string").alias("prev")),
        lambda acc, t: F.struct(
            F.greatest(acc["best"], F.when(acc["prev"] == t, acc["run"] + 1).otherwise(F.lit(1))).alias("best"),
            F.when(acc["prev"] == t, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            t.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    top_ratio = F.when(n > 0, top_run / n).otherwise(F.lit(0.0))
    return (
        df.withColumn(f"{prefix}distinct_ratio", distinct_ratio)
        .withColumn(f"{prefix}top_token_ratio", top_ratio)
        .drop(tok_col)
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lower-cased
    text — the exact-dedup key.  (A content-defined rolling hash adds
    nothing at the whole-document granularity; shingle-level rolling
    hashes live in dedup.minhash_signatures.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.withColumn(out, F.md5(norm))


def annotate_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_mean_tok_len: float = 12.0,
    min_mean_tok_len: float = 3.0,
    max_punct_ratio: float = 0.1,
    min_stop_ratio: float = 0.05,
) -> DataFrame:
    """The decision layer over ``quality_score``: adds ``keep``
    (boolean) and ``drop_reason`` (the FIRST failing rule's name, in
    the documented order: n_tokens, mean_tok_len, punct_ratio,
    stop_ratio; NULL when kept).  Reason accounting is what a real
    filtering pipeline reports — "we dropped 12% for length, 3% for
    punctuation" — and a deterministic first-fail rule makes the
    report reproducible.  Pure projections over the quality features;
    zero shuffles."""
    added = [
        f"__qf_{s}"
        for s in ("n_tokens", "mean_tok_len", "punct_ratio", "stop_ratio", "score")
    ]
    clash = (set(added) | {"keep", "drop_reason"}) & set(df.columns)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} already exist; rename them before "
            "annotate_quality_filter"
        )
    ann = quality_score(df, text_col=text_col, prefix="__qf_")
    rules = [
        (
            "n_tokens",
            (F.col("__qf_n_tokens") >= min_tokens)
            & (F.col("__qf_n_tokens") <= max_tokens),
        ),
        (
            "mean_tok_len",
            (F.col("__qf_mean_tok_len") >= min_mean_tok_len)
            & (F.col("__qf_mean_tok_len") <= max_mean_tok_len),
        ),
        ("punct_ratio", F.col("__qf_punct_ratio") <= max_punct_ratio),
        ("stop_ratio", F.col("__qf_stop_ratio") >= min_stop_ratio),
    ]
    reason = F.lit(None).cast("string")
    for name, ok in reversed(rules):
        # coalesce: a NULL rule verdict (NULL text -> NULL n_tokens
        # under ANSI) FAILS that rule rather than silently passing to
        # the next one — NULL text reads as 'n_tokens', deterministic
        # in both engines
        reason = F.when(~F.coalesce(ok, F.lit(False)), F.lit(name)).otherwise(reason)
    keep = reason.isNull()
    out = ann.withColumn("keep", keep).withColumn("drop_reason", reason)
    return out.drop(*added)


def quality_filter(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """Corpus rows passing every quality rule (columns unchanged)."""
    ann = annotate_quality_filter(df, text_col=text_col, **thresholds)
    return ann.filter(F.col("keep")).drop("keep", "drop_reason")


def quality_filter_report(
    df: DataFrame, text_col: str = "text", sort: bool = True, **thresholds
) -> DataFrame:
    """Per-reason drop counts (plus a ``kept`` row) — one tiny
    aggregate over the annotations.  ``sort=False`` skips the
    presentation orderBy (its range exchange costs two extra AQE
    jobs — callers that canonicalize row order themselves, like the
    bench harness, don't need it)."""
    ann = annotate_quality_filter(df, text_col=text_col, **thresholds)
    out = ann.groupBy(
        F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome")
    ).agg(F.count(F.lit(1)).alias("n"))
    return out.orderBy("outcome") if sort else out


# ---------------------------------------------------------------------------
# corpus statistics: tf-idf key terms, n-gram frequency table
# ---------------------------------------------------------------------------

# alnum-run tokenizer shared by tfidf/ngram corpus stats: lower-case,
# split on any non-alphanumeric run, drop empties.  Deliberately
# simpler than the BPE pre-tokenizer above — corpus stats want word
# identity, not segmentation parity
_WORD_SPLIT_RE = "[^a-z0-9]+"


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), _WORD_SPLIT_RE), lambda t: t != F.lit("")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (tf * ln(N/df)): the classic keyword/topic-proxy extraction used
    for corpus exploration and domain balancing.  Returns
    (id, term, score) rows, k per document, deterministically ordered
    by (rounded score desc, term asc).

    Scale shape: one explode + two hash aggregates (term frequency
    per doc; document frequency per term — both map-side combined),
    then a hash join of tf rows against the vocabulary-sized df table
    (Catalyst broadcasts a small vocabulary on its own) and a per-doc
    WindowGroupLimit top-k, so every task pre-trims to k rows per doc
    before the final exchange.  The corpus row count N rides along as
    a broadcast scalar, not a driver collect.  Ranking uses the score
    ROUNDED to 6 decimals so float ulp differences can never reorder
    ties across engines or partitionings; ties break on the term."""
    from flox_spark.plans.util import materialize_shared

    # the exploded token frame feeds BOTH the tf and df aggregates (a
    # diamond): materialize so the tokenize+explode runs once, not
    # once per side (same rewrite as minhash_candidates' bucket frame)
    toks = materialize_shared(
        df.select(F.col(id_col), F.explode(_words(F.col(text_col))).alias("term"))
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    # + the NULL-id document: count_distinct skips NULLs, so a term
    # appearing ONLY in NULL-id docs would get __df = 0 and the ANSI
    # division below would throw (NULL is one id value here, the same
    # rule as the span family's cross_doc_only test)
    dfreq = toks.groupBy("term").agg(
        (
            F.count_distinct(F.col(id_col))
            + F.max(F.col(id_col).isNull().cast("long"))
        ).alias("__df")
    )
    n = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("__tf") * F.log(F.col("__n").cast("double") / F.col("__df")),
                6,
            ),
        )
    )
    from flox_spark.operators.topk import grouped_topk

    return grouped_topk(
        scored, id_col, value="score", k=k, tiebreak="term"
    ).select(id_col, "term", "score")


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    top: int = 100,
) -> DataFrame:
    """Corpus-wide word n-gram frequency table, the ``top`` most
    frequent (count desc, ngram asc — fully deterministic).  The raw
    material for contamination screens, boilerplate detection, and
    repetition analysis at corpus level.

    Scale shape: n-gram generation is a row-local array transform
    (zero joins, zero UDFs), the count is one map-side-combined hash
    aggregate keyed by the n-gram, and the global top-N compiles to
    TakeOrderedAndProject — each task keeps its local top-N, the
    driver merges P*N rows, never the full vocabulary."""
    # STAGE the tokenized array in its own projection (the
    # minhash_bands lesson, SCALE.md): inlining _words into the
    # per-position slice transform re-evaluates the split for every
    # gram — measured 4.5 s vs 0.9 s at sf0.1
    w = F.col("__w")
    staged = df.select(_words(F.col(text_col)).alias("__w"))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard docs
    # shorter than n explicitly
    grams = F.when(
        F.size(w) >= F.lit(n),
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(top)
    )
