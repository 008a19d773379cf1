"""Deduplication operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star).  Four
families, all expressed as DataFrame ops over JVM built-ins:

- exact: hash-groupBy on a normalized fingerprint.
- MinHash + LSH: shingle -> per-seed min-hash -> band -> bucket join.
- n-gram Jaccard: inverted shingle index self-join with a document
  -frequency cutoff (the classic quadratic-blowup guard at scale).
- SimHash: per-token md5 bit votes -> compact hex signature.

Determinism note: hashes default to md5 hex strings (identical in
any engine), and min-hash takes the lexicographic minimum of those
strings — so the DuckDB oracle reproduces results exactly, and a
re-run on a different cluster gives identical buckets.  For
production paths that don't need cross-engine reproduction, pass
``hash_impl="xxhash64"``: Spark's native 64-bit hash
(``F.xxhash64``) is one codegen'd long op instead of a 32-hex-char
md5 string build — still deterministic across runs/partitionings
WITHIN Spark, just not reproducible by other engines.

Scale notes (100 TB posture):
- Shingling + hashing is a pure projection (codegen, no shuffle).
- The signature aggregation is one groupBy(doc) shuffle.
- Bucket joins shuffle on (band, key) — uniform by construction
  (md5).  ``max_bucket`` caps pathological buckets (e.g. boilerplate
  documents) before the pair expansion, which is the one step that
  can go quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flox_spark.plans import ensure_parallelism


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row
    per distinct content with the representative (min id) and the
    duplicate count.  ``keep='first'`` semantics."""
    return (
        df.select(content_fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# ---------------------------------------------------------------------------
# shared banding / bucket-cap helpers
# ---------------------------------------------------------------------------


def band_key(hash_impl: str, cols: list[Column]) -> Column:
    """One band's bucket key from its member hash columns: md5 of the
    joined hex strings (oracle-reproducible) or xxhash64 of the longs
    cast to string (production).  Single definition shared by the
    batch LSH join and the streaming banding so the two can never
    silently diverge."""
    if hash_impl == "xxhash64":
        return F.xxhash64(*cols).cast("string")
    if hash_impl == "md5":
        return F.md5(F.concat_ws("|", *cols))
    raise ValueError(f"hash_impl must be md5|xxhash64, got {hash_impl!r}")


def cap_buckets(
    df: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop buckets larger than ``max_bucket`` BEFORE a pair-expanding
    self-join (the quadratic-blowup guard).  A dropped bucket means
    "everything here is near-identical" — route those through
    dedup_exact instead.  No-op when ``max_bucket`` is None."""
    if max_bucket is None:
        return df
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__bs", F.count(F.lit(1)).over(w))
        .filter(F.col("__bs") <= max_bucket)
        .drop("__bs")
    )


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ---------------------------------------------------------------------------


def _shingle_expr(text: Column, k: int, unit: str = "word") -> Column:
    """k-shingles of lower-cased text; docs shorter than k units
    produce their full content as the one shingle.  Pure array
    expressions — no UDF.  ``unit``: 'word' (whitespace tokens) or
    'char' (overlapping character k-grams, the classic dedup choice
    for languages without whitespace segmentation)."""
    if unit == "char":
        t = F.lower(F.trim(text))
        n = F.length(t)
        shingles = F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: t.substr(i, F.lit(k)),
        )
        return F.when(n >= k, shingles).otherwise(F.array(t))
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, shingles).otherwise(F.array(F.concat_ws(" ", toks)))


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, unit: str = "word"
) -> DataFrame:
    """Distinct (id, shingle) pairs — the inverted-index input.
    Fans out small scans first: shingling+hashing are CPU-bound."""
    df = ensure_parallelism(df)
    return (
        df.select(F.col(id_col), F.explode(_shingle_expr(F.col(text_col), k, unit)).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """Per-document MinHash signature: for seed i, the minimum of
    hash(i, shingle) over the doc's distinct shingles — lexicographic
    min of md5 hex strings (oracle-reproducible) or numeric min of
    xxhash64 longs (``hash_impl="xxhash64"``, the fast production
    path).  One groupBy(doc) shuffle; the mins are one aggregation
    pass either way."""
    sh = doc_shingles(df, id_col, text_col, shingle_k)
    if hash_impl == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    elif hash_impl == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    else:
        raise ValueError(f"hash_impl must be md5|xxhash64, got {hash_impl!r}")
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """(id, band, bkey) LSH bucket rows: the signature split into
    ``bands`` bands of ``num_hashes/bands`` rows, each hashed to one
    bucket key.  The shared front half of ``minhash_candidates``
    (within-corpus self-join) and ``minhash_against`` (cross-corpus
    membership probe)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands ({bands})"
        )
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, hash_impl)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_key(hash_impl, [F.col(f"mh{b * r + j}") for j in range(r)]).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def minhash_against(
    batch: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """Cross-corpus NEAR-dup flagging: the distinct batch ids whose
    MinHash signature shares any LSH band bucket with any reference
    document — ``dedup_against``'s recall-oriented sibling for the
    "new crawl vs existing corpus" step when exact fingerprints are
    too strict.

    Scale shape: there is NO pair expansion at all — the reference
    side collapses to its DISTINCT (band, bkey) set before a LEFT
    SEMI join (existence is the question, so no ``max_bucket`` cap is
    even needed; a degenerate mega-bucket costs one row here).  Both
    sides are one shingle+min aggregation each; the join shuffles
    bucket keys, never documents.  Drop flagged ids with a left-anti
    join against this result, or route them to ``levenshtein_refine``
    for certification."""
    bb = band_buckets(batch, id_col, text_col, num_hashes, bands, shingle_k, hash_impl)
    rb = band_buckets(
        reference, id_col, text_col, num_hashes, bands, shingle_k, hash_impl
    ).select("band", "bkey").distinct()
    return bb.join(rb, ["band", "bkey"], "left_semi").select(id_col).distinct()


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int | None = 1000,
    hash_impl: str = "md5",
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` bands
    of ``num_hashes/bands`` rows each, hash each band, and emit all
    (id_a < id_b) pairs sharing any band bucket.

    ``max_bucket`` drops degenerate buckets (boilerplate text) before
    the quadratic pair expansion — at 100 TB this is the difference
    between a join and an outage; dropped buckets mean "everything
    here is near-identical", which callers handle via dedup_exact.
    """
    buckets = band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_k, hash_impl
    )
    buckets = cap_buckets(buckets, ["band", "bkey"], max_bucket)
    # the self-join is a diamond DAG: without materializing, Spark
    # recomputes the whole shingle+md5 pipeline for BOTH sides
    # (verified via .explain: 2 FileScans, 0 ReusedExchange)
    from flox_spark.plans.util import materialize_shared

    buckets = materialize_shared(buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    df_max: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs found via
    the inverted shingle index.  ``df_max`` drops shingles appearing
    in more than that many documents (stopword-like shingles create
    O(df^2) pairs and contribute little discrimination).

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    With ``df_max`` set, the score is exact Jaccard over the FILTERED
    shingle universe (sizes and intersections both exclude the dropped
    high-frequency shingles) — a consistent metric, not a mix of the
    two universes.
    """
    # sh feeds the pair join twice plus sizes (and freq):
    # materialize the inverted index once instead of re-shingling
    from flox_spark.plans.util import materialize_shared

    sh = materialize_shared(doc_shingles(df, id_col, text_col, k))
    if df_max is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        sh = materialize_shared(
            sh.join(freq.filter(F.col("__df") <= df_max), "shingle").drop("__df")
        )
    # sizes AFTER the df_max filter: |A|, |B| and |A∩B| must count the
    # same shingle universe or near-threshold pairs get silently dropped
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        shared.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn("jaccard", F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 8,
    hash_impl: str = "md5",
) -> DataFrame:
    """SimHash over distinct tokens (unit weights): for each of
    ``hex_chars * 4`` bits, sum +1/-1 votes of hash(token)'s bit and
    emit the majority as a hex signature string.  Near-duplicates
    share signatures (or differ in few bits — pair via banding on
    signature prefixes).  ``hash_impl="xxhash64"`` votes on the bits
    of one native 64-bit hash per token (max 16 hex chars) instead of
    md5 hex digits — same plan shape, ~no string work.

    Plan shape: a document is one row, so the votes are row-local
    array folds (``aggregate`` over ``transform``'d hashes) — a
    pure projection with ZERO exchanges, like the text operators; the
    explode -> groupBy formulation this replaces is kept as
    ``_simhash_signatures_grouped`` and equality-tested.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))

    if hash_impl == "xxhash64":
        if hex_chars * 4 > 64:
            raise ValueError("xxhash64 simhash supports at most 16 hex chars")
        base = (
            ensure_parallelism(df)
            .filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.transform(toks, lambda t: F.xxhash64(t)).alias("__hs"))
        )

        def vote_bit(bit: int) -> Column:
            def step(acc: Column, h: Column) -> Column:
                return acc + (F.shiftright(h, bit).bitwiseAND(F.lit(1))) * 2 - 1

            return F.aggregate(F.col("__hs"), F.lit(0).cast("long"), step)

        out_chars = []
        for p in range(hex_chars):
            val = None
            for j in range(4):
                bit = F.when(
                    vote_bit(p * 4 + (3 - j)) > 0, F.lit(2 ** (3 - j))
                ).otherwise(F.lit(0))
                val = bit if val is None else val + bit
            out_chars.append(F.lit(_HEX).substr(val + 1, F.lit(1)))
        return base.select(F.col(id_col), F.concat(*out_chars).alias("simhash"))
    if hash_impl != "md5":
        raise ValueError(f"hash_impl must be md5|xxhash64, got {hash_impl!r}")

    def md5_of(t: Column) -> Column:
        return F.md5(t)

    # NULL-text rows have no tokens: drop them, matching the grouped
    # formulation (whose explode emits no rows for them) instead of
    # emitting an all-zero signature that would collide all NULL docs
    base = (
        ensure_parallelism(df)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.transform(toks, md5_of).alias("__hs"))
    )

    def digits_at(p: int) -> Column:
        # hex digit p of each token's md5, as 0..15
        def one(h: Column) -> Column:
            return (F.instr(F.lit(_HEX), F.substring(h, p + 1, 1)) - 1).cast("long")

        return F.transform(F.col("__hs"), one)

    base = base.select(id_col, *[digits_at(p).alias(f"d{p}") for p in range(hex_chars)])

    def vote(p: int, j: int) -> Column:
        shift = 3 - j

        def step(acc: Column, v: Column) -> Column:
            return acc + (F.floor(v / (2 ** shift)) % 2) * 2 - 1

        return F.aggregate(F.col(f"d{p}"), F.lit(0).cast("long"), step)

    out_chars = []
    for p in range(hex_chars):
        val = None
        for j in range(4):
            bit = F.when(vote(p, j) > 0, F.lit(2 ** (3 - j))).otherwise(F.lit(0))
            val = bit if val is None else val + bit
        out_chars.append(F.lit(_HEX).substr(val + 1, F.lit(1)))
    return base.select(F.col(id_col), F.concat(*out_chars).alias("simhash"))


def _simhash_signatures_grouped(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 8,
) -> DataFrame:
    """Original explode -> distinct -> groupBy formulation (one
    shuffle); retained as the differential witness for the row-local
    path above."""
    toks = F.explode(
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))
    ).alias("tok")
    base = ensure_parallelism(df).select(F.col(id_col), toks).withColumn("h", F.md5(F.col("tok")))
    # per hex char p: v = 0..15 from the md5 hex digit
    char_exprs = []
    for p in range(hex_chars):
        v = (F.instr(F.lit(_HEX), F.substring(F.col("h"), p + 1, 1)) - 1).cast("int")
        char_exprs.append(v.alias(f"v{p}"))
    base = base.select(id_col, *char_exprs)
    # bit j of char p: (v >> (3-j)) & 1 ; vote = sum(2*bit - 1)
    votes = []
    for p in range(hex_chars):
        for j in range(4):
            shift = 3 - j
            bit = F.floor(F.col(f"v{p}") / (2 ** shift)) % 2
            votes.append(F.sum(bit * 2 - 1).alias(f"w{p}_{j}"))
    agg = base.groupBy(id_col).agg(*votes)
    # rebuild hex chars from majority bits
    out_chars = []
    for p in range(hex_chars):
        val = None
        for j in range(4):
            bit = F.when(F.col(f"w{p}_{j}") > 0, F.lit(2 ** (3 - j))).otherwise(F.lit(0))
            val = bit if val is None else val + bit
        out_chars.append(F.lit(_HEX).substr(val + 1, F.lit(1)))
    sig = F.concat(*out_chars)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 8,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = 1000,
    hash_impl: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance: band each
    signature into ``bands`` substrings, bucket-join docs sharing any
    band (a pair within ``max_hamming`` bits differs in at most
    ``max_hamming`` < bands bands, so by pigeonhole it shares at least
    one — guaranteed recall when ``max_hamming < bands``), then filter
    candidates by exact hamming distance (``bit_count`` of the xor'd
    signatures — pure codegen).

    Output: (id_a, id_b, hamming) with id_a < id_b.  ``max_bucket``
    caps degenerate buckets like the minhash path."""
    if hex_chars % bands != 0:
        raise ValueError(f"hex_chars ({hex_chars}) must divide into bands ({bands})")
    if hex_chars > 16:
        raise ValueError("hamming via 64-bit xor supports at most 16 hex chars")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < bands ({bands}): the "
            "pigeonhole recall guarantee needs one unchanged band per pair; "
            "raise bands (or hex_chars) to allow a larger distance"
        )
    r = hex_chars // bands
    sigs = simhash_signatures(df, id_col, text_col, hex_chars, hash_impl)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring(F.col("simhash"), b * r + 1, r).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    buckets = cap_buckets(buckets, ["band", "bkey"], max_bucket)
    from flox_spark.plans.util import materialize_shared

    buckets = materialize_shared(buckets)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .distinct()
    )
    # hamming over <=8-hex-char (32-bit) slices: conv().cast(long) on a
    # full 16-char signature with the top bit set exceeds Long.MAX and
    # casts to NULL, silently dropping pairs
    slices = [
        F.bit_count(
            F.conv(F.substring(F.col("__sa"), p + 1, 8), 16, 10).cast("long")
            .bitwiseXOR(F.conv(F.substring(F.col("__sb"), p + 1, 8), 16, 10).cast("long"))
        )
        for p in range(0, hex_chars, 8)
    ]
    ham = slices[0]
    for s in slices[1:]:
        ham = ham + s
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over candidate-pair edges: every document
    that appears in a pair is assigned the MINIMUM id reachable
    through the pair graph as its ``cluster_id`` (the canonical
    representative).  The step a real dedup pipeline needs between
    "similar pairs" (minhash/jaccard/simhash output) and "which rows
    to keep": near-duplicates chain (A~B, B~C => one cluster).

    Spark-first iterative min-label propagation: each round joins the
    edge list with current labels and keeps the per-node minimum —
    converges in graph-diameter rounds (duplicate clusters are
    near-cliques, so typically 2-3).  Each round is one join + one
    groupBy, localCheckpointed to truncate lineage; convergence is
    detected by COUNTING CHANGED LABELS (join new vs old on the node
    id, limit 1) — type-agnostic, so string document ids work; a
    label-sum check would be NULL==NULL-vacuous for non-numeric ids
    and silently stop after one round, mislabeling any component of
    diameter >= 3.  At 100 TB scale the edge list is |candidate
    pairs|-sized — orders of magnitude below the corpus — and every
    round shuffles only that (both label frames are checkpointed, so
    the convergence probe joins two materialized node-sized frames).

    Output: (doc_id, cluster_id) for every id present in ``pairs``;
    docs in no pair are implicitly their own singleton cluster.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint()  # reused every round: cut off the pair pipeline
    )
    labels = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("lbl"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        prop = edges.join(labels, "u").select(F.col("v").alias("u"), "lbl")
        new_labels = (
            labels.union(prop).groupBy("u").agg(F.min("lbl").alias("lbl")).localCheckpoint()
        )
        # labels are elementwise non-increasing, so "any row changed"
        # is exact convergence; limit(1) short-circuits the probe
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def dedup_keep_representatives(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every clustered document except its cluster representative
    (the row whose id equals cluster_id); unclustered rows pass
    through.  The terminal step of the near-dedup pipeline."""
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# cross-corpus (incremental) dedup + pair refinement
# ---------------------------------------------------------------------------


def content_fingerprint(text: Column) -> Column:
    """The normalized-content fingerprint shared by ``dedup_exact``
    and ``dedup_against``: md5 of whitespace-collapsed, lower-cased,
    trimmed text.  One definition so batch-vs-batch and
    batch-vs-corpus dedup can never silently diverge."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))


def dedup_against(
    batch: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: drop batch documents whose normalized
    content already exists in a reference corpus (the "dedup the new
    crawl against everything we already have" step every growing
    training corpus needs).  Returns the surviving batch rows,
    original columns intact.

    Scale shape: the reference side is reduced to DISTINCT
    fingerprints before the join (corpus-sized scan, fingerprint-sized
    shuffle), then a LEFT ANTI hash join on the 16-byte fingerprint.
    Catalyst broadcasts the fingerprint set when it is provably small;
    a billion-document reference falls back to a plain shuffled anti
    join, which is exactly the right plan at that size.  The batch is
    scanned once; no pair expansion anywhere."""
    ref_fp = reference.select(
        content_fingerprint(F.col(text_col)).alias("__fp")
    ).distinct()
    return (
        batch.withColumn("__fp", content_fingerprint(F.col(text_col)))
        .join(ref_fp, "__fp", "left_anti")
        .drop("__fp")
    )


def levenshtein_refine(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 20,
    prefix_chars: int = 512,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Verify LSH candidate pairs with an edit-distance check: keep
    pairs whose (prefix-truncated) texts are within ``max_dist``
    Levenshtein edits, adding the distance as ``edit_dist``.  The
    standard precision stage AFTER MinHash/SimHash recall — bucketing
    finds "probably similar", edit distance certifies "actually
    similar".

    Scale shape: the quadratic primitive (Levenshtein is O(len_a *
    len_b) per pair) is bounded two ways — it only ever runs on the
    candidate-pair set (LSH-bucketed, never all-pairs), and both
    sides are truncated to ``prefix_chars`` so one pair costs at most
    prefix² character ops regardless of document length.  Text lookup
    is two hash joins of the pair ids against the docs table, which
    shuffle only (id, prefix) projections; no driver-side loops."""
    texts = docs.select(
        F.col(id_col), F.left(F.col(text_col), F.lit(prefix_chars)).alias("__t")
    )
    a = texts.select(F.col(id_col).alias(id_a), F.col("__t").alias("__ta"))
    b = texts.select(F.col(id_col).alias(id_b), F.col("__t").alias("__tb"))
    # the threshold form early-exits the DP once a row of the edit
    # matrix exceeds max_dist (returns -1), turning the worst case
    # from prefix² into prefix*max_dist per pair
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        pairs.join(a, id_a)
        .join(b, id_b)
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= F.lit(0))
        .drop("__ta", "__tb")
    )
