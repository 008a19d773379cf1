"""Distributed Lloyd k-means over an embedding column.

Completes the IVF ANN story (``operators/similarity.py``): ``ivf_topk``
needs a coarse-quantizer cluster column; this trains one with plain
DataFrame ops — no MLlib dependency, no RDDs, and critically **no
driver-side collect**: the centroid table is a k-row DataFrame that is
broadcast-joined into the assignment step, so the same code runs
against a 100 TB base table.

Per iteration (the classic two phases):

    assign: the k centroids are packed into ONE broadcast row and the
            nearest-centroid argmin is a row-local array fold — a pure
            projection, no k-way row expansion, NO shuffle (same fold
            as ``assign_clusters``)
    update: posexplode -> mean per (cluster, pos) -> rebuild arrays;
            partial aggregation collapses each task to <= k*dim rows
            before its exchange, so the one shuffle per iteration is
            centroid-sized, not data-sized

Two loop drivers, identical math:

- ``driver loop`` (default when k*dim <= ~1M values): the k*dim
  (cluster, pos, mean) rows — centroid-sized, never data-sized — are
  collected per iteration and the next iteration's packed-centroid
  row is rebuilt as a one-row LocalRelation.  ONE Spark job per
  iteration (the mean aggregate), no per-iteration checkpoint or
  broadcast-build job; this is what every production k-means
  (including Spark MLlib's) does, and the driver traffic is bounded
  by k*dim*8 bytes regardless of input size.  It also enables a free
  ``tol`` early stop (max centroid shift computed driver-side).
- ``plan loop`` (huge k*dim): the original fully-lazy loop — each
  iteration's centroid frame stays a DataFrame, materialized
  (``materialize_shared``) so the iterative lineage doesn't compound
  into an exponentially deep plan, and broadcast-joined into the next
  assignment.  Nothing larger than the centroid table ever reaches
  the driver.

Initialization is deterministic: the k rows with the smallest
``md5(id || seed)`` — a reproducible uniform draw (same rule as
``operators/sampling.py``), so fitted centroids are identical across
runs and partitionings.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flox_spark.plans.util import materialize_shared

__all__ = [
    "kmeans_fit",
    "assign_clusters",
    "assign_clusters_two_level",
    "seed_centroids",
]


def _packed_centroids(centroids: DataFrame) -> "F.Column":
    """The k-row centroid table collapsed to ONE broadcastable row:
    an array of (cid, centroid) structs, ``array_sort``-ed by cid.
    ``collect_list`` makes NO order guarantee (even under an orderBy —
    partition arrival order wins), so the explicit sort is what makes
    the packed array — and with it every downstream fold — identical
    across partitionings; the fold's own ``cid <`` tie-break then
    never depends on arrival order."""
    return F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__cid"), F.col("centroid")))
            ).alias("__cents")
        )
    )


def _nearest_cid(vec_col: str) -> "F.Column":
    """Row-local argmin over the packed centroid array (``__cents``):
    a pure projection, no row expansion, no shuffle.  Ties go to the
    lowest cluster id.

    Built as ONE ``F.expr`` string (Python-lambda construction of the
    nested fold costs ~0.15 s of py4j round trips per plan build —
    see similarity._dot).  ``array_min`` over (d, cid) structs is the
    argmin with exactly the old fold's tie-break: struct comparison is
    lexicographic, so lowest distance wins and equal distances fall to
    the lowest cid.  Non-finite distances (NaN from NaN coordinates,
    NULL from NULL/short vectors, Infinity from overflow) are filtered
    first — the old fold's ``d < acc.d`` never admitted them either —
    and an all-invalid row keeps the old sentinel cid of -1."""
    return F.expr(_nearest_cid_sql(vec_col))


def _nearest_cid_sql(vec_col: str) -> str:
    """SQL text of the ``_nearest_cid`` fold (see its docstring) —
    exposed so one-statement callers can splice it."""
    vc = ".".join("`%s`" % p.replace("`", "``") for p in vec_col.split("."))
    return (
        "coalesce(array_min(filter(transform(__cents, c -> struct("
        f"aggregate(zip_with({vc}, c.centroid, "
        "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "0.0D, (s, x) -> s + x) AS d, c.__cid AS cid)), "
        "s -> s.d IS NOT NULL AND NOT isnan(s.d) "
        "AND s.d != CAST('Infinity' AS DOUBLE))).cid, -1)"
    )


def _seed_candidates(raw: DataFrame, k: int, id_col: str, seed: str) -> DataFrame:
    """The 2k-row seed-candidate frame: NULL vectors excluded (they
    never fold to a valid distance — letting one win a seed slot
    would just burn a cluster on the -1 sentinel), smallest
    md5(id||seed) first.  ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — a distributed partial top-k, never a
    single-task global sort."""
    return (
        raw.filter(F.col("__v").isNotNull())
        .withColumn(
            "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
        )
        .orderBy("__h")
        .limit(2 * k)
    )


def _seeds_from_candidates(cand: DataFrame, k: int) -> DataFrame:
    """Declarative ragged-drop + k-select over the (tiny) candidate
    frame: the authoritative dim is the MAJORITY (mode) candidate
    length — ties toward the longer length — so one corrupt overlong
    vector cannot disqualify every normal candidate; off-dim vectors
    are dropped and the first k by hash order survive — the exact
    plan twin of the driver-side ``_seed_cents``.  Every step is
    2k-sized."""
    w_all = Window.partitionBy()  # candidate frame is 2k rows — tiny
    w_sz = Window.partitionBy(F.size("__v"))
    seeds = (
        cand.withColumn("__szn", F.count(F.lit(1)).over(w_sz))
        .withColumn(
            "__dim",
            F.max(F.struct(F.col("__szn"), F.size("__v").alias("__sz")))
            .over(w_all)["__sz"],
        )
        .filter(F.size("__v") == F.col("__dim"))
        .orderBy("__h")
        .limit(k)
    )
    w = Window.orderBy("__h")
    return seeds.select(
        (F.row_number().over(w) - 1).alias("__cid"), F.col("__v").alias("centroid")
    )


def seed_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "0",
) -> DataFrame:
    """``kmeans_fit(..., max_iter=0)``'s deterministic hash-draw init
    as a standalone COLLECT-FREE plan fragment: the k rows with the
    smallest ``md5(id || seed)`` as a (__cid, centroid) frame.  Lets
    callers (``semantic_dedup_pairs``'s fused small path) compose the
    init into ONE action instead of paying a separate seed-collect
    job; selection is identical to the fit's.

    Built as ONE ``spark.sql()`` string over a throwaway temp view:
    the Column-by-Column construction of the same plan (candidate
    top-k + mode-dim window drop + row_number) cost ~450 py4j round
    trips ≈ 0.2-1.0 s per BUILD — over half of ``semdedup_pairs``'s
    measured plan-build wall (r12 VERDICT next #3).  ``spark.sql``
    analyzes eagerly, so the view is dropped before returning; the
    logical plan is the same shape (TakeOrderedAndProject twice, two
    windows over the 2k-row candidate frame) — ``_seeds_from_candidates``
    stays as the plan-twin documentation of the selection contract."""
    import uuid

    spark = df.sparkSession
    # uuid view name: a module counter is not thread-safe, and two
    # concurrent builds on one SparkSession could collide through
    # createOrReplaceTempView / the finally-block drop
    view = f"__fs_seed_src_{uuid.uuid4().hex}"
    qid = ".".join("`%s`" % p.replace("`", "``") for p in id_col.split("."))
    qv = ".".join("`%s`" % p.replace("`", "``") for p in vec_col.split("."))
    sq = seed.replace("'", "''")
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(f"""
            WITH __cand AS (
                SELECT __id, __v,
                       md5(concat(CAST(__id AS STRING), ':{sq}')) AS __h
                FROM (SELECT {qid} AS __id,
                             transform({qv}, x -> CAST(x AS DOUBLE)) AS __v
                      FROM {view})
                WHERE __v IS NOT NULL
                ORDER BY __h LIMIT {2 * int(k)}
            ),
            __sized AS (
                SELECT __h, __v,
                       count(1) OVER (PARTITION BY size(__v)) AS __szn
                FROM __cand
            ),
            __dimmed AS (
                SELECT __h, __v,
                       (max(named_struct('__szn', __szn,
                                         '__sz', size(__v))) OVER ()).__sz
                           AS __dim
                FROM __sized
            ),
            __seeds AS (
                SELECT __h, __v FROM __dimmed WHERE size(__v) = __dim
                ORDER BY __h LIMIT {int(k)}
            )
            SELECT row_number() OVER (ORDER BY __h) - 1 AS __cid,
                   __v AS centroid
            FROM __seeds""")
    finally:
        spark.catalog.dropTempView(view)


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment with ZERO shuffles: the k-row
    centroid table is packed into ONE broadcast row (an array of
    (cid, centroid) structs) and the argmin is a row-local array fold
    — no k-way row expansion, no groupBy to re-collapse it.  Ties go
    to the lowest cluster id.  Because the plan is a pure projection
    over a stream-static broadcast join, the same call works on a
    Structured Streaming frame (incremental IVF assignment).

    Batch frames are fanned out first: the fold is CPU-bound (k*dim
    ops per row) while Catalyst sizes partitions by BYTES, so a
    byte-small embedding scan would otherwise run the whole
    assignment on one task (a streaming frame already shuffles into
    its sink/stateful operator)."""
    if not df.isStreaming:
        from flox_spark.plans import ensure_parallelism

        df = ensure_parallelism(df)
        # huge rows x k work volume: the flat fold is interpreted
        # (HOF CodegenFallback) — switch to the Arrow/BLAS argmin
        # pass (assign_clusters_numpy docstring).  Batch only: the
        # numpy path collects the k-row centroid table, which a
        # streaming plan cannot.  k is unknown until that collect, so
        # the gate probes with a generous k=4096 assumption: frames
        # too small to trip it at ANY plausible k never pay the
        # collect, and a wasted collect when the true k turns out
        # small is k-sized and harmless.  Below the gate the
        # declarative fold keeps its zero-collect, bit-exact contract.
        work = _numpy_assign_work(df, 1)
        if work is not None and work * 4096 > _NUMPY_ASSIGN_MIN_WORK:
            cents_rows = [
                (r["__cid"], None if r["centroid"] is None else list(r["centroid"]))
                for r in centroids.select("__cid", "centroid").collect()
            ]
            if cents_rows and work * len(cents_rows) > _NUMPY_ASSIGN_MIN_WORK:
                return assign_clusters_numpy(
                    df, cents_rows, vec_col, out
                ).select(F.col(id_col), F.col(out))
            if cents_rows:
                # true k was small — don't waste the probe: rebuild the
                # centroid table as a LOCAL frame from the rows already
                # on the driver, so the fold path packs a LocalRelation
                # instead of re-executing the centroids lineage (which
                # may carry an expensive upstream plan).  Exotic label
                # types fall through to the original frame — the flat
                # pack supports them, the SQL-typed rebuild doesn't.
                try:
                    from flox_spark.plans.util import local_frame

                    centroids = local_frame(
                        df.sparkSession,
                        cents_rows,
                        f"__cid {_cid_sql_type(cents_rows)}, centroid array<double>",
                    )
                except ValueError:
                    pass
    return (
        df.crossJoin(_packed_centroids(centroids))
        .withColumn(out, _nearest_cid(vec_col))
        .select(F.col(id_col), F.col(out))
    )


# above this many k*dim values the per-iteration centroid collect /
# LocalRelation rebuild stops being "tiny" (8 MB of doubles) and the
# fully-lazy plan loop takes over
_DRIVER_LOOP_MAX_VALUES = 1 << 20


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: str = "0",
    tol: float | None = None,
    driver_loop: bool | None = None,
    return_assignment: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame | None]:
    """Fit k centroids; returns a k-row DataFrame (__cid, centroid) —
    or, with ``return_assignment=True``, a ``(centroids, labels)``
    tuple (labels is None at 0 iterations) so type-checkers flag
    callers that forget to unpack.

    ``max_iter`` Lloyd iterations from the deterministic hash-draw
    init.  Empty clusters keep their previous centroid (standard
    Lloyd degeneracy handling).  ``tol``: stop early once the max
    centroid coordinate shift drops below it (driver loop only —
    checking convergence in the plan loop would cost an extra action
    per iteration, the opposite of what the loop optimizes for).
    ``driver_loop``: force the per-iteration centroid-collect loop on
    or off; default picks by k*dim (see module docstring).

    ``return_assignment``: return ``(centroids, assigned)`` instead,
    where ``assigned`` is the (id, vec, __cid) frame of the FINAL
    Lloyd E-step — the labels that produced the returned centroids'
    last update.  This is the sklearn ``labels_``/``cluster_centers_``
    contract: consistent once converged, one E-step stale when the
    loop stops on ``max_iter``.  In the plan loop the last E-step is
    checkpointed (one data-sized write) so a downstream consumer
    (``semantic_dedup_pairs``) skips a whole re-assignment pass — at
    web-scale k that pass is the dominant cost (SCALE.md, 6M x
    k=24000).  ``assigned`` is None when ``max_iter <= 0`` (the seed
    draw assigns nothing).

    NB the driver loop runs eager per-iteration collects through
    ``scoped_tiny_collect`` (k-sized traffic, never data-sized): the
    fit is not session-concurrent with arbitrary OUTSIDE queries on
    the same SparkSession — each collect briefly scopes session-global
    conf (see that helper's docstring for the full caveat)."""
    from flox_spark.plans import ensure_parallelism
    from flox_spark.plans.util import estimate_size_bytes

    # the per-iteration assignment fold is CPU-bound (k*dim ops/row):
    # fan a byte-small scan out before it (see assign_clusters).  The
    # SEED draw stays on the raw projection — md5+top-k is cheap and
    # the fan-out's exchange would only lengthen that one short job.
    # Gate: when the TOTAL fold work is tiny (plan-stats size scaled
    # by k), the exchange costs more wall per iteration than the
    # single-task fold it parallelizes — same gate as
    # semantic_dedup_pairs' small path
    raw = df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v")
    )
    size = estimate_size_bytes(df)
    small = size is not None and size * max(1, k // 8) < (32 << 20)
    base = raw if small else ensure_parallelism(raw)
    if driver_loop is None:
        driver_loop_resolved = k * 4096 <= _DRIVER_LOOP_MAX_VALUES
    else:
        driver_loop_resolved = driver_loop
    if not driver_loop_resolved:
        # the plan loop references base max_iter+1 times through an
        # ever-deeper lineage: checkpoint once.  The driver loop skips
        # this — each of its (few) jobs just re-scans the immutable
        # source, saving the materialize job entirely
        base = materialize_shared(base)

    # orderBy().limit(k) compiles to TakeOrderedAndProject (distributed
    # partial top-k per partition), NOT a single-task global sort; the
    # row_number window then runs over only k rows
    cand = _seed_candidates(raw, k, id_col, seed)

    # driver_loop default sized on k alone with a conservative
    # per-vector dim allowance of 4096 (the vector dim isn't in the
    # schema) — any real embedding column passes at sane k (k=256,
    # dim=4096 is still only 8 MB of centroid doubles per iteration);
    # resolved above so the materialize decision could see it.  The
    # driver loop collects the 2k candidate rows straight off the
    # TakeOrderedAndProject (ONE stage) and does the ragged-drop +
    # k-select in Python — the declarative window version costs two
    # extra plan stages and ~0.3 s of py4j plan build per fit, pure
    # fixed overhead for a frame the loop collects anyway.
    if driver_loop_resolved:
        return _kmeans_driver_loop(
            base, cand, k, max_iter, tol,
            id_col=id_col, vec_col=vec_col,
            return_assignment=return_assignment,
        )

    centroids = _seeds_from_candidates(cand, k)

    centroids = materialize_shared(centroids)
    # huge rows x k fits route each iteration's assignment through the
    # Arrow/BLAS argmin (assign_clusters_numpy): the interpreted fold
    # is the iteration bottleneck at web-scale k.  Gated on the work
    # volume (plan-stats bytes x k, computed BEFORE the checkpoint
    # erased the stats) AND on the collected centroid closure staying
    # task-shippable (<= 64 MB of doubles).
    np_work = None if size is None else size * max(1, k)
    last_assigned = None
    for _it in range(max_iter):
        full = None
        if np_work is not None and np_work > _NUMPY_ASSIGN_MIN_WORK:
            cents_rows = [
                (r["__cid"], None if r["centroid"] is None else list(r["centroid"]))
                for r in centroids.collect()
            ]
            dims = max((len(v) for _, v in cents_rows if v), default=0)
            if cents_rows and len(cents_rows) * dims * 8 <= (64 << 20):
                # assign_clusters_numpy passes ALL input columns
                # through, so the id rides along for free
                full = assign_clusters_numpy(base, cents_rows, "__v", "__cid")
        if full is None:
            # row-local fold assignment: a projection, not the
            # crossJoin-expand + groupBy(id) re-collapse (which cost a
            # k-way row expansion and a full-data hash exchange per
            # iteration); the only shuffle left per iteration is the
            # centroid-sized mean aggregation below
            full = base.crossJoin(_packed_centroids(centroids)).select(
                F.col(id_col), F.col("__v"), _nearest_cid("__v").alias("__cid")
            )
        if return_assignment and _it == max_iter - 1:
            # checkpoint the final E-step: the means below read it
            # instead of re-running the assignment, and the caller
            # gets the labels without ANOTHER data-sized pass
            last_assigned = materialize_shared(
                full.select(F.col(id_col), F.col("__v"), F.col("__cid"))
            )
            full = last_assigned
        assigned = full.select("__cid", "__v")
        means = (
            assigned.select("__cid", F.posexplode("__v").alias("pos", "x"))
            .groupBy("__cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("__cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("__cid", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
        # empty clusters: keep the previous centroid
        centroids = materialize_shared(
            centroids.alias("old")
            .join(means.alias("new"), "__cid", "left")
            .select(
                "__cid",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias("centroid"),
            )
        )
    if return_assignment:
        return centroids, last_assigned
    return centroids


_PACKED_SCHEMA = "__cents array<struct<__cid:int,centroid:array<double>>>"

# below this many k*dim values the per-iteration centroids are embedded
# as a literal array expression instead of a broadcast LocalRelation:
# same plan semantics (generated code is identical across iterations,
# literals travel in the references array, so the codegen cache still
# hits), but it skips the per-iteration relation build + broadcast
# machinery — measured 0.71 s -> 0.43 s per iteration at sf0.1.  Past
# the gate the expression tree would bloat analysis, so the broadcast
# row takes over.
_LITERAL_CENTROIDS_MAX_VALUES = 1 << 14


def _fmt_double(x) -> str:
    # %.17g round-trips every FINITE double exactly, but renders
    # non-finites as `nanD`/`infD` — invalid Spark SQL (a parse error
    # at plan build).  NaN coordinates reach here legitimately: a NaN
    # input component propagates through F.avg into the centroid mean
    # (and a NULL element in a seed vector arrives as None)
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    x = float(x)
    import math

    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return "CAST('%sInfinity' AS DOUBLE)" % ("-" if x < 0 else "")
    return "%.17gD" % x


def _literal_centroids(cents: list) -> "F.Column":
    # one expr STRING: building this as nested F.lit/F.struct calls
    # costs k*dim py4j round trips per iteration (~0.2 s at k=4,
    # dim=64 — measured)
    def arr(c):
        return "array(" + ",".join(_fmt_double(x) for x in c) + ")"

    return F.expr(
        "array("
        + ",".join(
            f"struct({i} AS __cid, {arr(c)} AS centroid)"
            for i, c in enumerate(cents)
        )
        + ")"
    )


def _seed_cents(cand_rows: list, k: int) -> list:
    """Driver-side seed selection from the collected 2k-candidate
    rows: authoritative dim = the MAJORITY (mode) candidate length
    (ties broken toward the longer length), ragged vectors dropped,
    first k by hash order kept.  Mode, not max: a single anomalously
    long (corrupt) vector in the 2k window must not disqualify every
    normal-length candidate and collapse the fit to one centroid.
    Mirrors the declarative window version in the plan loop exactly."""
    rows = [r for r in cand_rows if r["__v"] is not None]
    if not rows:
        return []
    counts: dict[int, int] = {}
    for r in rows:
        counts[len(r["__v"])] = counts.get(len(r["__v"]), 0) + 1
    dim = max(counts, key=lambda L: (counts[L], L))
    return [
        [None if x is None else float(x) for x in r["__v"]]
        for r in sorted(rows, key=lambda r: r["__h"])
        if len(r["__v"]) == dim
    ][:k]


def _kmeans_driver_loop(
    base: DataFrame,
    cand: DataFrame,
    k: int,
    max_iter: int,
    tol: float | None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_assignment: bool = False,
):
    """The centroid-sized driver loop: per iteration ONE Spark job —
    the (cluster, pos, mean) aggregate, collected (k*dim rows, never
    data-sized) and reassembled into the next packed-centroid
    LocalRelation on the driver.  Compared to the plan loop this
    drops the per-iteration localCheckpoint job and the broadcast
    build over a checkpoint scan, roughly halving per-iteration
    scheduling; the aggregate itself is the identical plan, so the
    fitted centroids match the plan loop to float-reduction order.

    The INIT collects the 2k-candidate frame (TakeOrderedAndProject —
    ONE short single-stage job) and seed-selects in Python
    (``_seed_cents``), after which every iteration enters through the
    literal/LocalRelation centroid path: a max_iter=1 fit is two
    short jobs end-to-end, with no broadcast build re-computing the
    seed subtree."""
    spark = base.sparkSession
    cents: list = []

    # AQE re-plans each exchange as its own sub-query — measured
    # ~0.65 s of per-iteration scheduling on a centroid-sized shuffle
    # it cannot improve (the partial aggregate already collapses each
    # task to <= k*dim rows before the exchange; there is no skew or
    # partition-count decision left to adapt), and the mean aggregate's
    # reduce side only ever carries <= k*dim partially-aggregated rows
    # per map task, so 4 reduce tasks is right at ANY input scale.
    # scoped_tiny_collect (plans/util.py) owns the session-global conf
    # flip, the restore, and the cross-thread serialization; its
    # docstring carries the single concurrency CAVEAT for every user.
    from flox_spark.plans.util import scoped_tiny_collect

    use_literal = False
    assign_cents: list | None = None
    # guard PER COLLECT, never around the whole Lloyd loop: the guard
    # holds a process-wide lock, so wrapping the full fit would block
    # every other operator's scoped collect (LM literal model,
    # winsorize fences, semdedup cap) on ANY session in the process
    # for the fit's entire duration (r10 ADVICE liveness note).  The
    # per-collect flip/restore is four conf round-trips (~ms) against
    # a per-iteration Spark job.
    for it in range(max(max_iter, 0)):
        if it == 0:
            # seed collect first: a 2k-sized TakeOrderedAndProject
            # job (never data-sized); ragged-drop + k-select in
            # Python (_seed_cents).  Fewer than k surviving seeds
            # (input smaller than k): only the seeded clusters
            # exist, matching the plan loop.
            with scoped_tiny_collect(spark):
                cand_rows = cand.collect()
            cents = _seed_cents(cand_rows, k)
            if not cents:
                empty = spark.createDataFrame(
                    [], schema="__cid int, centroid array<double>"
                )
                return (empty, None) if return_assignment else empty
            dim = len(cents[0])
            use_literal = len(cents) * dim <= _LITERAL_CENTROIDS_MAX_VALUES
        assign_cents = cents  # the centroids this E-step labels with
        if use_literal:
            assigned = base.withColumn("__cents", _literal_centroids(cents))
        else:
            from flox_spark.plans.util import local_frame

            packed = local_frame(
                spark,
                [([(i, c) for i, c in enumerate(cents)],)],
                schema=_PACKED_SCHEMA,
            )
            assigned = base.crossJoin(F.broadcast(packed))
        with scoped_tiny_collect(spark):
            rows = (
                assigned.select(_nearest_cid("__v").alias("__cid"), "__v")
                .select("__cid", F.posexplode("__v").alias("pos", "x"))
                .groupBy("__cid", "pos")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
        new_cents = [list(c) for c in cents]  # empty keep previous
        for r in rows:
            # cid -1 is the all-invalid-distance sentinel from
            # _nearest_cid (NaN/NULL/short vectors): those rows
            # belong to NO cluster — dropping them here matches
            # the plan loop's left-join (an unmatched cid keeps
            # the previous centroid); indexing with -1 would
            # silently overwrite the LAST centroid
            if r["__cid"] >= 0:
                new_cents[r["__cid"]][r["pos"]] = r["m"]
        if tol is not None:
            # NULL-element seed coordinates persist across
            # iterations (no row ever assigns to a NULL-element
            # centroid) — skip any pair that isn't two finite
            # floats instead of raising on None/NaN
            shift = max(
                (
                    abs(a - b)
                    for nc, oc in zip(new_cents, cents)
                    for a, b in zip(nc, oc)
                    if a is not None
                    and b is not None
                    and math.isfinite(a)
                    and math.isfinite(b)
                ),
                default=0.0,
            )
            cents = new_cents
            if shift <= tol:
                break
        else:
            cents = new_cents
    if max_iter <= 0:
        # no iterations requested: the seed draw IS the fit
        with scoped_tiny_collect(spark):
            cand_rows = cand.collect()
        cents = _seed_cents(cand_rows, k)
        if not cents:
            empty = spark.createDataFrame(
                [], schema="__cid int, centroid array<double>"
            )
            return (empty, None) if return_assignment else empty

    from flox_spark.plans.util import local_frame

    centroids = local_frame(
        spark, [(i, c) for i, c in enumerate(cents)],
        schema="__cid int, centroid array<double>",
    )
    if return_assignment:
        last_assigned = None
        if assign_cents is not None:
            # the driver loop never materializes an E-step (its whole
            # point is one agg job per iteration), so the returned
            # labels are a LAZY fold against the same literal
            # centroids the final E-step used — one pass when
            # consumed, exactly what the caller would otherwise
            # rebuild, with the E-step label semantics preserved
            if use_literal:
                src = base.withColumn("__cents", _literal_centroids(assign_cents))
            else:
                from flox_spark.plans.util import local_frame

                src = base.crossJoin(
                    F.broadcast(
                        local_frame(
                            spark,
                            [([(i, c) for i, c in enumerate(assign_cents)],)],
                            schema=_PACKED_SCHEMA,
                        )
                    )
                )
            last_assigned = src.select(
                F.col(id_col), F.col("__v"), _nearest_cid("__v").alias("__cid")
            )
        return centroids, last_assigned
    return centroids


# ---------------------------------------------------------------------------
# two-level (coarse-then-fine) quantizer for large k
# ---------------------------------------------------------------------------
#
# The flat packed-centroid fold is O(k*dim) per row; past k ~ 1000 it
# pins assignment CPU (SCALE.md).  The classic IVF answer is a
# two-level quantizer: group the k fine centroids into ~sqrt(k) coarse
# cells (a tiny k-means over the CENTROIDS — k-sized, driver-side,
# deterministic), assign each row to its nearest coarse cell first and
# run the fine argmin only over that cell's members —
# O((sqrt(k) + k/sqrt(k)) * dim) = O(2*sqrt(k)*dim) per row.  The
# result is approximate in the usual IVF sense (the true nearest fine
# centroid can live in a neighboring coarse cell); recall is measured
# in tests/test_kmeans.py and the exactness boundary is coarse_k=1
# (one cell = the flat fold, bit-identical).

def _coarse_partition(cents_rows: list, coarse_k: int) -> list:
    """Group (cid, centroid) rows into <= coarse_k coarse cells with a
    deterministic numpy Lloyd run over the centroids themselves (seeds
    = smallest md5(cid), 8 iterations — the input is k-sized, never
    data-sized).  Returns [(ccent, [(cid, centroid), ...]), ...] with
    empty cells dropped; cluster ids pass through with their original
    type (int and string labels both supported — see
    _packed_two_level's schema inference)."""
    import hashlib

    import numpy as np

    if not cents_rows:
        return []
    # dense matrix needed: drop NULL/ragged centroids (majority dim,
    # ties to the longer length — the shared kernel rule); they could
    # never win a fine argmin anyway (NULL distance is filtered)
    from collections import Counter

    with_vec = [(i, c) for i, c in cents_rows if c is not None]
    if not with_vec:
        return []
    dims = Counter(len(c) for _, c in with_vec)
    dim = max(dims.items(), key=lambda kv: (kv[1], kv[0]))[0]
    cents_rows = [
        (i, c)
        for i, c in with_vec
        if len(c) == dim and all(x is not None for x in c)
    ]
    if not cents_rows:
        return []
    X = np.array([c for _, c in cents_rows], dtype=float)
    ids = [i for i, _ in cents_rows]
    m = max(1, min(coarse_k, len(cents_rows)))
    order = sorted(
        range(len(cents_rows)),
        key=lambda j: hashlib.md5(f"{ids[j]}:coarse".encode()).hexdigest(),
    )
    C = X[order[:m]].copy()
    for _ in range(8):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for g in range(m):
            if (a == g).any():
                C[g] = X[a == g].mean(0)
    a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    groups = []
    for g in range(m):
        mem = [
            (ids[j], [float(x) for x in X[j]])
            for j in range(len(cents_rows))
            if a[j] == g
        ]
        if mem:
            groups.append(([float(x) for x in C[g]], mem))
    return groups


def _two_level_schema(cid_sql_type: str) -> str:
    return (
        "__cents2 array<struct<ccent:array<double>,"
        f"members:array<struct<__cid:{cid_sql_type},centroid:array<double>>>>>"
    )


def _cid_sql_type(cents_rows: list) -> str:
    """Infer the Spark SQL type carrying the cluster labels through
    the nested pack: int32-ranged ints stay int (the kmeans_fit
    contract), wider ints go bigint, strings pass through — anything
    else is rejected loudly (the flat probe supports arbitrary
    orderable labels; the nested LocalRelation schema cannot)."""
    if all(isinstance(i, int) and not isinstance(i, bool) for i, _ in cents_rows):
        lo, hi = min(i for i, _ in cents_rows), max(i for i, _ in cents_rows)
        return "int" if -(1 << 31) <= lo and hi < (1 << 31) else "bigint"
    if all(isinstance(i, str) for i, _ in cents_rows):
        return "string"
    raise ValueError(
        "two-level quantizer cluster labels must be all-int or all-string; "
        f"got types {sorted({type(i).__name__ for i, _ in cents_rows})} "
        "(use the flat probe for other label types)"
    )


def _packed_two_level(spark, cents_rows: list, coarse_k: int) -> DataFrame:
    """One-row broadcastable frame holding the nested coarse->fine
    centroid table (same LocalRelation discipline as the flat pack).
    Callers guard the empty case (an empty nested array cannot carry
    a schema)."""
    if not cents_rows:
        raise ValueError("empty centroid table — guard before packing")
    groups = _coarse_partition(cents_rows, coarse_k)
    from flox_spark.plans.util import local_frame

    return local_frame(
        spark, [(groups,)], schema=_two_level_schema(_cid_sql_type(cents_rows))
    )


def _sq_dist(vec_ref: str, cent_ref: str) -> str:
    return (
        f"aggregate(zip_with({vec_ref}, {cent_ref}, "
        "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        "0.0D, (s, x) -> s + x)"
    )


_VALID = "s -> s.d IS NOT NULL AND NOT isnan(s.d) AND s.d != CAST('Infinity' AS DOUBLE)"


def _nearest_coarse_gix(vec_col: str) -> "F.Column":
    """0-based index of the nearest coarse cell (NULL if none valid)."""
    vc = ".".join("`%s`" % p.replace("`", "``") for p in vec_col.split("."))
    return F.expr(
        "array_min(filter(transform(__cents2, (g, i) -> struct("
        + _sq_dist(vc, "g.ccent")
        + f" AS d, i AS gix)), {_VALID})).gix"
    )


def _nearest_cid_in_group(
    vec_col: str, gix_col: str = "__g", sentinel: str = "-1"
) -> "F.Column":
    """Fine argmin over the chosen coarse cell's members; ``sentinel``
    (default -1, matching _nearest_cid's int contract; string-labeled
    packs pass ``"NULL"``) when no cell or no valid member."""
    vc = ".".join("`%s`" % p.replace("`", "``") for p in vec_col.split("."))
    return F.expr(
        f"CASE WHEN {gix_col} IS NULL THEN {sentinel} ELSE "
        f"coalesce(array_min(filter(transform(element_at(__cents2, {gix_col} + 1).members, "
        "c -> struct(" + _sq_dist(vc, "c.centroid") + " AS d, c.__cid AS cid)), "
        f"{_VALID})).cid, {sentinel}) END"
    )


def assign_clusters_two_level(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cluster",
    coarse_k: int | None = None,
) -> DataFrame:
    """``assign_clusters`` through the two-level quantizer: same
    ZERO-shuffle projection shape (one broadcast row, two row-local
    folds), O(2*sqrt(k)*dim) per row instead of O(k*dim).

    The centroid table is collected once (k-sized — the same driver
    traffic class as ``kmeans_fit``'s per-iteration collect, never
    data-sized).  ``coarse_k`` defaults to ~sqrt(k).  Approximate in
    the IVF sense; ``coarse_k=1`` reproduces the flat fold exactly."""
    cents_rows = [
        (r["__cid"], None if r["centroid"] is None else list(r["centroid"]))
        for r in centroids.select("__cid", "centroid").collect()
    ]
    if not cents_rows:
        return df.select(F.col(id_col), F.lit(-1).alias(out))
    work = None if df.isStreaming else _numpy_assign_work(df, len(cents_rows))
    if work is not None and work > _NUMPY_ASSIGN_MIN_WORK:
        # huge rows x k: one vectorized BLAS argmin pass instead of
        # the interpreted coarse+fine folds (assign_clusters_numpy
        # docstring; label column comes back as bigint/string)
        from flox_spark.plans import ensure_parallelism

        return assign_clusters_numpy(
            ensure_parallelism(df), cents_rows, vec_col, out
        ).select(F.col(id_col), F.col(out))
    if coarse_k is None:
        coarse_k = max(1, int(len(cents_rows) ** 0.5))
    # string-labeled centroid tables can't carry the -1 int sentinel:
    # unassignable rows get NULL instead
    sentinel = "-1" if _cid_sql_type(cents_rows) != "string" else "CAST(NULL AS STRING)"
    # the coarse Lloyd pass needs a dense k x dim matrix: drop
    # NULL/ragged/non-finite centroids first (majority dim, ties to
    # the longer length — the numpy kernel's rule).  Semantics match
    # the flat fold, where such centroids yield NULL/NaN distances
    # and never win an argmin.
    import math

    usable = [(i, v) for i, v in cents_rows if v is not None]
    if usable:
        from collections import Counter

        dc = Counter(len(v) for _, v in usable)
        dim = max(dc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        usable = [
            (i, v)
            for i, v in usable
            if len(v) == dim
            and all(x is not None and math.isfinite(x) for x in v)
        ]
    if not usable:
        return df.select(F.col(id_col), F.expr(sentinel).alias(out))
    packed = _packed_two_level(df.sparkSession, usable, coarse_k)
    if not df.isStreaming:
        from flox_spark.plans import ensure_parallelism

        df = ensure_parallelism(df)
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn("__g", _nearest_coarse_gix(vec_col))
        .withColumn(out, _nearest_cid_in_group(vec_col, sentinel=sentinel))
        .select(F.col(id_col), F.col(out))
    )


# work-volume gate for the vectorized numpy assignment: plan-stats
# bytes x k.  The declarative folds are interpreted (HOF
# CodegenFallback) at ~0.3us per element; BLAS does the same
# multiply-adds at memory bandwidth.  Measured calibration points
# (note plan-stats UNDERESTIMATE array frames ~7x — range stats carry
# 8 B/row regardless of the projected vector width): 100k rows x
# k=1024 (stats work 1e9) = 14.7 s flat fold vs ~1.5 s numpy; k=4096
# (4e9) = 54 s vs ~2 s; 6M x k=24000 fold ran >45 MINUTES unfinished.
# The numpy fixed cost (collect + Arrow round trip) is ~1-2 s, so the
# crossover sits near stats-work ~1e8.  Below the gate the fold wins
# on fixed cost AND keeps the bit-exact oracle arithmetic — all
# sf0.001-0.1 correctness-sweep inputs sit orders of magnitude under
# it (embeddings sf0.1: 2e5 bytes x k<=64 ~ 1e7).
_NUMPY_ASSIGN_MIN_WORK = 1 << 28


def _numpy_assign_work(df: DataFrame, k: int) -> int | None:
    from flox_spark.plans.util import estimate_size_bytes

    size = estimate_size_bytes(df)
    return None if size is None else size * max(1, k)


def assign_clusters_numpy(
    df: DataFrame,
    cents_rows: list,
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow-batched ``mapInPandas``
    pass: ``argmin_j ||v - c_j||^2`` via a BLAS matmul
    (``|v|^2 - 2 v.C^T + |c|^2``) against the k x dim centroid matrix
    shipped in the task closure.  All input columns pass through; the
    label column ``out`` is appended.

    This is the 100 TB shape for LARGE work volumes (rows x k x dim):
    the declarative folds (``assign_clusters`` /
    ``assign_clusters_two_level``) are interpreted expression trees —
    right for small/medium work and for bit-exact oracle parity, but
    at web-scale k they pin executor CPU at ~0.3us per multiply-add
    where BLAS runs at memory bandwidth (measured >100x on the 6M-row
    k=24000 SemDeDup leg).  Semantics match the flat fold: ties to
    the lowest cluster id (centroids sorted by id, ``np.argmin``
    takes the first minimum), non-finite/NULL/wrong-length vectors
    and centroids never win, all-invalid rows get the sentinel (-1
    for int labels, NULL for strings).  The ONLY divergence is
    last-ulp: the matmul expansion rounds differently than the
    sequential ``sum((a-b)^2)`` fold, so a row EXACTLY equidistant
    between two centroids at double precision may land in the other
    cell — the same approximation class as the two-level quantizer's
    cell boundaries, documented in SCALE.md."""
    import numpy as np

    from collections import Counter

    rows = sorted(cents_rows, key=lambda r: r[0])
    cids = [r[0] for r in rows]
    int_labels = _cid_sql_type(cents_rows) != "string"
    dim_counts = Counter(len(v) for _, v in rows if v is not None)
    if not dim_counts:
        # every centroid vector is NULL: no assignment can win — emit
        # the all-sentinel frame directly (the batch kernel below would
        # have no dim to build the centroid matrix against)
        from pyspark.sql.types import LongType, StringType

        if int_labels:
            return df.withColumn(out, F.lit(-1).cast(LongType()))
        return df.withColumn(out, F.lit(None).cast(StringType()))
    # majority dim; ties toward the LONGER length — same rule as
    # _seed_cents, so the two kernels agree on 50/50-split ragged input
    dim = max(dim_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
    k = len(rows)
    C = np.full((k, dim), np.nan, dtype=np.float64)
    for j, (_, v) in enumerate(rows):
        if v is not None and len(v) == dim:
            C[j] = [np.nan if x is None else float(x) for x in v]
    valid_c = np.isfinite(C).all(axis=1)
    C0 = np.where(np.isfinite(C), C, 0.0)
    cn = (C0 * C0).sum(axis=1)
    cn[~valid_c] = np.inf
    cid_arr = np.array(cids, dtype=object)
    sentinel = -1 if int_labels else None
    # slice rows so the distance matrix stays ~32 MB per task
    chunk = max(1, (4 << 20) // max(1, k))

    from pyspark.sql.types import LongType, StringType, StructType

    # copy the field list: StructType aliases it and .add() would
    # otherwise append to the INPUT frame's cached schema
    out_schema = StructType(list(df.schema.fields)).add(
        out, LongType() if int_labels else StringType()
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            vecs = pdf[vec_col]
            V = np.zeros((n, dim), dtype=np.float64)
            ok = np.zeros(n, dtype=bool)
            try:
                # fast path: every vector full-length -> one vstack
                M = np.asarray(np.vstack(vecs.to_numpy()), dtype=np.float64)
                if M.shape != (n, dim):
                    raise ValueError("ragged")
                ok = np.isfinite(M).all(axis=1)
                V = np.where(ok[:, None], M, 0.0)
            except Exception:
                for i, v in enumerate(vecs):
                    if v is None or len(v) != dim:
                        continue
                    arr = np.asarray(
                        [np.nan if x is None else float(x) for x in v],
                        dtype=np.float64,
                    )
                    if np.isfinite(arr).all():
                        V[i] = arr
                        ok[i] = True
            labels = np.full(n, sentinel, dtype=object)
            if ok.any() and valid_c.any():
                idx_ok = np.flatnonzero(ok)
                for s in range(0, len(idx_ok), chunk):
                    sl = idx_ok[s : s + chunk]
                    Vo = V[sl]
                    d = (
                        (Vo * Vo).sum(axis=1)[:, None]
                        - 2.0 * (Vo @ C0.T)
                        + cn[None, :]
                    )
                    labels[sl] = cid_arr[np.argmin(d, axis=1)]
            pdf = pdf.copy()
            pdf[out] = labels
            yield pdf

    return df.mapInPandas(run, out_schema)
