"""Bucketed range (interval) join.

Joins points to intervals — ``left.x BETWEEN right.lo AND right.hi``
— a shape the reference never needed (no joins at all, SURVEY §2.5)
but every events/dimension pipeline does (IP ranges, price bands,
validity windows, genomic intervals).

Why not a plain non-equi join: Spark plans ``l JOIN r ON x >= lo AND
x <= hi`` with no equi-key as BroadcastNestedLoopJoin (O(|L|*|R|)
comparisons; a cartesian if r doesn't broadcast).  Open-source Spark
has no range-join optimization, so at 100 TB that plan is an outage.

The scalable formulation is the classic bucketing trick: quantize the
number line into fixed-width buckets; a point joins bucket
``floor(x/w)``, an interval is exploded to every bucket it overlaps
(``sequence(floor(lo/w), floor(hi/w))``).  The join becomes an
EQUI-join on the bucket id — hash-partitionable, AQE-skew-splittable
— followed by the exact BETWEEN as a post-filter.  Cost:
|R| * avg_interval_width/w extra right rows; pick ``bucket_width``
near the typical interval width so the expansion stays ~1-2x.

Matches the exact semantics of the naive join (equality-tested and
DuckDB-oracled): inclusive on both ends, NULL x/lo/hi never match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    x: str,
    lo: str,
    hi: str,
    bucket_width: float,
    how: str = "inner",
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join each left row to the right rows whose ``[lo, hi]``
    interval contains ``left.x`` (inclusive).

    ``bucket_width`` quantizes the join: every interval is replicated
    to ``(hi-lo)/bucket_width + 1`` buckets, so choose it near the
    typical interval width.  ``extra_on``: additional equi-join keys
    (joined exactly, part of the bucket shuffle key).  ``how``:
    ``inner`` or ``left`` (unmatched left rows keep NULL right
    columns).  NB ``how="left"`` evaluates the join twice (inner +
    anti for the unmatched rows); materialize the inputs upstream if
    they are expensive pipelines.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    extra = list(extra_on or [])
    clash = (set(right.columns) - set(extra)) & set(left.columns)
    if clash:
        raise ValueError(
            f"overlapping non-key columns: {sorted(clash)}; rename before joining"
        )
    # Integral x/lo/hi with an integral width bucket via EXACT long
    # floor-div: the double path rounds past 2^53 (epoch-nanosecond
    # int64 domains), which can place a point near a bucket boundary
    # in a bucket the interval's explosion doesn't cover — a silently
    # DROPPED match the exact BETWEEN post-filter can never recover.
    # The double path remains for fractional widths / float domains.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    _INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
    all_integral = all(
        isinstance(df.schema[c].dataType, _INTEGRAL)
        for df, c in ((left, x), (right, lo), (right, hi))
    )
    w_int = int(bucket_width)
    use_long = all_integral and float(w_int) == float(bucket_width) and w_int > 0
    w = float(bucket_width)

    def bucket(name: str) -> Column:
        if use_long:
            # floor-div toward -inf in pure long arithmetic: SQL DIV
            # truncates toward zero and % follows the dividend's sign,
            # so a negative dividend with a nonzero remainder needs -1
            q = f"CAST(`{name}` AS BIGINT)"
            return F.expr(
                f"CASE WHEN {q} % {w_int} < 0 THEN ({q} DIV {w_int}) - 1 "
                f"ELSE {q} DIV {w_int} END"
            )
        return F.floor(F.col(name).cast("double") / F.lit(w)).cast("long")

    l_b = left.withColumn("__bkt", bucket(x))
    r_b = (
        right.filter(F.col(lo).isNotNull() & F.col(hi).isNotNull() & (F.col(lo) <= F.col(hi)))
        .withColumn(
            "__bkt",
            F.explode(F.sequence(bucket(lo), bucket(hi))),
        )
    )
    cond = (
        (l_b["__bkt"] == r_b["__bkt"])
        & (l_b[x] >= r_b[lo])
        & (l_b[x] <= r_b[hi])
    )
    for k in extra:
        cond = cond & (l_b[k] == r_b[k])
    joined = l_b.join(r_b, cond, "inner").select(
        *[l_b[c] for c in left.columns],
        *[r_b[c] for c in right.columns if c not in extra],
    )
    if how == "inner":
        return joined
    # left join: matched rows from the bucketed inner join + unmatched
    # left rows (anti join on the same condition) with NULL right cols
    unmatched = l_b.join(r_b, cond, "left_anti").select(
        *[F.col(c) for c in left.columns],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
            if c not in extra
        ],
    )
    return joined.unionByName(unmatched)
