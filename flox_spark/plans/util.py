"""Physical-plan helpers.

``ensure_parallelism``: CPU-bound projections (md5/sha hashing,
shingling, feature extraction) inherit the scan's partitioning.  A
small input file arrives as ONE partition, serializing all compute on
one core — at 100 TB the scan has thousands of splits and this is a
no-op, but a compute-heavy operator over a modest table (the classic
"5 GB of docs, 5 minutes of hashing" case) needs an explicit fan-out.
The round-robin repartition costs one shuffle of the input rows and
buys full-cluster parallelism for everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Catalyst's stats fall back to spark.sql.defaultSizeInBytes
# (Long.MaxValue) for sources it can't estimate — treat anything in
# that region as "unknown", not "huge"
_UNKNOWN_SIZE = 1 << 60

_UNIT = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_bytes(raw: str, default: int) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m',
    '128MB', '1g') to bytes; ``default`` on anything unparseable."""
    s = str(raw).strip().lower()
    if s.endswith("b") and not s[:-1].isdigit():
        s = s[:-1]  # strip the 'b' of kb/mb/gb/tb
    if s and s[-1] in _UNIT and s[:-1].isdigit():
        return int(s[:-1]) * _UNIT[s[-1]]
    if s.isdigit():
        return int(s)
    return default


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the frame has fewer partitions than the
    default parallelism (i.e. the scan undershoots the cluster).

    The partition count is ESTIMATED from the optimized plan's size
    statistics vs ``spark.sql.files.maxPartitionBytes`` — planning-time
    only.  When the stats are Catalyst's conservative unknown-source
    sentinel (defaultSizeInBytes = Long.MaxValue, reported by
    LocalRelations after joins and RDD-backed frames), fall back to
    ``df.rdd.getNumPartitions()`` — a huge fake size would otherwise
    read as "already parallel" and silently skip the fan-out."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if size >= _UNKNOWN_SIZE:
            raise ValueError("stats unavailable (conservative sentinel)")
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        max_bytes = parse_bytes(raw, 128 << 20)
        est_parts = max(1, size // max(1, max_bytes))
    except Exception:
        est_parts = df.rdd.getNumPartitions()
    if est_parts < target:
        return df.repartition(target)
    return df


def materialize_shared(df: DataFrame) -> DataFrame:
    """Materialize a frame consumed by multiple plan branches (the
    self-join diamond): without this, Spark recomputes the whole
    subtree per branch.  Strategy via OPTIONS['diamond_materialize']:
    local_checkpoint (fast, auto-GC'd, not fault-tolerant) | persist
    (lineage kept, accumulates in cache) | none (recompute)."""
    from flox_spark.options import OPTIONS

    mode = OPTIONS["diamond_materialize"]
    if mode == "local_checkpoint":
        return df.localCheckpoint(eager=False)
    if mode == "persist":
        return df.persist()
    return df
