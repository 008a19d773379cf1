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


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the frame has fewer partitions than the
    default parallelism (i.e. the scan undershoots the cluster).

    The partition count is ESTIMATED from the optimized plan's size
    statistics vs ``spark.sql.files.maxPartitionBytes`` — planning-time
    only; ``df.rdd.getNumPartitions()`` would force a full plan->RDD
    conversion per call and is kept only as the fallback."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20)))
        max_bytes = int(raw.rstrip("bB")) if raw.rstrip("bB").isdigit() else 128 << 20
        est_parts = max(1, size // max(1, max_bytes))
    except Exception:  # pragma: no cover - e.g. stats unavailable
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
