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
    default parallelism (i.e. the scan undershoots the cluster)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
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
