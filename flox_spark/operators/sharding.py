"""Deterministic shard assignment for training-data export.

Beyond the reference's surface (SURVEY §2.5): a 100 TB corpus ships
to trainers as a fixed set of shards, and the assignment must be a
pure function of (row id, seed) — reproducible across runs, Spark
versions, and partitionings, exactly like ``operators/sampling.py``'s
hash-gate.  A global ``repartition(n)`` round-robin would NOT be:
its result depends on the input partitioning.

Two hash flavors, same pattern as the dedup stack:

- ``md5`` (default): first 8 hex digits of ``md5(id || ':' || seed)``
  mod n — bit-for-bit reproducible in any engine with md5 (the DuckDB
  oracle runs the identical formula).
- ``xxhash64``: Spark's native 64-bit hash — ~10x cheaper per row,
  the production choice when cross-engine parity is not needed.

Scale shape: assignment is a pure projection (codegen, zero
shuffles).  ``write_shards`` then does ONE hash exchange on the shard
id (``repartitionByRange`` would sort; hash is enough) so each shard
lands in its own output directory via ``partitionBy`` with exactly
one task writing per shard — no small-files explosion, no global
sort.  ``shard_stats`` is one map-side-combined aggregate to verify
balance before an expensive export.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_shards", "shard_stats", "write_shards"]

_HEX_DIGITS = 8


def _shard_id(id_col: Column, n_shards: int, seed: str, hash_impl: str) -> Column:
    if hash_impl == "xxhash64":
        return F.pmod(F.xxhash64(id_col.cast("string"), F.lit(seed)), F.lit(n_shards))
    if hash_impl == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat(id_col.cast("string"), F.lit(":" + seed))),
                1,
                _HEX_DIGITS,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(n_shards))
    raise ValueError(f"hash_impl must be md5|xxhash64, got {hash_impl!r}")


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
    out: str = "shard",
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Add a deterministic shard id in ``[0, n_shards)`` — a pure
    function of (id, seed), independent of partitioning and row
    order.  Pure projection; zero shuffles."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        out, _shard_id(F.col(id_col), n_shards, seed, hash_impl).cast("int")
    )


def shard_stats(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    size_col: str | None = None,
    seed: str = "0",
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Per-shard row count (and total ``size_col`` when given) —
    the balance check before an export.  One map-side-combined
    aggregate over n_shards groups, right-joined against the full
    shard range so EMPTY shards report 0 explicitly (an absent row
    would hide exactly the imbalance signal this check exists to
    surface)."""
    sharded = assign_shards(df, n_shards, id_col, seed, "shard", hash_impl)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    got = sharded.groupBy("shard").agg(*aggs)
    grid = df.sparkSession.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    out = grid.join(got, "shard", "left").withColumn(
        "n_rows", F.coalesce(F.col("n_rows"), F.lit(0))
    )
    if size_col is not None:
        out = out.withColumn("total_size", F.coalesce(F.col("total_size"), F.lit(0)))
    return out.orderBy("shard")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
    hash_impl: str = "xxhash64",
    format: str = "parquet",
) -> None:
    """Export to ``path/shard=K/`` directories, one writer task per
    shard: a single hash exchange on the shard id co-locates each
    shard's rows, so ``partitionBy`` emits exactly one file per shard
    instead of (tasks x shards) fragments."""
    sharded = assign_shards(df, n_shards, id_col, seed, "shard", hash_impl)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard")
        .format(format)
        .mode("overwrite")
        .save(path)
    )
