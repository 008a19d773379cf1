"""Sources: parquet readers with schema normalization.

The reference has no sources at all (data arrives as in-memory
arrays, SURVEY §2.5); in Spark the source layer is ``spark.read`` and
the engine composes on any DataFrame.  The one real-world wrinkle
handled here: parquet files with TIMESTAMP(NANOS) columns (written by
pandas/arrow with ns precision), which Spark's vectorized reader
rejects.  We flip the legacy nanos-as-long switch and rebuild a
microsecond timestamp column — a pure projection, fully codegen'd,
no data-size cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with TIMESTAMP(NANOS) tolerance: nano
    columns come back as LongType named as before; callers that need
    them as timestamps should use ``nanos_to_ts``.  The legacy switch
    is set proactively — it only affects files that would otherwise
    fail with PARQUET_TYPE_ILLEGAL, and avoids a doomed first job."""
    try:
        spark.conf.set(_NANOS_CONF, "true")
        # date-part extraction must agree with naive-timestamp oracles
        # regardless of the host session's default zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down: fall through, plain read may still work
    return spark.read.parquet(path)


def nanos_to_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize a timestamp column to microsecond TimestampType in
    place, from either on-disk representation: int64 nanos (from
    nanosAsLong) or TIMESTAMP_NTZ (parquet micros with
    isAdjustedToUTC=false, which Spark 4 infers as NTZ).  The NTZ cast
    reads the wall time in the session zone — pinned UTC by
    ``read_parquet`` — matching DuckDB's naive reading of the file."""
    types = dict(df.dtypes)
    for c in cols:
        if types.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif types.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# columns per test table that are nano-timestamps on disk
_TS_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's test tables with timestamps usable."""
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    return nanos_to_ts(df, *_TS_COLS.get(name, ()))


def read_stream_table(
    spark: SparkSession,
    path: str,
    schema=None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a growing directory of files — the
    unbounded twin of ``read_parquet`` for the streaming operators
    (``flox_spark.streaming``).  Structured Streaming requires an
    explicit schema; by default it is inferred once from a batch read
    of whatever files already exist (with the same TIMESTAMP(NANOS)
    tolerance).  ``max_files_per_trigger`` bounds micro-batch size."""
    if schema is None:
        schema = read_parquet(spark, path).schema
    r = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
    cluster_by: list[str] | None = None,
    dynamic_overwrite: bool = False,
) -> None:
    """Sink: (optionally hive-partitioned) columnar write.  Partition
    columns become directory prefixes -> downstream reads get
    partition pruning for free.  ``max_records_per_file`` bounds file
    size without an extra repartition pass.

    Lakehouse-style knobs (the Delta/Iceberg table-layout levers,
    expressed on plain files):

    - ``cluster_by``: sort rows WITHIN each write task on these
      columns before writing (``sortWithinPartitions`` — no extra
      exchange).  Parquet row-group min/max statistics then become
      selective for point/range predicates on those columns — the
      poor man's Z-ORDER/OPTIMIZE clustering, and the single biggest
      read-side lever after partitioning at 100 TB.
    - ``dynamic_overwrite``: with ``mode="overwrite"`` +
      ``partition_by``, replace ONLY the partitions present in ``df``
      instead of truncating the whole table root (Spark's
      ``partitionOverwriteMode=dynamic`` — the idempotent
      backfill/refresh pattern; static overwrite of a 100 TB table to
      refresh one day is an outage).  Session conf is restored after
      the write.
    """
    spark = df.sparkSession
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    w = df.write.mode(mode).format(fmt)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = None
    if dynamic_overwrite:
        try:
            old = spark.conf.get(conf_key, "STATIC")
            spark.conf.set(conf_key, "dynamic")
        except Exception:
            old = None
    try:
        w.save(path)
    finally:
        if old is not None:
            spark.conf.set(conf_key, old)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 << 20,
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
    staging_suffix: str = "__compacting",
) -> int:
    """Small-file compaction: rewrite a file table so each output file
    is ~``target_file_bytes`` (the OPTIMIZE/rewrite_data_files analog
    for plain parquet).  Small files are the classic slow killer of a
    100 TB lake — footer-per-file planning cost and task-per-file
    scheduling grow with file COUNT, not bytes.

    Mechanics: the output file count is derived from the scan's
    plan-size statistics (no data pass); the rewrite is one
    round-robin exchange (plus the optional ``cluster_by`` in-task
    sort) into a STAGING directory, then a filesystem-level swap
    (delete original, rename staging) — never a read-and-overwrite of
    the same path (undefined in Spark) and never a cluster-memory
    materialization of the table.  The swap is not transactional
    (delete..rename window); layer a table format (Delta/Iceberg) on
    top when concurrent readers need snapshot isolation.  Returns the
    target file count."""
    from flox_spark.plans.util import estimate_size_bytes

    df = spark.read.format(fmt).load(path)
    size = estimate_size_bytes(df)
    n_files = max(1, -(-(size or 0) // max(1, target_file_bytes)))
    out = df.repartition(n_files)
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    staging = path.rstrip("/") + staging_suffix
    out.write.mode("overwrite").format(fmt).save(staging)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(path).getFileSystem(hconf)
    fs.delete(HPath(path), True)
    fs.rename(HPath(staging), HPath(path))
    return n_files


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Sink: bucketed managed table — pre-shuffles on the bucket keys
    so later joins/aggregations on those keys skip their shuffle (the
    durable analog of flox's rechunk_for_blockwise,
    flox/rechunk.py:158-223: co-locate group members once, reuse many
    times)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


_TABLE_FORMATS = {
    # connector-gated format -> enabling package hint.  Availability
    # is probed via DataSource.lookupDataSource — the same resolution
    # the write itself would do, so the gate can never disagree with
    # the engine (a bare Class.forName marker check can: stock Spark
    # ships avro CLASSES without registering the data source)
    "delta": (
        "io.delta:delta-spark_2.13 (+ spark.sql.extensions="
        "io.delta.sql.DeltaSparkSessionExtension)"
    ),
    "iceberg": (
        "org.apache.iceberg:iceberg-spark-runtime (+ a configured "
        "spark.sql.catalog.* Iceberg catalog)"
    ),
    "avro": (
        "org.apache.spark:spark-avro_2.13 (external module, not "
        "bundled with Spark)"
    ),
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    mode: str = "overwrite",
    dynamic_overwrite: bool = False,
    **options: str,
) -> None:
    """Format-dispatching sink: ``parquet``/``orc``/``csv``/``json``
    natively, ``delta``/``iceberg`` when their connector jars are on
    the session's classpath.  The table-format check happens BEFORE
    the write job so a missing connector fails fast with the enabling
    package named, instead of a ClassNotFoundException from inside a
    launched job.  Layout knobs are shared with ``write_partitioned``
    (clustered in-task sort, dynamic partition overwrite)."""
    fmt_l = fmt.lower()
    if fmt_l in _TABLE_FORMATS:
        hint = _TABLE_FORMATS[fmt_l]
        s = df.sparkSession
        try:
            s._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                fmt_l, s._jsparkSession.sessionState().conf()
            )
        except Exception:
            raise RuntimeError(
                f"table format {fmt!r} needs its connector on the Spark "
                f"classpath: add {hint}. This session does not have it."
            ) from None
    spark = df.sparkSession
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    w = df.write.mode(mode).format(fmt_l)
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = None
    if dynamic_overwrite:
        try:
            old = spark.conf.get(conf_key, "STATIC")
            spark.conf.set(conf_key, "dynamic")
        except Exception:
            old = None
    try:
        w.save(path)
    finally:
        if old is not None:
            spark.conf.set(conf_key, old)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    ts_cols: tuple = (),
    ts_format: str | None = None,
) -> DataFrame:
    """CSV source with the same posture as ``read_parquet``: explicit
    schema strongly preferred (schema inference is a full extra pass
    over 100 TB), UTC session zone, and declared timestamp columns
    parsed via ``try_to_timestamp`` so bad rows become NULL rather
    than failing the scan (plain ``to_timestamp`` throws under
    Spark 4's ANSI default)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    df = r.csv(path)
    for c in ts_cols:
        df = df.withColumn(
            c,
            F.try_to_timestamp(F.col(c), F.lit(ts_format))
            if ts_format
            else F.try_to_timestamp(F.col(c)),
        )
    return df


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines source (``multiline=True`` for whole-file JSON).
    Explicit schema strongly preferred for the same inference-pass
    reason; corrupt records surface in Spark's default
    ``_corrupt_record`` column instead of failing the scan."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if multiline:
        r = r.option("multiLine", "true")
    return r.json(path)
