"""SparkSession factory with the engine's recommended scale posture:
AQE on (runtime re-plan, skew-join handling), Arrow on (fast
pandas/UDF interchange), sensible shuffle parallelism for local mode.
On a real cluster these come from spark-defaults; this helper is for
tests, bench.py and the driver entry.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "flox_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size when coalescing instead
        # of maximizing parallelism: Spark's own docs recommend false
        # — small aggregates collapse to few tasks (less scheduling
        # overhead), huge shuffles still split by size
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
