from flox_spark.plans.util import ensure_parallelism

__all__ = ["ensure_parallelism"]
