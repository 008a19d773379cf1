from flox_spark.plans.util import (
    ensure_parallelism,
    estimate_size_bytes,
    recommend_shuffle_partitions,
    tuned_shuffle,
)

__all__ = [
    "ensure_parallelism",
    "estimate_size_bytes",
    "recommend_shuffle_partitions",
    "tuned_shuffle",
]
