"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Query shapes mirror the reference's ASV workload classes (BASELINE.md):
few-groups/many-rows (q1_sum), high-cardinality groupers (prod_order,
multiby), resampling/climatology-style derived keys (doy_mean),
quantiles, windowed scans.  Large results are forced with a noop sink
(no driver collect) — the 100 TB posture.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from flox_spark.session import get_spark

BENCH_QUERIES = [
    "sum",            # TPC-H Q1 shape: 600k rows -> 6 groups
    "mean",
    "var",
    "prod",           # high-card: one group per order (~150k at sf0.1)
    "quantile",       # exact p90
    "median",
    "multiby_highcard",
    "highcard_random",  # RandomBigArray shape: 5000+ uniform groups
    "dayofyear_mean",  # climatology shape (ERA5 benchmarks)
    "monthhour_sum",   # compound derived-time grouper (ERA5MonthHour)
    "binned_count",
    "argmax",
    "first",
    "mode",
    "scan_cumsum",    # window scan over events
    "scan_ffill",
    "q1_multi",       # 6 aggregates, one pass
    "dedup_exact",    # pipeline ops over documents/embeddings
    "minhash_pairs",
    "text_quality",
    "simhash",
    "ann_topk",
    "ivf_topk",
    "multimodal_features",
]


def force(df) -> int:
    """Evaluate fully without driver collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("flox_spark_bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers once with the cheapest query
    force(qs["sum"](spark, sf_dir))

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spark.catalog.clearCache()  # operators persist shared frames; isolate queries
        t0 = time.perf_counter()
        try:
            force(qs[name](spark, sf_dir))
            times[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # never lose the whole bench to one query
            print(f"bench query {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            times[name] = -1.0

    total = round(sum(t for t in times.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
