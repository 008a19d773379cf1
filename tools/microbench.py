"""Time a subset of the bench queries (Spark + DuckDB denominator)
without running the whole 50-query suite.  Usage:

    python tools/microbench.py simhash minhash_bands [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from flox_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    dirs = [a for a in sys.argv[1:] if a.startswith("/")]
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.1"
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    spark = get_spark("microbench")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs["sum"](spark, sf_dir))  # warm

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    out = {}
    for name in names:
        best = None
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        dbest = None
        if name in oracles:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                con.sql(oracles[name]).fetchall()
                dt = time.perf_counter() - t0
                dbest = dt if dbest is None else min(dbest, dt)
        out[name] = {
            "spark": round(best, 3),
            "duck": round(dbest, 3) if dbest else None,
            "ratio": round(best / dbest, 2) if dbest else None,
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
