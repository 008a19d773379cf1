"""Quick per-query timing at sf0.1 (spark best-of-2 + duckdb), for
iterating on flagged queries without the full bench."""
import sys, time, os
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod
from flox_spark.session import get_spark

names = sys.argv[1:] or ["semdedup_pairs"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("quick_time")
qs = entrymod.queries()

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(qs["sum"](spark, sf_dir))  # warm
floor_t = None
for _ in range(4):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    force(qs["sum"](spark, sf_dir))
    dt = time.perf_counter() - t0
    floor_t = dt if floor_t is None else min(floor_t, dt)

import duckdb
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracles = entrymod.oracle_sql()
con.sql(oracles["sum"]).fetchall()

for name in names:
    best = None
    for _ in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(qs[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    dbest = None
    if name in oracles:
        for _ in range(4):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            dbest = dt if dbest is None else min(dbest, dt)
    net = (best - floor_t) / dbest if dbest else None
    print(f"{name:22s} spark={best:.3f}s duck={dbest if dbest else -1:.3f}s floor={floor_t:.3f} net={net if net is not None else -1:.2f}")
