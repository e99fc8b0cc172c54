#!/usr/bin/env python3
"""Dev-side DuckDB timing for the BASELINE.md comparisons: run selected
oracle queries (from a Verify dump's oracle_sql.json) over a given
scale-factor directory, min-of-N wall-clock each, 32 threads.

  python3 tools/duck_bench.py <sfdir> <oracle_sql.json> [q04_star_join,...] [reps]
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

sfdir = sys.argv[1]
oracles = json.load(open(sys.argv[2]))
# q59's oracle reads the Spark-landed /tmp parquet, not sfdir — only
# meaningful right after the Spark carrier ran; excluded from "all"
names = (sys.argv[3].split(",") if len(sys.argv) > 3 and sys.argv[3] != "all"
         else sorted(n for n in oracles if n != "q59_ingest_landing"))
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # multi-file table (make_sf1.py splits>1)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

out = {}
errs = {}
for name in names:
    best = None
    try:
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
    except Exception as e:  # a DNF/OOM oracle must not kill the sweep
        errs[name] = str(e).splitlines()[0][:200]
        print(f"{name}: ERROR {errs[name]}", flush=True)
        continue
    out[name] = round(best, 4)
    print(f"{name}: {best:.3f}s", flush=True)
print(json.dumps({"sf": sfdir, "queries": out, "errors": errs,
                  "total": round(sum(out.values()), 3)}))
