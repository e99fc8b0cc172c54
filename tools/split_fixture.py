#!/usr/bin/env python3
"""Deployment-representative layout proof, committed as a runnable tool
(BASELINE rounds 12-13: the q09/q79 "weak cell" findings).

The driver's sf0.001/sf0.01/sf0.1 fixtures are each ONE parquet file
with ONE row group. Neither engine can split a single row group, so
every scan of such a table serializes on one core -- window (q09) and
corpus-scan (q79) cells then measure single-core throughput, not the
plan. A real lake writes many row groups/files; rewriting the probed
tables into an N-file layout restores the scan parallelism both
engines are designed around (q09 read 1.8x faster on an 8-split
layout, both engines re-measured -- BASELINE round 13).

This tool materializes a probe dir: the named tables rewritten as
N-file directories (row_number round-robin, stable row content), every
other table symlinked from the source dir. Both engines read the
result transparently (Spark: dir scan; DuckDB: duck_bench.py's glob).

Usage:
  python3 tools/split_fixture.py [--src /root/testdata/sf0.1] \
      [--out /tmp/sf01_split] [--splits 8] [--tables events,documents,embeddings,lineitem]

Then probe each engine on the rewritten layout (min-of-5, fresh JVM):
  SPARK_GRAFT_SF_DIR=/tmp/sf01_split SPARK_GRAFT_BENCH_ONLY=q09 \
      SPARK_GRAFT_BENCH_REPS=5 java $OPENS -Xmx8g \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
  # DuckDB twin (needs a Verify dump's oracle_sql.json):
  python3 tools/duck_bench.py /tmp/sf01_split /tmp/verify_out/oracle_sql.json q09_running_total 5
"""
import argparse
import os
import shutil

import duckdb

ALL_TABLES = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()

ap = argparse.ArgumentParser()
ap.add_argument("--src", default="/root/testdata/sf0.1")
ap.add_argument("--out", default="/tmp/sf01_split")
ap.add_argument("--splits", type=int, default=8)
ap.add_argument("--tables", default="events,documents,embeddings,lineitem",
                help="comma list of tables to rewrite; the rest are symlinked")
args = ap.parse_args()

rewrite = [t.strip() for t in args.tables.split(",") if t.strip()]
os.makedirs(args.out, exist_ok=True)
con = duckdb.connect()

for t in ALL_TABLES:
    src = f"{args.src}/{t}.parquet"
    dst = f"{args.out}/{t}.parquet"
    if not os.path.exists(src):
        continue
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    elif os.path.lexists(dst):
        os.remove(dst)
    if t not in rewrite:
        os.symlink(os.path.abspath(src), dst)
        continue
    # round-robin by row_number: every split holds every Nth row, so
    # content (and any engine's answer) is unchanged -- only the
    # physical split count moves
    os.makedirs(dst, exist_ok=True)
    con.execute("CREATE OR REPLACE TEMP TABLE _split AS "
                f"SELECT *, row_number() OVER () AS _rn FROM read_parquet('{src}')")
    for s in range(args.splits):
        con.execute(
            f"COPY (SELECT * EXCLUDE (_rn) FROM _split WHERE _rn % {args.splits} = {s}) "
            f"TO '{dst}/part-{s:05d}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/*.parquet')").fetchone()[0]
    n0 = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    assert n == n0, f"{t}: row count changed {n0} -> {n}"
    print(f"{t}: {n} rows -> {args.splits} files at {dst}")

print(f"probe dir ready: {args.out}")
