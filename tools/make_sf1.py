#!/usr/bin/env python3
"""Dev-side generator for a sf1-scale dataset (10x sf0.1) used ONLY for
the floor-amortization measurements in BASELINE.md — correctness always
runs against the driver-provided testdata.

Scaling model (per table):
- lineitem/orders/customer: 10 key-shifted copies (orderkey/custkey
  shifted by copy * max), preserving join fan-out and per-key row
  counts — the realistic way row count grows 10x (more orders, not
  longer orders).
- nation/region: unchanged (dimensions do not scale with fact data).
- documents: 10 doc_id-shifted copies, text unchanged (q49's gram
  joins scale linearly in copies either way).
- embeddings: 10 vec_id-shifted copies with the vector CYCLICALLY
  ROTATED by the copy index — identical copies would make every LSH
  bucket hold 10 near-identical vectors and grow candidate PAIRS
  ~100x; rotation keeps norms/distributions while decorrelating dots,
  so candidate counts scale ~linearly like a real corpus.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# split counts grow with the copy factor so per-file size stays
# roughly constant (sf1 keeps its 16/8 layout; sf10 gets 160/80)
DOC_SPLITS = max(16, 16 * COPIES // 10)
EMB_SPLITS = max(8, 8 * COPIES // 10)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def copy_out(sql, t, splits=1):
    """splits>1 writes {t}.parquet as a DIRECTORY of part files (round-
    robin by row_number) — a single ~1 MB file is below Spark's split
    granularity, so every scan of that table serializes on one core
    and text-heavy stages (q49/q66/q72) measure one-core throughput
    instead of the plan. Spark reads the dir transparently; DuckDB
    reads it via the glob in duck_bench.py."""
    import shutil
    p = f"{DST}/{t}.parquet"
    if os.path.isdir(p):
        shutil.rmtree(p)
    elif os.path.exists(p):
        os.remove(p)
    if splits <= 1:
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    else:
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        con.execute(f"CREATE OR REPLACE TEMP TABLE _split AS "
                    f"SELECT *, row_number() OVER () AS _rn FROM ({sql})")
        for s in range(splits):
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn) FROM _split WHERE _rn % {splits} = {s}) "
                f"TO '{DST}/{t}.parquet/part-{s:05d}.parquet' (FORMAT PARQUET)")
        con.execute("DROP TABLE _split")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet"
        + ("/*.parquet" if splits > 1 else "") + "')").fetchone()[0]
    print(f"{t}: {n} rows ({max(splits,1)} file(s))")

okey_max, ckey_max = con.execute(
    f"SELECT (SELECT max(o_orderkey)+1 FROM {src('orders')}),"
    f" (SELECT max(c_custkey)+1 FROM {src('customer')})").fetchone()

copy_out(f"""
  SELECT l_orderkey + i * {okey_max} AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM {src('lineitem')}, range({COPIES}) t(i)""", "lineitem")

copy_out(f"""
  SELECT o_orderkey + i * {okey_max} AS o_orderkey,
         o_custkey + i * {ckey_max} AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey)
  FROM {src('orders')}, range({COPIES}) t(i)""", "orders")

copy_out(f"""
  SELECT c_custkey + i * {ckey_max} AS c_custkey,
         * EXCLUDE (c_custkey)
  FROM {src('customer')}, range({COPIES}) t(i)""", "customer")

# supplier/part stay unscaled like nation/region: lineitem copies keep
# their l_suppkey/l_partkey, so "10x the orders over the same catalog"
# is the consistent scaling story (and the star-join dims stay
# broadcast-sized, as they would at any SF).
for t in ("nation", "region", "supplier", "part"):
    copy_out(f"SELECT * FROM {src(t)}", t)

# events scales as 10x the USERS over the same month (event_id/user_id
# shifted per copy): per-user session shapes stay constant, which is
# the realistic way an event stream grows. Written via pyarrow, not
# DuckDB, to preserve the table's nanosecond-timestamp physicality
# (the engine reads ts as int64 nanos via nanosAsLong).
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{SRC}/events.parquet")
eid_max = pc.max(ev.column("event_id")).as_py() + 1
uid_max = pc.max(ev.column("user_id")).as_py() + 1
chunks = []
for i in range(COPIES):
    t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                      pc.add(ev.column("event_id"), i * eid_max))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), i * uid_max))
    chunks.append(t)
pq.write_table(pa.concat_tables(chunks), f"{DST}/events.parquet")
print(f"events: {sum(c.num_rows for c in chunks)} rows")

doc_max, = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()
# Copies within a GROUP of 10 keep the source text verbatim — that is
# the near-dup clique a real corpus has. Every further group of 10 is
# CAESAR-SHIFTED (letters rotated by the group number), so different
# groups share no character windows and LSH clique size stays ~10 at
# EVERY scale factor. Without this, COPIES=100 makes all 100 copies
# of a doc collide in one bucket and every pair-bounded query
# (q31/q35/q55/q60) goes QUADRATIC in the scale factor — a fixture
# artifact, not a workload property (observed as task OOMs at sf10).
# A letter bijection, not a word-suffix salt, because it preserves
# text length and the window-sharing structure BETWEEN docs exactly
# (which docs share which shingles is isomorphic across groups);
# suffixing digits measurably inflated cross-doc minhash collisions
# ~5× inside salted groups. COPIES <= 10 (the sf1 layout) takes the
# verbatim branch for every copy, so sf1 is unchanged.
ALPHA = "abcdefghijklmnopqrstuvwxyz"
# Only 25 distinct non-identity rotations exist: group 26 would wrap
# to the identity shift and recreate verbatim mega-dup cliques that
# span groups (the exact artifact this scheme exists to prevent).
# Fail loudly instead of silently degrading past COPIES=260.
assert (COPIES + 9) // 10 <= 26, (
    f"COPIES={COPIES}: more than 26 copy groups exhausts the 25 "
    "distinct caesar shifts; pick a different salt scheme past sf26")
shift_case = "CASE i // 10 WHEN 0 THEN text " + " ".join(
    f"WHEN {g} THEN translate(text, '{ALPHA}', '{ALPHA[g:] + ALPHA[:g]}')"
    for g in range(1, (COPIES + 9) // 10)) + " END"
copy_out(f"""
  SELECT doc_id + i * {doc_max} AS doc_id,
         {shift_case} AS text,
         * EXCLUDE (doc_id, text)
  FROM {src('documents')}, range({COPIES}) t(i)""",
  "documents", splits=DOC_SPLITS)

vec_max, dim = con.execute(
    f"SELECT max(vec_id)+1, max(len(embedding)) FROM {src('embeddings')}").fetchone()
# Past one full rotation cycle (copies >= dim) the rotations repeat;
# negate those wrapped copies so copy i and copy i+dim never collide
# in an LSH bucket (negation flips every hyperplane sign — complement
# bucket — while preserving norms). COPIES <= dim is unaffected.
copy_out(f"""
  SELECT vec_id + i * {vec_max} AS vec_id,
         CAST(list_transform(
           embedding[(i % {dim}) + 1 :] || embedding[: (i % {dim})],
           x -> x * (CASE WHEN (i // {dim}) % 2 = 1 THEN -1 ELSE 1 END))
           AS FLOAT[]) AS embedding,
         * EXCLUDE (vec_id, embedding)
  FROM {src('embeddings')}, range({COPIES}) t(i)""", "embeddings", splits=EMB_SPLITS)

print("done:", DST)
