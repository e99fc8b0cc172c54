#!/usr/bin/env python3
"""Dev-side stand-in for the driver's correctness gate: load each query's
parquet dump from graft.Verify, run the corresponding oracle SQL in
DuckDB over the same scale-factor tables, and compare values exactly.

Comparison model (conservative superset of the driver's): columns sorted
by name, rows sorted by all columns, values must match exactly (doubles
bit-for-bit after float64 normalization, timestamps normalized to us) —
AND logical types must match (DuckDB DESCRIBE vs the parquet arrow
schema, modulo the documented timestamp normalization). The type gate
exists because pandas coercion once hid a HUGEINT-vs-BIGINT skew
(uncast SUM(BIGINT) in an oracle) that the driver's type-aware hash
caught: values identical, types not (round 15, q93/q94).
"""
import json, sys, glob, os, re
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq

# DuckDB logical type -> acceptable arrow types in the Spark dump.
# Anything NOT in this table (HUGEINT above all) is a convention
# violation and fails loudly.
DUCK2ARROW = {
    "BIGINT": {"int64"}, "INTEGER": {"int32"}, "SMALLINT": {"int16"},
    "TINYINT": {"int8"}, "DOUBLE": {"double"}, "FLOAT": {"float"},
    "BOOLEAN": {"bool"}, "VARCHAR": {"string", "large_string"},
    "BLOB": {"binary", "large_binary"}, "DATE": {"date32[day]"},
}

def type_mismatches(con, sql, parquet_file):
    """Compare DuckDB's result types against the Spark dump's arrow
    schema; returns a list of human-readable mismatch strings."""
    duck = {name: dtype for name, dtype, *_ in
            con.execute(f"DESCRIBE {sql}").fetchall()}
    arrow = {f.name: str(f.type) for f in pq.read_schema(parquet_file)}
    bad = []
    for c in sorted(set(duck) & set(arrow)):
        d, a = duck[c].upper(), arrow[c]
        if d.startswith("TIMESTAMP"):        # documented normalization
            ok = a.startswith("timestamp")
        elif d.startswith("DECIMAL"):
            m = re.match(r"DECIMAL\((\d+),(\d+)\)", d)
            ok = bool(m) and a in (f"decimal128({m[1]}, {m[2]})",
                                   f"decimal256({m[1]}, {m[2]})")
        elif d.endswith("[]"):               # element-type check, one level
            # an unknown element type (HUGEINT[] above all) must FAIL,
            # not degrade to a shape-only check — the same refuse-
            # unknown rule as the scalar path. The arrow element type is
            # PARSED and compared exactly: substring containment would
            # let list<item: uint64> pass as BIGINT[] because 'int64'
            # is a substring of 'uint64'.
            inner = DUCK2ARROW.get(d[:-2], set())
            m = re.match(r"(?:large_)?list<item: (.+)>$", a)
            ok = bool(inner) and bool(m) and m[1] in inner
        else:
            ok = a in DUCK2ARROW.get(d, set())
        if not ok:
            bad.append(f"{c}: oracle {duck[c]} vs spark {arrow[c]}")
    return bad

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try: s = s.dt.tz_localize(None)
            except Exception: pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sfdir: str, outdir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file table (make_sf1.py splits>1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            tbad = type_mismatches(con, oracles[name], files[0])
            got = norm(pd.read_parquet(f"{outdir}/{name}"))
            want = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if tbad:
            print(f"FAIL {name}: type skew — " + "; ".join(tbad[:3]))
            n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if pd.api.types.is_float_dtype(got[c]):
                eq = (a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float)))
            else:
                eq = (pd.isna(a) & pd.isna(b)) | (a == b)
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row {i}]: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
