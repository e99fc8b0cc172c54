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
            # is a substring of 'uint64'. The element FIELD NAME is
            # writer-dependent ('element' from Spark's parquet writer
            # per the LIST spec, 'item' from pyarrow) and Spark emits a
            # ' not null' suffix for non-nullable elements — both are
            # naming/nullability, not type, so accept any \w+ name and
            # strip the suffix while keeping the element type exact.
            inner = DUCK2ARROW.get(d[:-2], set())
            m = re.match(r"(?:large_)?list<\w+: (.+?)(?: not null)?>$", a)
            ok = bool(inner) and bool(m) and m[1] in inner
        else:
            ok = a in DUCK2ARROW.get(d, set())
        if not ok:
            bad.append(f"{c}: oracle {duck[c]} vs spark {arrow[c]}")
    return bad

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def pairs_sql(oracles) -> str:
    """The DuckDB SQL for the q31 candidate-pair pipeline scalable_q60
    derives its edges from. Prefer the q31 oracle verbatim; a SUBSET
    oracle_sql.json (Verify's SPARK_GRAFT_VERIFY_ONLY) may omit it, in
    which case the identical pair CTEs are extracted from q60's own
    SQL — both are builder-authored from the same shared CTE constant,
    and --selftest pins the extraction against the q31 form."""
    if "q31_neardup_pairs" in oracles:
        return oracles["q31_neardup_pairs"]
    sql = oracles["q60_neardup_clusters"]
    head = sql.split(",\ne AS (")[0]
    assert head != sql, "q60 oracle SQL shape changed; update pairs_sql"
    return head + "\nSELECT doc1, doc2, jaccard_est FROM pairs"

def scalable_q60(con, oracles) -> pd.DataFrame:
    """Scalable VALUE oracle for q60_neardup_clusters (r17 verdict #1).

    The SQL oracle's recursive CTE materializes every (node, reachable
    comp-label) pair per iteration — quadratic in component size — and
    does not terminate at sf1 (>12 min, the standing r5 exclusion).
    This replacement computes the same answer two independent ways:
    the EDGES come from the identical DuckDB pair pipeline the q31
    oracle runs (already value-verified against Spark at every sf),
    thresholded at the same jaccard_est >= 0.5 the q60 SQL uses; the
    TRANSITIVE CLOSURE is then a path-compressed union-find where
    union always attaches the larger root under the smaller, so each
    set's root IS its minimum doc_id — exactly the min-label fixpoint
    both the recursive CTE and the Spark BSP loop converge to.
    Equivalence to the SQL oracle is pinned by --selftest (A/B at
    sf0.001, where the CTE still terminates).

    The q60 SQL stays in oracle_sql.json unchanged: the driver's
    sf0.01 gate keeps running it; only this dev-side harness reroutes.
    """
    # threshold pushed into DuckDB: at sf10 the unthresholded pair set
    # is ~39M rows; only the >= 0.5 edges ever reach the union-find
    e = con.execute(
        f"SELECT doc1, doc2 FROM ({pairs_sql(oracles)}) "
        "WHERE jaccard_est >= 0.5").df()
    parent: dict = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:          # path compression
            parent[x], x = r, parent[x]
        return r
    for a, b in zip(e["doc1"].to_numpy(), e["doc2"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra                   # root stays the set MIN
    docs = con.execute("SELECT doc_id FROM documents").df()["doc_id"].to_numpy()
    comp = np.fromiter((find(int(d)) for d in docs), dtype=np.int64,
                       count=len(docs))
    return pd.DataFrame({"doc_id": docs.astype(np.int64), "component": comp})

# Queries whose SQL oracle is correct but not runnable at sf>=1; the
# replacement must compute the SAME values (selftest-pinned), and the
# TYPE gate still runs against the original SQL via DESCRIBE (bind
# only, no execution).
def scalable_q92(con, oracles) -> pd.DataFrame:
    """Scalable VALUE oracle for q92_span_dedup.

    The SQL oracle's `c` CTE carries each document's ENTIRE token list
    into every one of its ~len/4 span rows — a ~150x amplification of
    the corpus text that exceeds host memory at sf10 (observed: DuckDB
    OOM at 118 GB even with threads=4 and a spill dir). This staged
    form computes the same answer without ever duplicating a token
    list: tokens explode ONCE with their ordinal, blocks re-assemble
    by pos = (i-1)//4, and the 8-token span is block(pos) joined with
    block(pos+1) via a self-join on integers — identical text because
    both forms join tokens with single spaces. The keep/cover/agg
    stages then run over integer-only temp tables, with block strings
    re-attached only in the final per-doc aggregation. The `d` CTE
    (boilerplate + pad construction) is extracted verbatim from the
    oracle's own SQL so the input can never drift. Equivalence is
    pinned by --selftest (A/B at a small sf where the direct SQL runs).

    The q92 SQL stays in oracle_sql.json unchanged: the driver's
    sf0.01 gate keeps running it; only this dev-side harness reroutes.
    """
    sql = oracles["q92_span_dedup"]
    m = re.search(r"WITH d AS \((.*?)\),\s*t AS", sql, re.S)
    assert m, "q92 oracle no longer starts with the d/t CTE shape; update scalable_q92"
    d = m[1]
    for t in ("q92_tok", "q92_blocks", "q92_sp", "q92_k"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    con.execute(f"""
      CREATE TEMP TABLE q92_tok AS
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ({d}) d)""")
    con.execute("""
      CREATE TEMP TABLE q92_blocks AS
      SELECT doc_id, CAST((i - 1) // 4 AS INT) AS pos,
             string_agg(tok, ' ' ORDER BY i) AS block
      FROM q92_tok GROUP BY doc_id, CAST((i - 1) // 4 AS INT)""")
    con.execute("DROP TABLE q92_tok")
    con.execute("""
      CREATE TEMP TABLE q92_sp AS
      SELECT b.doc_id, b.pos,
             CAST(('0x' || substr(md5(b.block ||
               COALESCE(' ' || b2.block, '')), 1, 15)) AS BIGINT) AS span_h
      FROM q92_blocks b
      LEFT JOIN q92_blocks b2
        ON b2.doc_id = b.doc_id AND b2.pos = b.pos + 1""")
    con.execute("""
      CREATE TEMP TABLE q92_k AS
      SELECT doc_id, pos,
        (row_number() OVER (PARTITION BY span_h ORDER BY doc_id, pos) = 1) AS keep
      FROM q92_sp""")
    con.execute("DROP TABLE q92_sp")
    out = con.execute("""
      WITH cov AS (
        SELECT b.doc_id, b.pos, bool_or(s2.keep) AS kept
        FROM q92_k b JOIN q92_k s2
          ON s2.doc_id = b.doc_id AND s2.pos BETWEEN b.pos - 1 AND b.pos
        GROUP BY b.doc_id, b.pos),
      agg1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_spans
               FROM q92_k GROUP BY doc_id),
      agg2 AS (SELECT c.doc_id,
                 CAST(SUM(CASE WHEN c.kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_blocks,
                 COALESCE(string_agg(CASE WHEN c.kept THEN bl.block END,
                                     ' ' ORDER BY c.pos), '') AS text_dedup
               FROM cov c JOIN q92_blocks bl
                 ON bl.doc_id = c.doc_id AND bl.pos = c.pos
               GROUP BY c.doc_id)
      SELECT a.doc_id, a.n_spans, a.n_dup_spans, b.n_kept_blocks, b.text_dedup
      FROM agg1 a JOIN agg2 b ON a.doc_id = b.doc_id
      ORDER BY a.doc_id""").df()
    for t in ("q92_blocks", "q92_k"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return out

def scalable_q41(con, oracles) -> pd.DataFrame:
    """Scalable VALUE oracle for q41_range_join.

    The SQL oracle's |Δts| <= 30 min band join runs as an IEJoin
    (sort-based inequality join); at sf10 the fixture's copied
    timestamps multiply temporal density 100x, the join enumerates
    5.5e9 pairs, and the IEJoin did not finish inside 40 min. This
    staged form produces the identical pairs through a HASH join:
    each error expands to its 30-min bucket and both neighbors
    (every |Δ| <= W match lies within one bucket width), clicks join
    on bucket equality, and the exact |Δ| predicate then filters —
    the same two-phase shape the engine's RangeJoin uses. Equivalence
    is pinned by --selftest (A/B at a small sf where the IEJoin runs).

    The q41 SQL stays in oracle_sql.json unchanged: the driver's
    sf0.01 gate keeps running it; only this dev-side harness reroutes.
    """
    return con.execute("""
      WITH e AS (
        SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
      c AS (
        SELECT event_id, epoch_us(ts) AS us,
               epoch_us(ts) // 1800000000 AS b
        FROM events WHERE event_type = 'click'),
      e3 AS (
        SELECT event_id, us,
               unnest([us // 1800000000 - 1,
                       us // 1800000000,
                       us // 1800000000 + 1]) AS nb
        FROM e)
      SELECT e3.event_id,
        CAST(COUNT(*) AS BIGINT) AS n_nearby,
        MIN(c.event_id) AS first_click,
        MAX(c.event_id) AS last_click
      FROM e3 JOIN c ON c.b = e3.nb
        AND abs(e3.us - c.us) <= 1800 * 1000000
      GROUP BY e3.event_id
      ORDER BY e3.event_id""").df()

SCALABLE_ORACLES = {"q41_range_join": scalable_q41,
                    "q60_neardup_clusters": scalable_q60,
                    "q92_span_dedup": scalable_q92}

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

def spillable_connect():
    """In-memory DuckDB with a spill dir: without temp_directory an
    in-memory connection cannot go out-of-core, so the big sf10
    oracles (q92 span self-joins, q95 permutation) die on 'Failed to
    allocate' instead of spilling like the engine under test does."""
    con = duckdb.connect()
    spill = os.environ.get("GRAFT_DUCK_SPILL", "/tmp/graft_duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    # big-scale runs: fewer threads = lower peak memory (the q95
    # oracle at sf10 completes at threads=4, OOMs at the default)
    th = os.environ.get("GRAFT_DUCK_THREADS")
    if th:
        con.execute(f"SET threads={int(th)}")
    return con

def main(sfdir: str, outdir: str, only: set | None = None) -> None:
    con = spillable_connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file table (make_sf1.py splits>1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only is not None:
        # fail CLOSED on a typo'd subset: silently skipping unknown
        # names would print '0 passed, 0 failed' and exit 0 — a green
        # verification that checked nothing
        unknown = sorted(only - set(oracles))
        if unknown:
            print(f"FAIL --only names not in oracle_sql.json: {', '.join(unknown)}")
            sys.exit(1)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            tbad = type_mismatches(con, oracles[name], files[0])
            got = norm(pd.read_parquet(f"{outdir}/{name}"))
            # Scalable reroutes are OPT-IN (big-scale runs where the
            # direct SQL DNFs/OOMs): the routine dev gate must keep
            # executing the committed oracle SQL, or an edit to those
            # oracles would only ever be caught by the driver, never
            # by tools/verify.sh (--selftest pins reroute ≡ direct,
            # but nothing in the routine loop runs it).
            scalable = os.environ.get("GRAFT_SCALABLE_ORACLES") == "1"
            if scalable and name in SCALABLE_ORACLES:
                want = norm(SCALABLE_ORACLES[name](con, oracles))
            else:
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

def selftest(outdir: str | None = None) -> None:
    """Regression checks:
    1-4: list-element type gate against a REAL Spark-written list
         parquet — 'element'-vs-'item' field naming and the ' not null'
         suffix exercised rather than assumed (ADVICE r17).
    5:   scalable_q60 union-find A/B vs the original recursive-CTE SQL
         at a small sf where the CTE terminates (needs an oracle_sql
         .json — pass a Verify outdir as the second arg)."""
    con = duckdb.connect()
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    p = f"{base}/embeddings.parquet"
    f = p if os.path.isfile(p) else glob.glob(f"{p}/*.parquet")[0]
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{f}')")
    # 1. matching element type must PASS for the Spark/pyarrow-written file
    bad = type_mismatches(con, "SELECT vec_id, embedding FROM embeddings", f)
    assert not bad, f"FLOAT[] should accept the fixture list column: {bad}"
    # 2. a WRONG element type must FAIL (exact element match, no substring)
    bad = type_mismatches(
        con, "SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings", f)
    assert any("embedding" in b for b in bad), "DOUBLE[] vs list<float> must fail"
    # 3. synthetic: Spark's ' not null' suffix and 'element' name are accepted
    m = re.match(r"(?:large_)?list<\w+: (.+?)(?: not null)?>$",
                 "list<element: double not null>")
    assert m and m[1] == "double", m
    # 4. synthetic: uint64 must NOT pass as BIGINT[] (the original hole)
    m = re.match(r"(?:large_)?list<\w+: (.+?)(?: not null)?>$", "list<item: uint64>")
    assert m and m[1] not in DUCK2ARROW["BIGINT"], m[1]
    # 5. scalable q60 oracle ≡ the recursive-CTE SQL where the CTE runs
    if outdir and os.path.exists(f"{outdir}/oracle_sql.json"):
        for t in TABLES:
            tp = f"{base}/{t}.parquet"
            src = f"'{tp}/*.parquet'" if os.path.isdir(tp) else f"'{tp}'"
            if os.path.exists(tp):
                con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet({src})")
        oracles = json.load(open(f"{outdir}/oracle_sql.json"))
        sql = norm(con.execute(oracles["q60_neardup_clusters"]).df())
        uf = norm(scalable_q60(con, oracles))
        assert sql.equals(uf), "union-find oracle diverges from the recursive CTE"
        print(f"q60 A/B OK ({len(uf)} rows, {uf['component'].nunique()} components)")
        # the subset-dump fallback: extracting the pair CTEs from q60's
        # own SQL must yield the same edges as the q31 oracle
        sub = {k: v for k, v in oracles.items() if k != "q31_neardup_pairs"}
        a = norm(con.execute(pairs_sql(oracles)).df())
        b = norm(con.execute(pairs_sql(sub)).df())
        assert a.equals(b), "pairs_sql extraction diverges from the q31 oracle"
        print(f"pairs_sql fallback OK ({len(a)} candidate pairs)")
        # 6. staged q92 oracle ≡ the direct SQL where the SQL runs
        if "q92_span_dedup" in oracles:
            direct = norm(con.execute(oracles["q92_span_dedup"]).df())
            staged = norm(scalable_q92(con, oracles))
            assert direct.equals(staged), \
                "staged q92 oracle diverges from the direct SQL"
            print(f"q92 A/B OK ({len(direct)} rows)")
        else:
            print("q92 A/B SKIPPED (subset dump without q92)")
        # 7. bucketed q41 oracle ≡ the direct IEJoin SQL where it runs
        if "q41_range_join" in oracles:
            direct = norm(con.execute(oracles["q41_range_join"]).df())
            staged = norm(scalable_q41(con, oracles))
            assert direct.equals(staged), \
                "bucketed q41 oracle diverges from the direct band-join SQL"
            print(f"q41 A/B OK ({len(direct)} rows)")
        else:
            print("q41 A/B SKIPPED (subset dump without q41)")
    else:
        # reduced coverage must be visible: without a dump dir the q60
        # union-find A/B pin (check 5) never ran
        print("q60 A/B SKIPPED (no outdir with oracle_sql.json)")
    print("selftest OK")

if __name__ == "__main__":
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2] if len(sys.argv) > 2 else None)
    else:
        # optional: --only a,b,c restricts the compare to a subset
        # (pairs with Verify's SPARK_GRAFT_VERIFY_ONLY subset dumps).
        # Any other trailing arguments are an error, not a silent
        # full-compare (fail closed).
        only = None
        extra = sys.argv[3:]
        if extra:
            if len(extra) != 2 or extra[0] != "--only" or not extra[1].strip():
                print(f"usage: compare.py SFDIR OUTDIR [--only a,b,c]; got {extra}")
                sys.exit(1)
            only = set(x.strip() for x in extra[1].split(",") if x.strip())
            if not only:
                # '--only ,' parses to an empty set, which would skip
                # every query and exit 0 — green while verifying nothing
                print(f"usage: compare.py SFDIR OUTDIR [--only a,b,c]; "
                      f"--only parsed to no names: {extra[1]!r}")
                sys.exit(1)
        main(sys.argv[1], sys.argv[2], only)
