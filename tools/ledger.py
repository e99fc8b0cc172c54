#!/usr/bin/env python3
"""The per-query benchmark ledger: ONE machine-readable source of truth
(BASELINE_CELLS.json) for the DuckDB-vs-Spark protocol minima at every
scale factor, replacing the r12 markdown table + scattered prose cells
the r18 verdict flagged.

Cells are MINIMA across protocol-quality sessions: merge-* folds a new
session's per-query times in with min(); render emits the markdown
table for BASELINE.md; stats computes the gross / work-bound ratios
directly from the JSON (the "no prose archaeology" contract).

Usage:
  python3 tools/ledger.py merge-spark <sf> <bench.json> [...]
  python3 tools/ledger.py merge-duck  <sf> <duck_bench.json> [...]
  python3 tools/ledger.py merge-plans <sf> <plan_fingerprints.json> [...]
  python3 tools/ledger.py set <sf> <query> <engine> <ms|null> [why]
  python3 tools/ledger.py render
  python3 tools/ledger.py stats [--sf=sf0.1] [--work-ms=150]

<sf> is one of: sf0.1 sf1 sf10. Engine session JSONs are the one-line
outputs of graft.Bench / tools/duck_bench.py (seconds; stored as ms);
plan files come from graft.tools.PlanFingerprints (AQE-final shape
counts, diffed by bench_check.py --plans to catch a reintroduced
exchange before it costs a round of forensics).

An EXPLICIT null cell (`set <sf> <q> duck null "<why>"`) marks the
oracle infeasible at that scale — q59's oracle is a write-path
re-read; q60/q41/q92's committed oracles DNF/OOM at big scales (their
staged-oracle times are correctness tooling, not an engine benchmark);
q85's recursive CTE reads 26 s at sf0.1 already. stats counts
measured / infeasible / missing separately so the denominator is
always stated, never silently skipped (r19 verdict item 1).
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PATH = os.path.join(HERE, "..", "BASELINE_CELLS.json")
SFS = ["sf0.1", "sf1", "sf10"]


def load():
    if os.path.exists(PATH):
        return json.load(open(PATH))
    return {"protocol": "min across protocol-quality sessions; see BASELINE.md",
            "cells": {}}


def save(led):
    json.dump(led, open(PATH, "w"), indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(PATH)}")


def cell(led, q, sf):
    c = led["cells"].setdefault(q, {})
    return c.setdefault(sf, {})


def merge(led, sf, engine, files):
    assert sf in SFS, sf
    key = f"{engine}_ms"
    for f in files:
        sess = json.load(open(f))
        for q, sec in sess["queries"].items():
            ms = round(float(sec) * 1000.0, 1)
            c = cell(led, q, sf)
            old = c.get(key)
            # only an EXPLICIT null (the oracle-infeasible marker) may
            # delete the cell's 'why' on a first duck measurement — a
            # merely-absent key must not clobber a 'why' annotating the
            # spark cell (ADVICE r20)
            was_infeasible = key in c and c[key] is None
            if old is None or ms < old:
                c[key] = ms
                # a real measurement supersedes an infeasible marker
                if was_infeasible and c.get("why") and engine == "duck":
                    del c["why"]
    save(led)


def merge_plans(led, sf, files):
    assert sf in SFS, sf
    for f in files:
        sess = json.load(open(f))
        for q, shape in sess["plans"].items():
            if "error" in shape:
                continue
            cell(led, q, sf)["plan"] = shape
    save(led)


def set_cell(led, sf, q, engine, val, why=None):
    c = cell(led, q, sf)
    c[f"{engine}_ms"] = None if val == "null" else round(float(val), 1)
    if why:
        c["why"] = why
    save(led)


def fmt(ms):
    return "—" if ms is None else (str(round(ms)) if ms >= 10 else f"{ms:.1f}")


def ratio(duck, spark):
    if duck is None or spark is None or duck <= 0:
        return "—"
    r = spark / duck
    if r >= 100:
        return f"{r:.0f}×"
    if r >= 10:
        return f"{r:.0f}×"
    return f"{r:.2f}×"


def render(led):
    qs = sorted(led["cells"])
    head = ("| query | sf0.1 duck ms | sf0.1 spark ms | ratio "
            "| sf1 duck ms | sf1 spark ms | ratio "
            "| sf10 duck ms | sf10 spark ms | ratio |")
    print(head)
    print("|" + "---|" * 10)
    for q in qs:
        row = [q]
        for sf in SFS:
            c = led["cells"][q].get(sf, {})
            d, s = c.get("duck_ms"), c.get("spark_ms")
            row += [fmt(d), fmt(s), ratio(d, s)]
        print("| " + " | ".join(row) + " |")


def stats(led, sf, work_ms):
    pairs = []
    infeasible, missing = [], []
    for q, c in sorted(led["cells"].items()):
        cc = c.get(sf, {})
        d, s = cc.get("duck_ms"), cc.get("spark_ms")
        if d is not None and s is not None:
            pairs.append((q, d, s))
        elif "duck_ms" in cc and d is None:
            infeasible.append(q)
        else:
            missing.append(q)
    n_q = len(led["cells"])
    print(f"{sf}: {n_q} ledger queries — {len(pairs)} comparable, "
          f"{len(infeasible)} oracle-infeasible ({', '.join(infeasible) or '-'}), "
          f"{len(missing)} missing a cell ({', '.join(missing) or '-'})")
    if not pairs:
        print(f"{sf}: no comparable cells — nothing to rate")
        return
    gross_d = sum(d for _, d, _ in pairs)
    gross_s = sum(s for _, _, s in pairs)
    if gross_d > 0:
        print(f"{sf}: comparable n={len(pairs)} gross duck {gross_d/1000:.2f}s "
              f"spark {gross_s/1000:.2f}s = {gross_s/gross_d:.2f}x")
    else:
        print(f"{sf}: comparable n={len(pairs)} but zero total duck time — no ratio")
    work = [(q, d, s) for q, d, s in pairs if d >= work_ms]
    wd = sum(d for _, d, _ in work)
    ws = sum(s for _, _, s in work)
    wins = sum(1 for _, d, s in work if s < d)
    over2 = [(q, round(s / d, 2)) for q, d, s in work if s / d > 2.0]
    print(f"{sf}: work-bound (duck>={work_ms}ms) n={len(work)} "
          f"duck {wd/1000:.2f}s spark {ws/1000:.2f}s = "
          f"{(ws/wd if wd else float('nan')):.2f}x; spark wins {wins}/{len(work)}; "
          f"cells >2x: {over2 or 'none'}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): a.split("=", 1)[1]
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    led = load()
    cmd = args[0] if args else "render"
    if cmd == "merge-spark":
        merge(led, args[1], "spark", args[2:])
    elif cmd == "merge-duck":
        merge(led, args[1], "duck", args[2:])
    elif cmd == "merge-plans":
        merge_plans(led, args[1], args[2:])
    elif cmd == "set":
        set_cell(led, args[1], args[2], args[3], args[4],
                 args[5] if len(args) > 5 else None)
    elif cmd == "render":
        render(led)
    elif cmd == "stats":
        sf = opts.get("sf", "sf0.1")
        stats(led, sf, float(opts.get("work-ms", 150)))
    else:
        sys.exit(f"unknown command {cmd}\n{__doc__}")


if __name__ == "__main__":
    main()
