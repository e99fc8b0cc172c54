#!/usr/bin/env python3
"""Bench regression alarm: compare a graft.Bench session JSON against
BASELINE.md's recorded per-query minima and flag outliers.

The r11 round spent its audit finding that six cells had jumped 3-9x
in-suite (fixture regeneration + session load, no code change); this
script makes that forensics a one-liner. In-suite cells normally sit
1.0-1.7x their cross-session minima (the documented machine drift), so
the default threshold flags only genuine outlier clusters.

Usage:
  python3 tools/bench_check.py [session.json] [--col=sf0.1|sf1|sf10] [--threshold=2.5 (sf10 sessions: use --threshold=5 — the in-suite drift band at that scale is 1.5-4x vs pooled minima)] [--plans=<plan_fingerprints.json>]

Defaults: BENCH_FULL.json, sf0.1 column, threshold 2.5x. Exit 1 if any
cell exceeds the threshold (wire into a round's pre-commit ritual).
A flagged cell means: run the floor-probe discipline (solo min-of-5,
tools/floor_probe.sh) before reading it as a code regression — and run
tools/fixture_fingerprint.py first to rule out a fixture change.

--plans diffs a fresh graft.tools.PlanFingerprints dump against the
plan shapes the ledger recorded at campaign time for the same column:
a reintroduced exchange or a broadcast join degraded to sort-merge
flags HERE, as a shape diff, instead of surfacing a round later as an
unexplained slow cell. Exit 1 on any drift.

The report always states its denominator: how many ledger queries have
a spark cell for the column, and how many duck cells are measured /
explicitly oracle-infeasible / missing — a skipped cell is stated,
never silent (r19 verdict item 1).
"""
import json
import re
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0].lstrip("-"): (a.split("=", 1)[1] if "=" in a else True)
        for a in sys.argv[1:] if a.startswith("--")}
session_path = args[0] if args else "BENCH_FULL.json"
col = str(opts.get("col", "sf0.1"))
threshold = float(opts.get("threshold", 2.5))

session = json.load(open(session_path))["queries"]

# Recorded minima come from the machine-readable ledger
# (BASELINE_CELLS.json, maintained by tools/ledger.py — the r19
# consolidation of the old markdown table + scattered prose cells).
base = {}
cells = json.load(open("BASELINE_CELLS.json"))["cells"]
duck_measured = duck_infeasible = duck_missing = 0
for q, per_sf in cells.items():
    cc = per_sf.get(col, {})
    ms = cc.get("spark_ms")
    if ms is not None:
        base[q] = float(ms)
    if cc.get("duck_ms") is not None:
        duck_measured += 1
    elif "duck_ms" in cc:
        duck_infeasible += 1
    else:
        duck_missing += 1
print(f"{col} denominator: {len(base)}/{len(cells)} ledger queries have spark cells; "
      f"duck {duck_measured} measured / {duck_infeasible} oracle-infeasible / "
      f"{duck_missing} missing")

# ---- plan-shape drift (--plans fresh_fingerprints.json) ----
plan_drift_failed = False
if "plans" in opts:
    if opts["plans"] is True:
        sys.exit("--plans needs a value: --plans=<plan_fingerprints.json>")
    fresh_doc = json.load(open(str(opts["plans"])))
    # Shapes are per scale factor (AQE picks different strategies at
    # different input sizes) — diffing an sf1 dump against sf0.1 pins
    # produces bogus drift verdicts, so the dump must name the column
    # it was captured at (ADVICE r20).
    fresh_sf = str(fresh_doc.get("sf", "")).rstrip("/").rsplit("/", 1)[-1]
    if fresh_sf != col:
        sys.exit(f"--plans dump was captured at '{fresh_sf}' but --col is "
                 f"'{col}': refusing to diff across scale factors")
    fresh = fresh_doc["plans"]
    drift = []
    unpinned = 0
    for q, shape in sorted(fresh.items()):
        if "error" in shape:
            drift.append((q, "fresh run errored: " + shape["error"]))
            continue
        pinned = cells.get(q, {}).get(col, {}).get("plan")
        if pinned is None:
            unpinned += 1
            continue
        diffs = [f"{k}: {pinned[k]} -> {shape.get(k)}"
                 for k in pinned if shape.get(k) != pinned[k]]
        if diffs:
            drift.append((q, "; ".join(diffs)))
    print(f"plan shapes: {len(fresh) - unpinned} diffed against {col} pins, "
          f"{unpinned} without a recorded pin")
    if drift:
        print(f"{len(drift)} plan(s) drifted from the campaign-time shape:")
        for q, d in drift:
            print(f"  {q:28s} {d}")
        # keep going: one shape diff must not hide timing regressions in
        # the same invocation (ADVICE r20) — exit nonzero at the end
        plan_drift_failed = True
    else:
        print("no plan-shape drift")

flagged = []
ratios = []
for q, rec_ms in sorted(base.items()):
    if q not in session:
        continue
    r = session[q] * 1000 / rec_ms
    ratios.append(r)
    if r > threshold:
        flagged.append((q, rec_ms, session[q] * 1000, r))

ratios.sort()
med = ratios[len(ratios) // 2] if ratios else float("nan")
print(f"{len(ratios)} cells vs recorded {col} minima: median in-suite/min = {med:.2f} "
      f"(normal band 1.0-1.7)")
if flagged:
    print(f"\n{len(flagged)} cell(s) above {threshold}x — floor-probe before blaming code, "
          f"fingerprint the fixtures first:")
    for q, rec, now, r in flagged:
        print(f"  {q:28s} recorded {rec:7.0f} ms  session {now:7.0f} ms  {r:4.1f}x")
    sys.exit(1)
print(f"no cell above {threshold}x — session consistent with recorded minima")
if plan_drift_failed:
    sys.exit(1)
