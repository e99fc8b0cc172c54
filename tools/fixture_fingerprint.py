#!/usr/bin/env python3
"""Content fingerprints for the driver-provided fixtures.

The driver regenerates /root/testdata at round boundaries; twice now a
regeneration has changed the MEASUREMENT ENVIRONMENT (r10: events.ts
physical type; r11: single-row-group layout) and the change was only
discovered by forensics after bench cells moved. This script makes the
comparison instant: an order-independent content hash per table plus the
layout facts that matter for benching (file count, row groups, physical
ts type). Run it at round start and diff against the committed block in
FIXTURES.md — identical hashes mean every recorded bench cell is still
measured on the same bytes.

Usage: python3 tools/fixture_fingerprint.py [sfdir ...]
Defaults to all three driver sf dirs.
"""
import sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def fingerprint(sfdir: str) -> None:
    con = duckdb.connect()
    print(f"## {sfdir}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        try:
            # Order-independent content hash: per-row hash of all columns,
            # xor-folded. Stable across row order, file split, and engine
            # version as long as the VALUES are identical.
            h = con.execute(
                f"SELECT to_hex(bit_xor(hash(COLUMNS(*)::VARCHAR))) FROM read_parquet('{p}')"
            ).fetchone()
            n, rg = con.execute(
                f"SELECT count(*), count(DISTINCT file_name || '#' || row_group_id) "
                f"FROM parquet_metadata('{p}')"
            ).fetchone()
            rows = con.execute(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
            print(f"{t:12s} rows={rows:<9d} row_groups={rg:<3d} content_xor={'|'.join(h)}")
        except Exception as e:  # noqa: BLE001 - report and continue per table
            print(f"{t:12s} ERR {e}")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    for d in dirs:
        fingerprint(d)
