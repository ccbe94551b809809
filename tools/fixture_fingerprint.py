#!/usr/bin/env python3
"""Round-start fixture gate (VERDICT r8 Next #6).

Fingerprints every table at every SF under /root/testdata: schema (name:type
per column), row count, and an order-independent content hash (sum of per-row
duckdb hash). Checked against the committed manifest
tools/fixture_manifest.json; a mismatch prints a loud per-column diff so a
silently regenerated fixture (the round-8 events.parquet ts incident) is
caught BEFORE any building starts.

Usage:
  python3 tools/fixture_fingerprint.py check    # gate (default)
  python3 tools/fixture_fingerprint.py write    # regenerate manifest
"""
import json
import os
import sys
import glob

import duckdb

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixture_manifest.json")
TESTDATA = "/root/testdata"


def fingerprint():
    con = duckdb.connect()
    out = {}
    for sfdir in sorted(glob.glob(os.path.join(TESTDATA, "sf*"))):
        sf = os.path.basename(sfdir)
        out[sf] = {}
        for pq in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
            table = os.path.basename(pq)[:-len(".parquet")]
            cols = con.execute(
                "SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM read_parquet(?))",
                [pq]).fetchall()
            n, h = con.execute(
                f"SELECT count(*), sum(hash(t)) FROM read_parquet('{pq}') t"
            ).fetchone()
            out[sf][table] = {
                "schema": [f"{name}:{typ}" for name, typ in cols],
                "rows": int(n),
                "hash": str(h),
            }
    return out


def diff(expected, actual):
    """Return a list of human-readable mismatch lines."""
    lines = []
    for sf in sorted(set(expected) | set(actual)):
        if sf not in actual:
            lines.append(f"MISSING SF DIR: {sf}")
            continue
        if sf not in expected:
            lines.append(f"NEW SF DIR (not in manifest): {sf}")
            continue
        etab, atab = expected[sf], actual[sf]
        for table in sorted(set(etab) | set(atab)):
            if table not in atab:
                lines.append(f"{sf}/{table}: MISSING")
                continue
            if table not in etab:
                lines.append(f"{sf}/{table}: NEW (not in manifest)")
                continue
            e, a = etab[table], atab[table]
            if e["schema"] != a["schema"]:
                eset, aset = set(e["schema"]), set(a["schema"])
                for c in sorted(eset - aset):
                    lines.append(f"{sf}/{table}: column GONE/CHANGED: {c}")
                for c in sorted(aset - eset):
                    lines.append(f"{sf}/{table}: column NEW/CHANGED: {c}")
                if eset == aset:
                    lines.append(f"{sf}/{table}: column ORDER changed")
            if e["rows"] != a["rows"]:
                lines.append(
                    f"{sf}/{table}: rows {e['rows']} -> {a['rows']}")
            if e["hash"] != a["hash"]:
                lines.append(
                    f"{sf}/{table}: content hash changed "
                    f"({e['hash']} -> {a['hash']})")
    return lines


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    actual = fingerprint()
    if mode == "write":
        with open(MANIFEST, "w") as f:
            json.dump(actual, f, indent=1, sort_keys=True)
        n = sum(len(t) for t in actual.values())
        print(f"wrote {MANIFEST}: {n} tables across {len(actual)} SFs")
        return 0
    if not os.path.exists(MANIFEST):
        print(f"NO MANIFEST at {MANIFEST} — run 'write' first", file=sys.stderr)
        return 2
    with open(MANIFEST) as f:
        expected = json.load(f)
    lines = diff(expected, actual)
    if lines:
        print("FIXTURE MISMATCH — testdata changed since the manifest was "
              "written:", file=sys.stderr)
        for l in lines:
            print(f"  {l}", file=sys.stderr)
        return 1
    n = sum(len(t) for t in actual.values())
    print(f"fixtures OK: {n} tables across {len(actual)} SFs match manifest")
    return 0


if __name__ == "__main__":
    sys.exit(main())
