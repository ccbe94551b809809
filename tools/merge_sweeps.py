#!/usr/bin/env python3
"""Merge partial sf1_sweep.py artifacts (e.g. the stream_* pass that must
run immediately after Verify writes the last-write-wins stream input
dumps, plus the rest-of-surface pass) into one CORRECTNESS-style JSON.

Usage: python3 tools/merge_sweeps.py <out.json> <part1.json> <part2.json> ...
"""
import json, sys


def main() -> int:
    out, parts = sys.argv[1], sys.argv[2:]
    merged = None
    for p in parts:
        with open(p) as fh:
            r = json.load(fh)
        if merged is None:
            merged = r
            merged["merged_from"] = [p]
        else:
            assert r["sfdir"] == merged["sfdir"], "sfdir mismatch"
            merged["entries"].update(r["entries"])
            merged["merged_from"].append(p)
    merged["entries"] = dict(sorted(merged["entries"].items()))
    merged["n_entries"] = len(merged["entries"])
    statuses = [e["status"] for e in merged["entries"].values()]
    merged["n_ok"] = statuses.count("ok")
    merged["n_fail"] = statuses.count("fail")
    merged["n_timeout"] = statuses.count("timeout")
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"wrote {out}: {merged['n_ok']}/{merged['n_entries']} ok, "
          f"{merged['n_fail']} fail, {merged['n_timeout']} timeout")
    return 0


if __name__ == "__main__":
    sys.exit(main())
