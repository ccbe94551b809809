#!/usr/bin/env python3
"""Merge partial sf1_sweep.py artifacts (e.g. the stream_* pass that must
run immediately after Verify writes the last-write-wins stream input
dumps, plus the rest-of-surface pass) into one CORRECTNESS-style JSON.

Usage: python3 tools/merge_sweeps.py <out.json> <part1.json> <part2.json> ...

Provenance (r14 ADVICE): a merged artifact is only reproducible at a
revision that contains EVERY measured entry, so the merged git_rev is
re-stamped to the newest part's rev — and that rev must be a descendant
of every other part's rev (checked via `git merge-base --is-ancestor`;
divergent revs abort the merge). All parts' revs are kept under
`merged_git_revs` so per-pass provenance is never lost.
"""
import json, os, subprocess, sys


def _is_ancestor(repo, a, b):
    """True iff rev a is an ancestor of (or equal to) rev b.

    Identical rev strings short-circuit to True WITHOUT shelling out, and a
    git failure (not a checkout, shallow clone, unknown rev) raises instead
    of reading as "not an ancestor" — otherwise two parts with the SAME
    git_rev could abort the merge with a misleading "divergent part
    revisions" error (r15 ADVICE).
    """
    if a == b:
        return True
    for rev in (a, b):
        chk = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--verify", "--quiet", rev + "^{commit}"],
            capture_output=True)
        if chk.returncode != 0:
            raise RuntimeError(
                f"git cannot resolve rev {rev!r} in {repo} "
                f"({chk.stderr.decode(errors='replace').strip() or 'rev-parse failed'}); "
                "ancestry is undecidable here — run the merge inside the checkout")
    return subprocess.run(
        ["git", "-C", repo, "merge-base", "--is-ancestor", a, b],
        capture_output=True).returncode == 0


def main() -> int:
    out, parts = sys.argv[1], sys.argv[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    merged = None
    revs = []
    for p in parts:
        with open(p) as fh:
            r = json.load(fh)
        revs.append(r.get("git_rev"))
        if merged is None:
            merged = r
            merged["merged_from"] = [p]
        else:
            assert r["sfdir"] == merged["sfdir"], "sfdir mismatch"
            merged["entries"].update(r["entries"])
            merged["merged_from"].append(p)
    known = [r for r in revs if r]
    if known:
        newest = known[0]
        for r in known[1:]:
            if _is_ancestor(repo, newest, r):
                newest = r
            elif not _is_ancestor(repo, r, newest):
                print(f"divergent part revisions {r} / {newest}: the merged "
                      "artifact would not be reproducible at any single rev; "
                      "re-run one pass at the newer revision", file=sys.stderr)
                return 2
        merged["git_rev"] = newest
        merged["merged_git_revs"] = revs
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
