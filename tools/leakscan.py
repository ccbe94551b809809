#!/usr/bin/env python3
"""Repo leak scanner with scan-evidence metadata.

The round-6 ADVICE flagged that a bare {round, hits} report is
indistinguishable from a hand-edited bump: nothing evidences that a scan
actually ran over the current tree. This scanner emits, alongside the
per-category hits, the metadata that makes a re-run verifiable:
timestamp, git revision, file/line counts, tool version, and the exact
patterns used.

Categories mirror LEAKCHECK.json's seven. Patterns are generic
hygiene checks (secret-shaped strings, cloud buckets, chat-archive
links, non-public-looking hosts, credential-bearing env vars) — the
repo must be buildable from public knowledge only, so ANY hit needs
adjudication.

Usage: python3 tools/leakscan.py [repo_root] [--out FILE]
Exit code 0 when clean, 1 when any category has hits.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

TOOL_VERSION = "1.0"

# host allowlist: public infrastructure this repo legitimately references
PUBLIC_HOSTS = re.compile(
    r"(apache\.org|github\.com|duckdb\.org|scala-lang\.org|scalatest\.org|"
    r"example\.(com|org|net)|w3\.org|openjdk\.org|wikipedia\.org|"
    r"localhost|127\.0\.0\.1)")

CATEGORIES = {
    # imports from namespaces that are not Spark/Scala/Java/this repo
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache|org\.scalatest|org\.scalacheck|scala\.|"
        r"java\.|javax\.|graft\.)[a-z]+\.[a-z]+\.(internal|private|corp)\b"),
    # URLs whose host is not on the public allowlist
    "internal-url": re.compile(r"https?://(?![^/\s\"']*" + PUBLIC_HOSTS.pattern +
                               r")[A-Za-z0-9.-]+\.(corp|internal|local)\b"),
    # non-public-looking package roots
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.[a-z0-9]+\.(internal|secret|corp)\."),
    # cloud bucket references
    "internal-bucket": re.compile(r"\b(s3|gs|abfss?)://[A-Za-z0-9._-]+"),
    # chat archive links
    "slack-link": re.compile(r"slack\.com/archives|app\.slack\.com"),
    # secret-shaped strings: AWS key ids, PEM headers, long bearer-ish tokens
    "api-key": re.compile(r"\b(AKIA[0-9A-Z]{16}|-----BEGIN (RSA |EC )?PRIVATE KEY|"
                          r"xox[baprs]-[0-9A-Za-z-]{10,}|sk-[A-Za-z0-9]{32,})\b"),
    # credential-bearing environment variables (reads OR writes)
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*(TOKEN|SECRET|PASSWORD|APIKEY|API_KEY)\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".java", ".sql",
            ".conf", ".properties", ".txt", ".yml", ".yaml"}
SKIP_DIRS = {".git", "target", "spark-warehouse", "project"}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("root", nargs="?", default="/root/repo")
    parser.add_argument("--out", dest="out_file", default=None)
    parser.add_argument("--round", dest="round_no", type=int, default=None,
                        help="round number to stamp into the report")
    opts = parser.parse_args()
    root = opts.root
    out_file = opts.out_file

    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    n_lines = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if rel == "tools/leakscan.py":
                continue  # the patterns themselves live here
            n_files += 1
            try:
                with open(path, errors="replace") as f:
                    for ln, line in enumerate(f, 1):
                        n_lines += 1
                        for cat, pat in CATEGORIES.items():
                            if pat.search(line):
                                hits[cat].append(f"{rel}:{ln}: {line.strip()[:160]}")
            except OSError:
                continue

    try:
        rev = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
    except OSError:
        rev = None

    report = {
        **({"round": opts.round_no} if opts.round_no is not None else {}),
        "tool": "tools/leakscan.py",
        "tool_version": TOOL_VERSION,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "git_rev": rev,
        "root": root,
        "files_scanned": n_files,
        "lines_scanned": n_lines,
        "patterns": {k: v.pattern for k, v in CATEGORIES.items()},
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    text = json.dumps(report, indent=2)
    print(text)
    if out_file:
        with open(out_file, "w") as f:
            f.write(text + "\n")
    return 1 if report["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
