#!/usr/bin/env python3
"""Persist the builder's COMPLETE per-entry full-suite bench as a
committed artifact (VERDICT r10 Next #6): the driver's BENCH_r{N}.json
tail truncates the first ~40 per-entry timings (r9 and r10 both), so
the budget gate was only re-checkable from the builder's transcript.
This runs the exact driver bench surface (graft.Bench, full suite, no
SPARK_GRAFT_ONLY) and writes every per-entry second plus provenance,
so the 2x-budget gate is re-checkable from committed artifacts alone.

Usage:
  python3 tools/bench_full.py <sfDir> [--cpus N] [--out FILE] [--round N]
"""
import argparse, json, os, re, subprocess, sys, time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sfdir")
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--out", default=None)
    p.add_argument("--round", type=int, dest="round_no", default=None)
    opts = p.parse_args()

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = opts.sfdir
    env["SPARK_GRAFT_CPUS"] = str(opts.cpus)
    env.pop("SPARK_GRAFT_ONLY", None)  # full suite, always
    t0 = time.time()
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env)
    wall = time.time() - t0
    # graft.Bench prints ONE JSON line; sbt prefixes it with "[info] "
    line = None
    for ln in proc.stdout.splitlines():
        m = re.search(r'(\{"metric".*\})\s*$', ln)
        if m:
            line = m.group(1)
    if line is None:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        sys.stderr.write("\nno bench JSON line found\n")
        return 1
    bench = json.loads(line)
    rev = subprocess.run(["git", "rev-parse", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    report = {
        **({"round": opts.round_no} if opts.round_no is not None else {}),
        "tool": "tools/bench_full.py",
        "git_rev": rev,
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "sf_dir": opts.sfdir,
        "cpus": opts.cpus,
        "sbt_rc": proc.returncode,
        "wall_sec_incl_sbt": round(wall, 1),
        "n_entries": len(bench.get("queries", {})),
        "bench": bench,
    }
    text = json.dumps(report, indent=2, sort_keys=False)
    if opts.out:
        with open(opts.out, "w") as f:
            f.write(text + "\n")
    print(text)
    return 0 if proc.returncode == 0 and not bench.get("errors") else 1


if __name__ == "__main__":
    sys.exit(main())
