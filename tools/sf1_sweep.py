#!/usr/bin/env python3
"""Full-surface sf1 oracle sweep (VERDICT r10 Next #1): run EVERY
SparkEntry oracle against the scaled sf1 fixture with a per-entry
wall-clock bound, and emit a CORRECTNESS-style JSON artifact.

The driver's own gate stops at sf0.1; both scale bugs found so far
(r9 CC non-convergence, r10 fixture quadratics) lived exactly where
volume changes behavior, so this sweep re-checks the whole surface one
decade up. DuckDB cost at sf1 is the wildcard — some oracles unroll
iterative rounds as MATERIALIZED CTEs over 500k docs / 2M vectors —
hence each entry runs in a forked worker with a hard timeout and the
artifact records `timeout` (a documented resource bound, NOT a
mismatch) for entries whose ORACLE exceeds the bound. Any row/schema/
cell mismatch is a real failure and exits non-zero.

Usage:
  python3 tools/sf1_sweep.py <sfDir> <verifyOutDir> [--timeout S] \
      [--out FILE] [--only q1,q2,...]

Run `graft.Verify <sfDir> <verifyOutDir>` first (the Spark side).
"""
import argparse, json, os, subprocess, sys, time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sfdir")
    p.add_argument("outdir")
    p.add_argument("--timeout", type=float, default=900.0,
                   help="per-entry oracle wall-clock bound, seconds")
    p.add_argument("--out", default=None, help="JSON artifact path")
    p.add_argument("--only", default=None,
                   help="comma-separated subset of query names")
    opts = p.parse_args()

    with open(os.path.join(opts.outdir, "oracle_sql.json")) as fh:
        names = sorted(json.load(fh))
    if opts.only:
        keep = {n.strip() for n in opts.only.split(",") if n.strip()}
        unknown = keep - set(names)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in keep]

    here = os.path.dirname(os.path.abspath(__file__))
    selfcheck = os.path.join(here, "selfcheck.py")
    try:
        git_rev = subprocess.check_output(
            ["git", "-C", os.path.dirname(here), "rev-parse", "HEAD"],
            text=True).strip()
    except Exception:
        git_rev = None

    entries, n_fail, n_timeout = {}, 0, 0
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, selfcheck, opts.sfdir, opts.outdir, name],
                capture_output=True, text=True, timeout=opts.timeout)
            dt = round(time.monotonic() - t0, 2)
            ok = proc.returncode == 0
            # selfcheck's per-entry line carries the row count / issue text
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith(("OK ", "FAIL "))), "").strip()
            entries[name] = {"status": "ok" if ok else "fail",
                             "sec": dt, "detail": line}
            if not ok:
                n_fail += 1
        except subprocess.TimeoutExpired:
            dt = round(time.monotonic() - t0, 2)
            entries[name] = {
                "status": "timeout", "sec": dt,
                "detail": f"oracle exceeded {opts.timeout:.0f}s bound "
                          "(DuckDB resource bound, not a mismatch)"}
            n_timeout += 1
        print(f"[{i}/{len(names)}] {entries[name]['status'].upper():7s} "
              f"{name} ({entries[name]['sec']}s)", flush=True)

    report = {
        "tool": "tools/sf1_sweep.py",
        "git_rev": git_rev,
        "swept_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "sfdir": opts.sfdir,
        "per_entry_timeout_sec": opts.timeout,
        "n_entries": len(names),
        "n_ok": len(names) - n_fail - n_timeout,
        "n_fail": n_fail,
        "n_timeout": n_timeout,
        "entries": entries,
    }
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=False)
        print(f"wrote {opts.out}")
    print(f"{report['n_ok']}/{len(names)} ok, {n_fail} fail, "
          f"{n_timeout} timeout")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
