#!/usr/bin/env python3
"""Persist the builder's COMPLETE per-entry full-suite bench as a
committed artifact, with MACHINE-CHECKABLE budget verdicts (r11 VERDICT
Next #4): the in-suite numbers of a 140+-entry suite carry a fixed
per-stage contention overhead that pushed 2-3 entries past their 2x
budget every round, each needing a manual isolated-rerun adjudication.
This tool automates that protocol: every entry is compared against the
committed ledger (tools/budgets.json, the machine-readable twin of
BASELINE.md's budget tables, never-lowered); any in-suite breach is
re-run ISOLATED (SPARK_GRAFT_ONLY, each invocation already best-of-2)
up to --isolated-runs times and judged on the median — so a budget
breach verdict can no longer be a suite-contention artifact, and no
hand re-keying is needed to clear one.

Verdicts per entry:
  ok            in-suite time <= budget
  ok_ambient    sub-second entry breached, but time minus the measured
                ambient drift (run probe vs recorded probe, see below)
                fits the budget -> box noise, not code
  ok_isolated   in-suite breached, isolated median <= budget
  over_budget   isolated median > budget  -> gate fails
  no_budget     entry missing from tools/budgets.json -> gate fails
  missing       budgets.json entry absent from bench output -> gate fails
  error         entry failed to execute -> gate fails

Ambient probe (r13 VERDICT Next #6): graft.Bench times a fixed trivial
job (32 empty task slots + a 2k-row map-aggregate) and reports it as
"ambient" in the bench JSON. budgets.json records the idle-box value
under the reserved "__ambient__" key (never an entry). Entries in the
SUB-SECOND class (budget <= 1.0 s) whose absolute headroom is thinner
than box noise get their breach tested against budget + min(max(0,
ambient - recorded_ambient), 0.5*budget) BEFORE the isolated-rerun
escalation — the automated form of the s_quantize_int8 re-key
adjudication. The credit is capped at half the budget so a loaded box's
large ambient delta can never wave through a genuine regression without
the isolated reruns (r14 ADVICE).

Usage:
  python3 tools/bench_full.py <sfDir> [--cpus N] [--out FILE] [--round N]
                              [--isolated-runs K]
"""
import argparse, json, os, re, statistics, subprocess, sys, time


def run_bench(sfdir, cpus, only=None):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sfdir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("SPARK_GRAFT_ONLY", None)
    if only:
        env["SPARK_GRAFT_ONLY"] = ",".join(only)
    t0 = time.time()
    proc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                          capture_output=True, text=True, env=env)
    wall = time.time() - t0
    line = None
    for ln in proc.stdout.splitlines():
        m = re.search(r'(\{"metric".*\})\s*$', ln)
        if m:
            line = m.group(1)
    if line is None:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        sys.stderr.write("\nno bench JSON line found\n")
        return None, wall, proc.returncode
    return json.loads(line), wall, proc.returncode


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sfdir")
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--out", default=None)
    p.add_argument("--round", type=int, dest="round_no", default=None)
    p.add_argument("--isolated-runs", type=int, default=3,
                   help="isolated re-runs per in-suite breach (median judged)")
    opts = p.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    budgets = json.load(open(os.path.join(here, "budgets.json")))

    bench, wall, rc = run_bench(opts.sfdir, opts.cpus)
    if bench is None:
        return 1
    queries = bench.get("queries", {})
    errors = bench.get("errors", {})

    ambient_rec = budgets.get("__ambient__", {}).get("recorded")
    ambient_now = bench.get("ambient")
    ambient_delta = (max(0.0, ambient_now - ambient_rec)
                     if ambient_rec is not None and ambient_now is not None
                     else 0.0)

    verdicts, isolated = {}, {}
    breaches = []
    for name, t in queries.items():
        b = budgets.get(name)
        if b is None:
            verdicts[name] = "no_budget"
        elif t <= b["budget"]:
            verdicts[name] = "ok"
        elif (b["budget"] <= 1.0
              and t - min(ambient_delta, 0.5 * b["budget"]) <= b["budget"]):
            # sub-second class: absolute headroom thinner than box noise;
            # the run's own ambient probe explains the breach. The credit
            # is CAPPED at half the budget (r14 ADVICE): on a loaded box
            # the raw delta can exceed the budget itself, which would let
            # a genuine regression in a sub-second entry skip the
            # isolated-rerun adjudication entirely. A breach larger than
            # budget + 0.5*budget always escalates to the isolated reruns.
            verdicts[name] = "ok_ambient"
        else:
            breaches.append(name)
    for name in errors:
        verdicts[name] = "error"
    # reverse check: a budgets.json entry absent from the bench output means
    # the suite silently lost coverage -> fail the gate, don't pass quietly
    # ("__"-prefixed keys are gate metadata, not entries)
    for name in budgets:
        if name.startswith("__"):
            continue
        if name not in queries and name not in errors:
            verdicts[name] = "missing"

    # adjudicate in-suite breaches with isolated re-runs (the r6/r11
    # manual protocol, automated): median of K isolated best-of-2 runs
    for name in breaches:
        runs = []
        for _ in range(opts.isolated_runs):
            iso, _, _ = run_bench(opts.sfdir, opts.cpus, only=[name])
            if iso and name in iso.get("queries", {}):
                runs.append(iso["queries"][name])
        med = statistics.median(runs) if runs else None
        isolated[name] = {"runs": runs, "median": med}
        verdicts[name] = ("ok_isolated" if med is not None and
                          med <= budgets[name]["budget"] else "over_budget")

    bad = sorted(n for n, v in verdicts.items()
                 if v in ("over_budget", "no_budget", "error", "missing"))
    rev = subprocess.run(["git", "rev-parse", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    report = {
        **({"round": opts.round_no} if opts.round_no is not None else {}),
        "tool": "tools/bench_full.py",
        "git_rev": rev,
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "sf_dir": opts.sfdir,
        "cpus": opts.cpus,
        "sbt_rc": rc,
        "wall_sec_incl_sbt": round(wall, 1),
        "n_entries": len(queries),
        "budget_ledger": "tools/budgets.json",
        "ambient": {"recorded": ambient_rec, "run": ambient_now,
                    "delta_applied": round(ambient_delta, 3)},
        "verdicts": verdicts,
        "isolated_adjudications": isolated,
        "gate_failures": bad,
        "bench": bench,
    }
    text = json.dumps(report, indent=2, sort_keys=False)
    if opts.out:
        with open(opts.out, "w") as f:
            f.write(text + "\n")
    print(text)
    if bad:
        sys.stderr.write(f"BUDGET GATE FAILED: {bad}\n")
    return 0 if rc == 0 and not bad else 1


if __name__ == "__main__":
    sys.exit(main())
