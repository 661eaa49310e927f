#!/usr/bin/env python3
"""Like-for-like bench control: re-bench the PRIOR round's code on the
CURRENT testdata for the top-N slowest queries, so environmental drift
(driver-regenerated parquet, host contention) is machine-checked
instead of hand-argued.

Method:
  1. Pick the top-N slowest queries from a bench JSON (default:
     bench_last.json).
  2. `git worktree add` the prior round's commit (last commit whose
     subject matches "round <k>:", i.e. the driver's round boundary),
     build it, and run Bench there with SPARK_GRAFT_ONLY=<those keys>.
  3. Run the SAME restricted bench from the current tree.
  4. Emit ratios to bench_control.json: ratio ≈ 1.0 everywhere ⇒ any
     absolute drift vs the prior round's recorded numbers is
     environmental, not a code regression.

Usage: python3 tools/bench_control.py [bench_json] [top_n] [sf_dir] [prior]
  `prior` pins the control commit explicitly (e.g. an older round
  boundary when several rounds of drift are unattributed); default is
  the most recent "round <k>:" commit below HEAD.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, shell=True, cwd=cwd, env=e,
                          capture_output=True, text=True)


def bench(tree, keys, sf_dir, cpus="16"):
    r = sh(f'sbt -batch "runMain graft.Bench"', cwd=tree, env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": cpus,
        "SPARK_GRAFT_ONLY": ",".join(keys),
    })
    for line in (r.stdout + r.stderr).splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))["queries"]
    raise SystemExit(f"no metric line from bench in {tree}:\n{r.stdout[-2000:]}")


def main():
    bench_json = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/bench_last.json"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    if os.environ.get("BENCH_CONTROL_KEYS"):
        keys = os.environ["BENCH_CONTROL_KEYS"].split(",")
        print(f"explicit key set: {keys}")
    else:
        queries = json.load(open(bench_json))["queries"]
        keys = [k for k, _ in sorted(queries.items(), key=lambda kv: -kv[1])[:top_n]]
        print(f"top-{top_n} slowest: {keys}")

    if len(sys.argv) > 4:
        prior = sh(f"git rev-parse {sys.argv[4]}").stdout.strip()
    else:
        log = sh('git log --format="%H %s"').stdout.splitlines()
        prior = next((l.split()[0] for l in log[1:]
                      if re.search(r"\bround \d+:", l)), None)
    if not prior:
        raise SystemExit("no prior-round boundary commit found")
    print(f"prior round boundary: {prior[:12]}")

    wt = "/tmp/graft_bench_control_wt"
    sh(f"git worktree remove --force {wt}")
    r = sh(f"git worktree add --detach {wt} {prior}")
    if r.returncode != 0:
        raise SystemExit(f"worktree add failed: {r.stderr}")
    try:
        old = bench(wt, keys, sf_dir)
        new = bench(REPO, keys, sf_dir)
    finally:
        sh(f"git worktree remove --force {wt}")

    rows = {k: {"prior_code_sec": old.get(k), "current_code_sec": new.get(k),
                "ratio_current_over_prior":
                    round(new[k] / old[k], 3) if old.get(k) and new.get(k) else None}
            for k in keys}
    out = {"method": "prior-round code re-benched on CURRENT data vs current code, "
                     "same keys/cpus/sf — ratio~1.0 means drift is environmental",
           "prior_commit": prior, "sf_dir": sf_dir, "queries": rows}
    with open(f"{REPO}/bench_control.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
