#!/usr/bin/env python3
"""THE bench entry point: run graft.Bench and stamp its one JSON line
into the committed artifact `bench_last.json` (plus host context), so
SURVEY/README quote exactly one source of truth instead of hand-copied
numbers from ad-hoc runs.

Usage: python3 tools/run_bench.py [sf_dir] [cpus]
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": cpus,
                "SPARK_DRIVER_MEM": env.get("SPARK_DRIVER_MEM", "16g")})
    r = subprocess.run('sbt -batch "runMain graft.Bench"', shell=True,
                       cwd=REPO, env=env, capture_output=True, text=True)
    line = None
    for ln in (r.stdout + r.stderr).splitlines():
        m = re.search(r'\{"metric".*\}', ln)
        if m:
            line = json.loads(m.group(0))
    if line is None:
        raise SystemExit(f"no metric line from bench:\n{r.stdout[-2000:]}")
    line["cpus"] = cpus
    with open(f"{REPO}/bench_last.json", "w") as f:
        json.dump(line, f, indent=1)
    print(f"bench_last.json: {line['value']:.1f}s total "
          f"across {len(line['queries'])} queries (sf={sf_dir}, {cpus} CPUs)")


if __name__ == "__main__":
    main()
