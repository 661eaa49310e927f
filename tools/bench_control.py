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
import statistics
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


def bench_median(tree, keys, sf_dir, legs):
    """Median of `legs` independent bench runs per key — STREAMING keys
    only: their subset legs swing up to 3.5x on byte-identical code
    (micro-batch timing vs fixture/JVM warmup), so a single control
    leg cannot arbitrate a streaming regression. The round-16 lesson,
    machine-fixed."""
    runs = [bench(tree, keys, sf_dir) for _ in range(legs)]
    return {k: statistics.median([r[k] for r in runs if k in r])
            for k in keys if any(k in r for r in runs)}


def gate_block(entry_source, key):
    """The gate's defining block inside SparkEntry.scala: from the
    `"<key>" ->` binding to the next top-level `"..." ->` binding.
    Whitespace-normalized so formatting-only churn doesn't flag."""
    m = re.search(r'"%s"\s*->' % re.escape(key), entry_source)
    if not m:
        return None
    rest = entry_source[m.end():]
    nxt = re.search(r'\n    "[a-z]\w+"\s*->', rest)
    block = rest[:nxt.start()] if nxt else rest[:20000]
    return re.sub(r"\s+", " ", block).strip()


def gate_changed_flags(prior, keys):
    """Per key: did the gate's own code change between the prior tree
    and HEAD? A grown gate legitimately costs more, so its control
    ratio says nothing about engine regressions — the round-14
    src52/src57 lesson. Compares the SparkEntry entry block AND any
    operator files it references."""
    path = "src/main/scala/graft/SparkEntry.scala"
    old_src = sh(f"git show {prior}:{path}").stdout
    new_src = open(f"{REPO}/{path}").read()
    flags = {}
    for k in keys:
        ob, nb = gate_block(old_src, k), gate_block(new_src, k)
        changed = ob != nb
        # a delegating entry ("-> Operators.fn _") also changes when
        # its operator file does
        if not changed and nb:
            for f in set(re.findall(r"(?:graft\.)?(?:operators|streaming|multimodal)\.(\w+)", nb)):
                for sub in ("operators", "streaming", "multimodal"):
                    fp = f"src/main/scala/graft/{sub}/{f}.scala"
                    if os.path.exists(f"{REPO}/{fp}"):
                        if sh(f"git diff --quiet {prior} HEAD -- {fp}").returncode != 0:
                            changed = True
        flags[k] = changed
    return flags


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
    # streaming keys get MEDIAN-OF-3 legs per tree (their single-leg
    # subset noise reaches 3.5x on identical code); batch keys one leg
    st_keys = [k for k in keys if k.startswith("st")]
    batch_keys = [k for k in keys if not k.startswith("st")]
    try:
        old, new = {}, {}
        if batch_keys:
            old.update(bench(wt, batch_keys, sf_dir))
            new.update(bench(REPO, batch_keys, sf_dir))
        if st_keys:
            old.update(bench_median(wt, st_keys, sf_dir, 3))
            new.update(bench_median(REPO, st_keys, sf_dir, 3))
    finally:
        sh(f"git worktree remove --force {wt}")

    gate_flags = gate_changed_flags(prior, keys)
    rows = {k: {"prior_code_sec": old.get(k), "current_code_sec": new.get(k),
                "ratio_current_over_prior":
                    round(new[k] / old[k], 3) if old.get(k) and new.get(k) else None,
                "gate_changed": gate_flags.get(k),
                "legs": 3 if k.startswith("st") else 1}
            for k in keys}
    out = {"method": "prior-round code re-benched on CURRENT data vs current code, "
                     "same keys/cpus/sf — ratio~1.0 means drift is environmental. "
                     "gate_changed=true keys GREW their gate between the trees: "
                     "their ratio measures the new gate leg, not the engine — "
                     "exclude them from regression claims. Streaming (st*) "
                     "entries are MEDIAN-OF-3 legs per tree (legs=3): their "
                     "single-leg subset noise reaches 3.5x on identical code",
           "prior_commit": prior, "sf_dir": sf_dir, "queries": rows}
    with open(f"{REPO}/bench_control.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
