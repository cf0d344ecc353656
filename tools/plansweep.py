#!/usr/bin/env python3
"""Per-round plan anti-pattern gate (NOT shipped library code — dev/driver
tooling like ladder_gate.py). Wraps graft.tools.PlanSweep:

 1. runs the sweep at sf0.01 -> PLANSWEEP_r{N}.json (per-query
    CartesianProduct / SortMergeJoin / BroadcastNestedLoopJoin /
    collect_list node counts + flagged anti-patterns),
 2. diffs against the most recent prior PLANSWEEP_r*.json: FAILS on any
    query whose cartesian count GREW (a refactor silently introducing a
    cartesian product — the exact regression the manual PLANS.md grep
    watched for), and on any flagged entry from the sweep itself
    (cartesian nodes, non-equi joins with both sides over the size bound).
    BNLJ growth is INFO, not failure: the suite's BNLJs are legitimate
    broadcast 1-row/O(settings) scalar attaches, and the dangerous
    data-by-data case is already caught by the sweep's own
    bnlj_both_sides_large size-bound flag — hard-failing on count growth
    would fail the round for adding one more legit scalar attach.
    SMJ/collect growth and brand-new queries are likewise INFO (adding a
    legitimate big-table join or query is normal work; the artifact diff
    makes it visible).

Usage: python3 tools/plansweep.py <round> [sfDir]
"""
import glob
import json
import re
import subprocess
import sys


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "dev"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = f"PLANSWEEP_r{rnd}.json"

    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.PlanSweep {sf} {out}"],
        capture_output=True, text=True)
    if "[plansweep] wrote" not in r.stdout:
        sys.exit(f"PlanSweep produced no summary line:\n{r.stdout[-2000:]}"
                 f"\n{r.stderr[-1000:]}")
    cur = json.load(open(out))

    failures = [f"sweep flagged: {f}" for f in cur["flagged"]]

    prior_files = sorted(
        (p for p in glob.glob("PLANSWEEP_r*.json") if p != out),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1))
        if re.search(r"_r(\d+)", p) else -1)
    if prior_files:
        prev_file = prior_files[-1]
        prev = json.load(open(prev_file))["queries"]
        for q, c in sorted(cur["queries"].items()):
            if q not in prev:
                print(f"INFO {q}: new query ({c})")
                continue
            if c["cartesian"] > prev[q]["cartesian"]:
                failures.append(
                    f"{q}: cartesian grew {prev[q]['cartesian']} -> "
                    f"{c['cartesian']} (vs {prev_file})")
            for k in ("bnlj", "smj", "collect"):
                if c[k] != prev[q][k]:
                    print(f"INFO {q}: {k} changed {prev[q][k]} -> {c[k]}")
        for q in sorted(set(prev) - set(cur["queries"])):
            print(f"INFO {q}: removed since {prev_file}")
        print(f"[plansweep] diffed against {prev_file}")
    else:
        print("[plansweep] no prior PLANSWEEP_r*.json — recorded as baseline")

    print(f"[plansweep] totals={cur['totals']} failures={len(failures)}")
    for f in failures:
        print(f"FAIL {f}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
