#!/usr/bin/env python3
"""One-command per-round evidence-gate runner (NOT shipped library code —
dev/driver tooling). Round 18 authored three gates and committed artifacts
for only one; round 19 ran them by hand. This makes the whole per-round
convention a single command so no round forgets a gate:

  1. plansweep.py <round>  -> PLANSWEEP_r{N}.json   (plan anti-patterns +
                              round-over-round diff)
  2. census_gate.py <round> -> CENSUS_r{N}.json     (ladder-rung census,
                              any drift vs prior fails)
  3. ladder_gate.py <round> -> CORRECTNESS_r{N}_ladder.json (10x fixture,
                              the scale where the band ladders fire)
  4. sf01_gate.py <round>  -> CORRECTNESS_r{N}_sf01.json (ENTIRE suite
                              oracle-replayed at sf0.1)
  5. nullgrid_gate.py <round> -> CORRECTNESS_r{N}_nullgrid.json (ENTIRE
                              suite oracle-replayed over the combined
                              NULL-grid corpus — the engine-divergence
                              class all-non-null fixtures cannot fire)

Gates run sequentially (sbt is single-instance) and ALL of them run even
if an earlier one fails — a round wants the full evidence picture, not
the first failure. Exit code is non-zero if any gate failed.

Usage: python3 tools/round_gates.py <round>
(~25-35 min total; don't run concurrently with another sbt/Spark job.)
"""
import subprocess
import sys
import time

GATES = ["plansweep.py", "census_gate.py", "ladder_gate.py", "sf01_gate.py",
         "nullgrid_gate.py"]


def main():
    if len(sys.argv) < 2:
        sys.exit("usage: python3 tools/round_gates.py <round>")
    rnd = sys.argv[1]
    failures = []
    for gate in GATES:
        t0 = time.time()
        print(f"[round_gates] running {gate} {rnd} ...", flush=True)
        rc = subprocess.run(
            ["python3", f"tools/{gate}", rnd]).returncode
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[round_gates] {gate}: {status} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if rc != 0:
            failures.append(gate)
    if failures:
        print(f"[round_gates] FAILED gates: {', '.join(failures)}")
    else:
        print("[round_gates] all gates green — commit the five artifacts")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
