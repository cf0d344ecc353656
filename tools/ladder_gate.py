#!/usr/bin/env python3
"""Per-round oracle gate for the corpus-adaptive LSH ladder queries (NOT
shipped library code — dev/driver tooling like local_check.py).

The sf0.01 correctness gate can never fire the band-width ladders: their
first rung boundary is 16,384 docs / vectors and the shipped fixtures top
out at 5,000 docs / 2,000 vectors (sf0.1), so a regression in the SCALED
band shapes (the 3x20 simhash/pHash rung, the 8x16 RP rung) would hide
behind a fully green CORRECTNESS_rNN.json. Round 16 verified the scaled
shapes ad hoc on the 10x disjoint-replica fixture; this script makes that
check a recorded per-round artifact (VERDICT r16 #6).

What it does:
 1. stages the 10x disjoint-replica corpus via graft.tools.ScaleFixture
    (idempotent marker; 50,000 docs -> SimShape 20-bit rung for simhash
    AND pHash, 20,000 vectors -> RpShape 16-bit rung),
 2. dumps the ladder-affected queries with graft.Verify: the three whose
    plan AND oracle embed a shape ladder (dd_simhash_pairs, mm_phash_dedup,
    sim_rp_pairs) plus dd_simhash (the shared 60-bit code table both
    banded families expand from). This set is complete BY CONSTRUCTION:
    the only consumers of simBitsFor/rpBitsFor/simShapeSql/rpShapeSql/
    rpBandedCodes/simhashBandedPairs/phashBandedPairs outside tools/ are
    those three query bodies (grep re-checked round 17 — the other
    simhash60Stored consumer, dd_purge_manifest, aggregates the CODE
    table, whose content is band-width-independent),
 3. replays their DuckDB oracles via tools/local_check.py (row-for-row,
    columns sorted — the driver's compare),
 4. writes CORRECTNESS_r{N}_ladder.json with per-query status + the rung
    each ladder fired.

Usage: python3 tools/ladder_gate.py <round> [fixtureDir] [outJson]
(Don't run concurrently with another Spark job — the DuckDB replay of the
10x pair oracles spills to /tmp.)
"""
import json
import re
import subprocess
import sys
import time

from local_check import parse_compare_lines

LADDER_QUERIES = ["dd_simhash", "dd_simhash_pairs", "mm_phash_dedup", "sim_rp_pairs"]
FILTER = "^(" + "|".join(LADDER_QUERIES) + ")$"


def fired_rungs(fixture):
    """The rungs the engines actually fire, read from the engine itself
    (graft.tools.LadderRungs wraps the same Scala selectors the queries
    call) — NOT a Python mirror of the thresholds, which would be a third
    statement of the ladder free to drift from the generated-once pair."""
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.LadderRungs {fixture}"],
        capture_output=True, text=True)
    m = re.search(r"\[rungs\] n_docs=(\d+) sim_bits=(\d+) n_vecs=(\d+) "
                  r"rp_bits=(\d+) max_bucket=(\d+)", out.stdout)
    if not m:
        sys.exit(f"LadderRungs produced no rung line:\n{out.stdout[-2000:]}")
    return {"n_docs": int(m.group(1)), "sim_bits_fired": int(m.group(2)),
            "n_vecs": int(m.group(3)), "rp_bits_fired": int(m.group(4)),
            "max_bucket": int(m.group(5))}


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "dev"
    fixture = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1x"
    out_json = sys.argv[3] if len(sys.argv) > 3 else f"CORRECTNESS_r{rnd}_ladder.json"
    vout = "/tmp/vout_ladder"

    subprocess.run(["sbt", "-batch", f"runMain graft.tools.ScaleFixture {fixture}"],
                   check=True)
    subprocess.run(["sbt", "-batch",
                    f"runMain graft.Verify {fixture} {vout} {FILTER}"],
                   check=True)

    t0 = time.time()
    chk = subprocess.run(["python3", "tools/local_check.py", fixture, vout],
                         capture_output=True, text=True)
    # Shared parser (local_check.parse_compare_lines) so the line format
    # and the WARN-means-fail semantics can't drift between this gate and
    # sf01_gate.py; WARN is local_check's rows-equal-but-ORDER-differs
    # outcome and is recorded as fail with its real diagnosis.
    results = {name: r for name, r in parse_compare_lines(chk.stdout).items()
               if name in LADDER_QUERIES}
    for q in LADDER_QUERIES:
        results.setdefault(q, {"status": "fail", "detail": "no compare line emitted"})

    rungs = fired_rungs(fixture)
    artifact = {
        "round": rnd,
        "fixture": fixture,
        **rungs,
        "note": ("ladder-affected queries oracle-replayed at the 10x "
                 "disjoint-replica corpus where the scaled band shapes fire "
                 "(sf0.01/sf0.1 keep the fixture shapes bit-for-bit and "
                 "cannot catch a scaled-rung regression)"),
        "queries": results,
        "compare_wall_s": round(time.time() - t0, 1),
        "ok": all(v["status"] == "ok" for v in results.values()),
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[ladder_gate] wrote {out_json}: "
          + ", ".join(f"{q}={results[q]['status']}" for q in LADDER_QUERIES))
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()
