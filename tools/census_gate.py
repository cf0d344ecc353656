#!/usr/bin/env python3
"""Per-round ladder-rung census artifact (NOT shipped library code —
dev/driver tooling like ladder_gate.py). VERDICT r17 #4: the top-rung
bucket censuses (SimShape 2x30 at 2.56M docs, RpShape 4x32 at 4.4M
vectors) were produced once for SCALING.md; a ladder retune or bucketing
skeleton change could silently shift them. This makes the census a
recorded per-round artifact:

 1. stages the rung-sized single-table fixtures (idempotent markers),
 2. runs graft.tools.DiagBuckets on each (analytic kept-pair mass — the
    sum of C(n,2) over under-cap buckets, what the banded expansion WILL
    emit — so no pair expansion runs),
 3. writes CENSUS_r{N}.json (family, rung, N, buckets, max bucket,
    over_cap, kept mass, pairs/row),
 4. diffs against the most recent prior CENSUS_r*.json: the fixtures and
    the banding are deterministic, so ANY change vs prior is a ladder or
    skeleton shift and FAILS the gate (a deliberate retune commits the new
    census as its evidence).

Usage: python3 tools/census_gate.py <round>
(~6-8 min: two DiagBuckets passes over the rung fixtures; don't run
concurrently with another sbt job.)
"""
import glob
import json
import re
import sys

from scaling import (RUNG_DOCS_DIR, RUNG_DOCS_REPLICAS, RUNG_VECS_DIR,
                     RUNG_VECS_REPLICAS, run_diag, stage_fixture)


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "dev"
    out = f"CENSUS_r{rnd}.json"

    stage_fixture(RUNG_DOCS_DIR, RUNG_DOCS_REPLICAS, "documents")
    stage_fixture(RUNG_VECS_DIR, RUNG_VECS_REPLICAS, "embeddings")
    doc = run_diag(RUNG_DOCS_DIR, "simhash,phash")
    vec = run_diag(RUNG_VECS_DIR, "rp")

    families = {}
    for fam, row in [("simhash", doc["simhash"]), ("phash", doc["phash"]),
                     ("rp", vec["rp"])]:
        code_bits = 128 if fam == "rp" else 60
        families[fam] = {
            "rung": f"{code_bits // row['bits']}x{row['bits']}",
            "n": row["n"], "buckets": row["buckets"], "max_bucket": row["max"],
            "over_cap": row["over_cap"], "kept_pair_mass": row["kept"],
            "pairs_per_row": round(row["kept"] / row["n"], 2),
            "cap": row["cap"],
        }

    failures = []
    prior_files = sorted(
        (p for p in glob.glob("CENSUS_r*.json") if p != out),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1))
        if re.search(r"_r(\d+)", p) else -1)
    if prior_files:
        prev = json.load(open(prior_files[-1]))["families"]
        for fam, row in families.items():
            if fam not in prev:
                print(f"INFO {fam}: new family")
                continue
            for k in ("rung", "n", "buckets", "max_bucket", "over_cap",
                      "kept_pair_mass", "cap"):
                if row[k] != prev[fam].get(k):
                    failures.append(
                        f"{fam}.{k} changed {prev[fam].get(k)} -> {row[k]} "
                        f"(vs {prior_files[-1]})")
        print(f"[census_gate] diffed against {prior_files[-1]}")
    else:
        print("[census_gate] no prior CENSUS_r*.json — recorded as baseline")

    artifact = {
        "round": rnd,
        "fixtures": {"documents": f"{RUNG_DOCS_DIR} ({RUNG_DOCS_REPLICAS}x)",
                     "embeddings": f"{RUNG_VECS_DIR} ({RUNG_VECS_REPLICAS}x)"},
        "note": ("top-rung bucket census, analytic kept-pair mass (sum of "
                 "C(n,2) over under-cap buckets) via graft.tools.DiagBuckets "
                 "— deterministic given the fixtures, so any diff vs the "
                 "prior round is a ladder/skeleton shift"),
        "families": families,
        "diff_failures": failures,
        "ok": not failures,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[census_gate] wrote {out}: "
          + ", ".join(f"{f}={r['rung']} kept={r['kept_pair_mass']}"
                      for f, r in families.items()))
    for f in failures:
        print(f"FAIL {f}")
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()
