#!/bin/sh
# Pre-commit hook: regenerate LEAKCHECK.json and stage it, so the COMMITTED
# artifact is always the scanner's own full output at commit time (round-14
# verdict #6 — the round driver overwrites the working-tree copy with a
# provenance-stripped version after its snapshot, which previously left the
# repo's freshness dependent on a manual rerun each round).
#
# Install (idempotent; done once per clone):
#   cp tools/precommit_leakcheck.sh .git/hooks/pre-commit && chmod +x .git/hooks/pre-commit
#
# Round number = latest CORRECTNESS_r{N}.json + 1 (the round in flight).
# Fails open: a scanner error must never block a snapshot commit — the
# committed stale copy is then the evidence something broke.
cd "$(git rev-parse --show-toplevel)" || exit 0
# Match ONLY the plain per-round files: the old strip-all-non-digits sed
# read CORRECTNESS_r19_sf01.json as "1901" and stamped round 1902 into the
# committed LEAKCHECK.json (VERDICT r19 "What's wrong #1"). Leading zeros
# still stripped: dash treats $((09 + 1)) as a FATAL bad-octal error,
# which would block the commit — the opposite of fail-open.
last=$(ls CORRECTNESS_r*.json 2>/dev/null \
  | sed -n 's/^CORRECTNESS_r0*\([0-9][0-9]*\)\.json$/\1/p' | sort -n | tail -1)
round=$((${last:-0} + 1))
if python3 tools/leakcheck.py "$round" >/dev/null 2>&1; then
  git add LEAKCHECK.json
fi
exit 0
