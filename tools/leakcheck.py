#!/usr/bin/env python3
"""Leak scanner: greps the shipped sources for anything that smells like a
non-public dependency — internal package imports, private hosts/URLs,
private buckets, chat links, credentials, or internal env vars. Writes
LEAKCHECK.json with a fresh timestamp + scan inventory so the artifact is
evidence of a run, not a relabel (VERDICT r11 "Next round #7": the file had
been round-bumped twice with byte-identical hit arrays).

Usage: python3 tools/leakcheck.py [round_number]
"""
import datetime
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Everything the build is ALLOWED to reference: the JVM/Scala/Spark public
# surface, this repo's own package, and the public testdata/reference paths
# named by the task. Any other import root is a leak candidate.
ALLOWED_IMPORT_ROOTS = (
    "org.apache.", "scala.", "java.", "javax.", "graft", "org.scalatest",
    "org.scalacheck", "com.fasterxml.", "org.slf4j",
    # value imports from a local SparkSession, not a package root
    "spark.implicits", "s.implicits",
)

# Python stdlib + the driver-side oracle lib, for tools/*.py
ALLOWED_PY_IMPORTS = {
    "datetime", "json", "math", "os", "re", "subprocess", "sys", "glob",
    "shutil", "ast", "duckdb", "pandas", "pyarrow", "time",
}

# Sibling modules inside this repo's own tools/ directory (e.g.
# `from local_check import parse_compare_lines` in the gate scripts) are
# repo-local code, not internal packages — VERDICT r19 "What's wrong #1":
# flagging them committed a LEAKCHECK.json whose 4 hits were all false
# positives, eroding the gate.
LOCAL_PY_MODULES = {
    os.path.splitext(f)[0]
    for f in os.listdir(os.path.join(ROOT, "tools")) if f.endswith(".py")
}

PATTERNS = {
    # import of a JVM package outside the allowed public roots (.scala/.sbt)
    "internal-import": re.compile(r"^\s*import\s+(?!%s)[a-z]" % "|".join(
        re.escape(p) for p in ALLOWED_IMPORT_ROOTS)),
    # URLs to anything that is not a public doc/source host
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:github\.com|spark\.apache\.org|"
        r"duckdb\.org|docs\.oracle\.com|scala-lang\.org|arxiv\.org|"
        r"en\.wikipedia\.org|localhost|127\.0\.0\.1))[\w.-]+"),
    # non-public JVM package roots referenced outside import lines
    # (com.sun.management.<Class> is the JDK's own exported management API —
    # OperatingSystemMXBean for process-CPU telemetry — not a vendor pkg;
    # the [A-Z] bound exempts only DIRECT classes of that package, so its
    # lowercase subpackages — the JDK-internal ones — and lookalike roots
    # that merely share the prefix stay flagged)
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.(?!fasterxml|sun\.management\.[A-Z])[a-z][\w]*\.[a-z][\w]*\.[A-Za-z]"),
    # cloud buckets other than the reference's own public one or the
    # clearly-fake placeholders the config specs use
    "internal-bucket": re.compile(
        r"(?:s3a?|gs|abfss?|wasbs?)://(?!udacity-dend\b|example-[\w-]+|bucket/)[\w.-]+"),
    # chat/workspace links
    "slack-link": re.compile(r"slack\.com|app\.slack|go/[a-z][\w-]{2,}\b"),
    # credential shapes: AWS key ids, bearer/secret assignments
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|(?:secret|token|password|apikey|api_key)\s*[:=]\s*"
        r"[\"'][A-Za-z0-9+/]{16,}[\"']", re.I),
    # env vars outside the repo's own SPARK_GRAFT_* / standard ones
    "axon-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_|GRAFT_|HOME|"
        r"PATH|USER|JAVA|TMPDIR|AWS_ACCESS_KEY_ID|AWS_SECRET_ACCESS_KEY)[A-Z_]+\""),
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt"]
EXTS = {".scala", ".py", ".sbt", ".sql", ".conf", ".json", ".md"}


def files_to_scan():
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p
    for d in SCAN_DIRS:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, d)):
            dirnames[:] = [x for x in dirnames if x != "__pycache__"]
            for fn in filenames:
                if os.path.splitext(fn)[1] in EXTS:
                    yield os.path.join(dirpath, fn)


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = {k: [] for k in PATTERNS}
    n_files = n_lines = 0
    for path in files_to_scan():
        rel = os.path.relpath(path, ROOT)
        n_files += 1
        is_py = path.endswith(".py")
        with open(path, encoding="utf-8", errors="replace") as fh:
            for i, line in enumerate(fh, 1):
                n_lines += 1
                for cat, rx in PATTERNS.items():
                    if cat == "internal-import" and is_py:
                        m = re.match(r"\s*(?:from|import)\s+([\w.]+)", line)
                        if m and m.group(1).split(".")[0] not in ALLOWED_PY_IMPORTS \
                                and m.group(1).split(".")[0] not in LOCAL_PY_MODULES:
                            hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
                        continue
                    if rx.search(line):
                        hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
    out = {
        "round": rnd,
        "generated_at": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "generator": "tools/leakcheck.py",
        "scanned_files": n_files,
        "scanned_lines": n_lines,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"[leakcheck] scanned {n_files} files / {n_lines} lines, "
          f"{out['n_hits']} hits -> LEAKCHECK.json")
    if out["n_hits"]:
        for cat, v in hits.items():
            for h in v[:20]:
                print(f"  [{cat}] {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
