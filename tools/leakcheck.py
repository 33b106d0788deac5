#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json with scan evidence.

The artifact used to carry only a round counter and hit lists, which made
"re-ran clean" indistinguishable from "bumped the counter" (ADVICE r3).
Now it records when the scan ran, how many files it covered, and the
pattern set, so each round's entry is self-evidencing.
"""
import json, re, sys, time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATTERNS = {
    # Non-public package/import roots (nothing in this repo may depend on
    # anything that is not Spark, the JDK, or the scala stdlib).
    "internal-import": r"import\s+(com\.anthropic|anthropic\.|ai\.anthropic)",
    "internal-url": r"https?://[a-z0-9.-]*(anthropic|claude)[a-z0-9.-]*\.(com|ai|dev)",
    "internal-pkg2": r"\b(claude[-_]cli|claude[-_]code)\b",
    "internal-bucket": r"(s3|gs)://[a-z0-9._-]*(anthropic|claude|internal)[a-z0-9._-]*",
    "slack-link": r"slack\.com/archives|#claude-",
    "api-key": r"sk-ant-[A-Za-z0-9-]{10,}",
    "axon-env": r"\bANTHROPIC_[A-Z_]+\b",
}

EXTS = {".scala", ".sbt", ".py", ".md", ".json", ".sh", ".java", ".sql", ".conf"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "fixtures"}
SELF = Path(__file__).resolve()


def files():
    for p in ROOT.rglob("*"):
        if p.is_file() and p.suffix in EXTS \
                and not any(d in p.parts for d in SKIP_DIRS) \
                and p.resolve() != SELF and p.name != "LEAKCHECK.json":
            yield p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    n = 0
    for p in files():
        n += 1
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for key, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[key].append(f"{p.relative_to(ROOT)}:{line}")
    out = {
        "round": rnd,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_files_scanned": n,
        "patterns": {k: v for k, v in PATTERNS.items()},
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"scanned {n} files, {out['n_hits']} hits")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
