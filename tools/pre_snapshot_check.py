#!/usr/bin/env python3
"""Pre-snapshot guard: no engine code may change after the round's last
test+bench pass.

Round 8 shipped its one regression exactly this way — a src/main edit
landed in the end-of-round snapshot commit, ten minutes after the final
bench, and was never re-tested. The rule (README "Process"): snapshot
commits touch docs/artifacts only; any src/main change re-runs
`sbt test` and the affected queries first.

Usage:
  tools/pre_snapshot_check.py stamp   # run right after a green test+bench
  tools/pre_snapshot_check.py check   # run right before the snapshot commit

`stamp` fingerprints every file under src/main (path + content hash)
into target/last_tested_tree.sha256. `check` recomputes and exits 1,
listing the drifted files, if src/main no longer matches the stamped
(last-tested) tree.
"""
import hashlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main")
STAMP = os.path.join(ROOT, "target", "last_tested_tree.sha256")


def fingerprint():
    entries = []
    for dirpath, _, files in os.walk(SRC):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, ROOT)
            with open(p, "rb") as fh:
                entries.append((rel, hashlib.sha256(fh.read()).hexdigest()))
    return dict(sorted(entries))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    fp = fingerprint()
    if mode == "stamp":
        os.makedirs(os.path.dirname(STAMP), exist_ok=True)
        with open(STAMP, "w") as fh:
            for rel, h in fp.items():
                fh.write(f"{h}  {rel}\n")
        print(f"stamped {len(fp)} src/main files -> {STAMP}")
        return 0
    if not os.path.exists(STAMP):
        print("pre_snapshot_check: NO STAMP — run `stamp` after the final "
              "test+bench pass, before any snapshot commit", file=sys.stderr)
        return 1
    stamped = {}
    with open(STAMP) as fh:
        for line in fh:
            h, rel = line.rstrip("\n").split("  ", 1)
            stamped[rel] = h
    drifted = sorted(
        set(k for k in fp if stamped.get(k) != fp[k])
        | set(k for k in stamped if k not in fp))
    if drifted:
        print("pre_snapshot_check: src/main DRIFTED since the last tested "
              "tree — re-run sbt test + bench before committing:",
              file=sys.stderr)
        for rel in drifted:
            print(f"  {rel}", file=sys.stderr)
        return 1
    print(f"pre_snapshot_check: OK — src/main matches the last tested tree "
          f"({len(fp)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
