#!/usr/bin/env python3
"""Write the COMPLETE per-round bench artifact BENCH_LOCAL_r{N}.json.

The driver's BENCH_r{N}.json keeps only the tail of the sbt output, so
alphabetically-early per-query timings can be truncated away; this tool
snapshots the full bench JSON line (all queries + run metadata + the
ratio against BASELINE_LOCAL.json) so round-over-round regressions stay
diffable without the driver artifact. Run:

    python3 tools/bench_snapshot.py <round> /tmp/bench_pass.json [--note "..."]

<round> is the integer round number; the pass file is one bench JSON
line as printed by `runMain graft.Bench` (strip sbt's [info] prefix).
"""
import json, sys, time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def load_line(path):
    txt = Path(path).read_text()
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main(argv):
    note = None
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        print(__doc__)
        return 1
    rnd, path = int(argv[0]), argv[1]
    d = load_line(path)
    if d.get("errors"):
        print(f"refusing: bench reported errors {list(d['errors'])[:5]}")
        return 1
    queries = d["queries"]
    if any(v is None for v in queries.values()):
        nulls = [k for k, v in queries.items() if v is None]
        print(f"refusing: null timings for {nulls[:5]}")
        return 1

    base_path = ROOT / "BASELINE_LOCAL.json"
    ratios = {}
    if base_path.exists():
        base = json.loads(base_path.read_text())["queries"]
        shared = sorted(set(queries) & set(base))
        ratios = {
            "n_shared": len(shared),
            "sum_ratio": round(sum(queries[q] for q in shared) /
                               sum(base[q] for q in shared), 4),
            "worst": sorted(((round(queries[q] / base[q], 3), q)
                             for q in shared), reverse=True)[:10],
            "new_queries": sorted(set(queries) - set(base)),
        }

    out = {
        "round": rnd,
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf": d.get("sf"),
        "cpus": d.get("cpus"),
        "reps": d.get("reps"),
        # frozen calibration probe (round 11+; see Bench.cal0). When the
        # input line is a hand-merged fold of several passes, pass the
        # per-pass list through a "cal0_per_pass" field on the line.
        "cal0": d.get("cal0"),
        "cal0_per_pass": d.get("cal0_per_pass"),
        "note": note,
        "n_queries": len(queries),
        "total_sec": round(sum(queries.values()), 3),
        "vs_baseline": ratios,
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    dest = ROOT / f"BENCH_LOCAL_r{rnd:02d}.json"
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(f"{len(queries)} queries, total {out['total_sec']}s, "
          f"vs baseline {ratios.get('sum_ratio')} -> {dest.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
