#!/usr/bin/env python3
"""Merge N full-bench passes into BASELINE_LOCAL.{json,md}.

Each pass file is one bench JSON line (already min-of-3 inside the JVM);
the baseline records the per-query min across passes — the stable warm
number on a shared box. Run:

    python3 tools/merge_baseline.py /tmp/bench_pass_*.json
"""
import json, sys, time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main(argv):
    note = None
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --force-cal0: override the calibration guard below (document why
    # in --note when you do).
    force_cal0 = "--force-cal0" in argv
    argv = [a for a in argv if a != "--force-cal0"]
    paths = argv
    passes, meta, cal0s = [], [], []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        if d.get("errors"):
            print(f"refusing {p}: errors present {list(d['errors'])[:5]}")
            return 1
        passes.append(d["queries"])
        meta.append((d.get("sf"), d.get("cpus"), d.get("reps")))
        # cal0: the frozen per-pass calibration probe (round 11+ bench
        # lines; None for older passes). Recorded so baseline-refresh
        # decisions can condition on MEASURED box health instead of
        # pass-ratio folklore: refresh only from passes whose cal0 is
        # within ~1.1x of the committed baseline's cal0 minimum.
        cal0s.append(d.get("cal0"))
    # provenance from the pass files themselves, not hardcoded: refuse
    # to merge passes that ran at different SF/parallelism
    if len(set(meta)) > 1:
        print(f"refusing: pass provenance differs: {sorted(set(meta))}")
        return 1
    sf, cpus, reps = meta[0]
    # Calibration guard (round 11): a refreshed baseline must not be
    # minted on a degraded box. If the COMMITTED baseline carries a
    # cal0_min, every input pass's cal0 must sit within 1.1x of it;
    # with no committed cal0 yet (first refresh after the probe landed)
    # the passes must at least agree among THEMSELVES within 1.25x —
    # a wildly spread probe means the box was unstable mid-session.
    have = [c for c in cal0s if c is not None]
    if have and not force_cal0:
        committed = None
        bp = ROOT / "BASELINE_LOCAL.json"
        if bp.exists():
            committed = json.loads(bp.read_text()).get("cal0_min")
        if committed:
            # a pass WITHOUT cal0 cannot prove it ran on a healthy box —
            # mixing one pre-round-11 (or stripped) pass file into a
            # merge would mint a baseline from an unchecked, possibly
            # degraded pass. Refuse, don't silently bypass (ADVICE r11).
            no_cal = [Path(p).name for p, c in zip(paths, cal0s) if c is None]
            if no_cal:
                print(f"refusing: committed cal0_min={committed} but these "
                      f"passes carry no cal0: {no_cal} (regenerate them with "
                      "the current bench, or --force-cal0)")
                return 1
            bad = [(p, c) for p, c in zip(paths, cal0s)
                   if c is not None and c > 1.1 * committed]
            if bad:
                print(f"refusing: cal0 over 1.1x of committed min {committed}: "
                      f"{[(Path(p).name, c) for p, c in bad]} "
                      "(box degraded — rerun when cal0 recovers, or --force-cal0)")
                return 1
        elif max(have) > 1.25 * min(have):
            print(f"refusing: cal0 spread {min(have)}..{max(have)} exceeds "
                  "1.25x within the session (unstable box — rerun, or --force-cal0)")
            return 1
    names = set()
    for q in passes:
        names |= set(q)
    mins = {}
    for n in sorted(names):
        vals = [q[n] for q in passes if q.get(n) is not None]
        if len(vals) != len(passes):
            print(f"refusing: {n} missing/null in some pass")
            return 1
        mins[n] = min(vals)
    reps_s = f"min-of-{reps}" if reps else "warm"
    prov = (f"local[{cpus}], {sf}" if cpus else "provenance absent from pass "
            "files (pre-r5 bench line without sf/cpus/reps fields)")
    out = {
        "method": f"per-query min over {len(passes)} warm {reps_s} passes, "
                  f"{prov}" + (f"; {note}" if note else ""),
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_queries": len(mins),
        "total_sec": round(sum(mins.values()), 3),
        "cal0_per_pass": cal0s,
        "cal0_min": min((c for c in cal0s if c is not None), default=None),
        "queries": mins,
    }
    (ROOT / "BASELINE_LOCAL.json").write_text(json.dumps(out, indent=1) + "\n")
    cal_note = (f"cal0 (frozen calibration probe) per pass: {cal0s}; min "
                f"{out['cal0_min']}. Refresh criterion: only merge passes "
                "whose cal0 is within ~1.1x of the committed cal0_min."
                if out["cal0_min"] is not None else
                "cal0 absent (pre-round-11 pass files).")
    md = ["# BASELINE_LOCAL — committed per-query warm minimums", "",
          out["method"], "", cal_note, "",
          f"Generated {out['generated_at']} — {out['n_queries']} queries, "
          f"{out['total_sec']} s summed mins.", "",
          "| query | min sec |", "|---|---|"]
    md += [f"| {n} | {v:.3f} |" for n, v in sorted(mins.items())]
    (ROOT / "BASELINE_LOCAL.md").write_text("\n".join(md) + "\n")
    print(f"{len(mins)} queries, total {out['total_sec']}s -> BASELINE_LOCAL.json/md")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
