#!/usr/bin/env bash
# Round-12 ghost retirement (VERDICT r11 task #2): run the combined
# property surface (PropertyChecks + MutationProps + NativeProps, 19
# properties) under FRESH seeds, N times, keeping the FULL log of every
# sweep — the r11 "18/19" incident came from a count-only capture that
# discarded its log, so whether it was a real falsification or an output
# artifact is unknowable. This runner retires that capture pattern: a
# failure here carries its seed and its stack in the kept log.
#
# Usage: tools/prop_sweep.sh [N] [outdir]
set -u
N="${1:-10}"
OUT="${2:-validation/r12_prop_sweeps}"
mkdir -p "$OUT"
summary="$OUT/SUMMARY.txt"
: > "$summary"
for i in $(seq 1 "$N"); do
  log="$OUT/sweep_$i.log"
  GRAFT_PROP_SEED=random sbt -batch \
    "Test/testOnly graft.PropertyChecks graft.MutationProps graft.NativeProps" \
    > "$log" 2>&1
  rc=$?
  ok=$(grep -c "OK, passed" "$log")
  fails=$(grep -c "Falsified" "$log")
  echo "sweep $i: rc=$rc ok_props=$ok falsified=$fails log=$(wc -c < "$log")B sha256=$(sha256sum "$log" | cut -d' ' -f1)" \
    | tee -a "$summary"
  if [ "$rc" -ne 0 ] || [ "$ok" -ne 19 ]; then
    echo "sweep $i DIVERGED — full log kept at $log" | tee -a "$summary"
  fi
done
echo "done: $N sweeps, summary at $summary"
