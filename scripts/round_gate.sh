#!/usr/bin/env bash
# Standing per-round correctness gate (VERDICT r9 task 5).
#
# The r9 sf0.1 sweep caught a real cross-engine divergence
# (w14_sliding_windows) that eight rounds of sf0.01 evidence could
# not see — windows only hold enough rows at 10x scale for a float
# sum-order ulp to straddle a rounding boundary. So the gate is BOTH
# sweeps, every round, full registry, strict comparator, bare
# session (driver-faithful):
#
#   scripts/round_gate.sh            # sf0.01 then sf0.1
#   scripts/round_gate.sh sf0.1      # just one SF
#
# Any FAIL/ERROR is triaged in-round and the result recorded in
# VERIFICATION.md. Logs land in SWEEP_<sf>.log at the repo root.
set -u
cd "$(dirname "$0")/.."

sfs=("${@:-sf0.01}")
if [ $# -eq 0 ]; then sfs=(sf0.01 sf0.1); fi

rc=0
for sf in "${sfs[@]}"; do
    log="SWEEP_${sf}.log"
    echo "=== full-registry strict sweep at ${sf} -> ${log} ==="
    # keep stderr (Spark progress bars, \r-terminated) out of the log:
    # merged streams interleave mid-line and eat per-query rows
    python3 scripts/driver_sim.py 1000000000 "/root/testdata/${sf}" \
        2>"${log}.err" | tee "${log}" | tail -3
    tail -1 "${log}" | grep -q " 0 fail " || rc=1
done
exit ${rc}
