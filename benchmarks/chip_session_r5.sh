#!/bin/bash
# Round-5 on-chip measurement session (run when the tunnel is reachable;
# tolerant of pathological dispatch-RTT phases — each step timeboxed,
# progress appends to /tmp/chip_session_r5.log).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session_r5.log
echo "=== chip session r5 $(date) ===" | tee -a "$LOG"

run() {
    local name="$1" tmo="$2"; shift 2
    echo "--- $name ($(date +%H:%M:%S)) ---" | tee -a "$LOG"
    timeout "$tmo" "$@" >>"$LOG" 2>&1
    echo "--- $name exit=$? ---" | tee -a "$LOG"
}

# 1. int16-db engine oracle drive on the REAL chip: exercises the
#    asymmetric (512,256) pallas sweep inside compute_pairwise_shard for
#    P=6 plane stacks (r5 change), gated on decode == float64 oracle
run i16_oracle 2400 python benchmarks/i16_oracle_drive.py

# 2. headline bench (includes the new pallas block-config sweep, the
#    compile-cache probes, the dispatch-RTT context field)
run bench 6000 python bench.py

# 3. 1M-row ANN serving (device-resident adaptive frontier, VERDICT r4 #8)
run ann_1m 7200 python benchmarks/ann_scale.py 1048576 2048 256 50

tail -5 "$LOG"
