#!/bin/bash
# One-shot driver for every pending on-chip measurement (run when the
# axon TPU tunnel is reachable). Each step is independently timeboxed and
# appends to /tmp/chip_session.log; partial progress survives a tunnel
# drop. Ordering: cheapest/most-important first.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session.log
echo "=== chip session $(date) ===" | tee -a "$LOG"

run() {
    local name="$1" tmo="$2"; shift 2
    echo "--- $name ($(date +%H:%M:%S)) ---" | tee -a "$LOG"
    timeout "$tmo" "$@" >>"$LOG" 2>&1
    echo "--- $name exit=$? ---" | tee -a "$LOG"
}

# 1. headline bench (conformance + kernel + e2e + ANN blocks, one JSON line)
run bench 3000 python bench.py

# 2. beyond-HBM streaming at N=1M x 2048 (VERDICT r2 item 3): 2 GB device
#    budget forces the fused-streaming engine; db reused from /tmp/mvs_db_1m
run stream_1m 9000 python benchmarks/stream_scale.py 1048576 2048 16 2.0 \
    stream /tmp/mvs_db_1m

# 3. 1M-row ANN serving qps (VERDICT r2 item 7): f32 + bf16 + int8 engines
run ann_1m 7200 python benchmarks/ann_scale.py 1048576 2048 256 50

tail -5 "$LOG"
