#!/bin/bash
# Probe the axon TPU tunnel every ~4 min; when backend init succeeds, run
# the full pending chip session (benchmarks/chip_session.sh) exactly once.
# Designed to run under tmux so it survives the driving session's turns.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_watch.log
echo "=== tunnel watch started $(date) ===" | tee -a "$LOG"
while true; do
    if timeout 150 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
        >>"$LOG" 2>&1; then
        echo "tunnel UP $(date) — launching chip session" | tee -a "$LOG"
        bash benchmarks/chip_session.sh
        echo "chip session finished $(date)" | tee -a "$LOG"
        exit 0
    fi
    echo "tunnel still down $(date)" >>"$LOG"
    sleep 240
done
