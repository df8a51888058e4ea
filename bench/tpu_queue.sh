#!/usr/bin/env bash
# TPU work queue for when the axon tunnel recovers (round 3).
# Run from the repo root: bash bench/tpu_queue.sh
# Each step appends to /tmp/tpu_queue.log and keeps going on failure so one
# flake doesn't lose the batch.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue.log
echo "=== tpu_queue $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() {
  echo "--- $* ---" | tee -a "$LOG"
  timeout 900 "$@" >>"$LOG" 2>&1
  echo "exit=$? $*" | tee -a "$LOG"
}

# 1. compiled-kernel battery incl. the new automaton agreement gate
run python -m bench.tpu_validation

# 2. driver bench (throughput + MFU + per-preset extras + generation incl.
#    constrained scan vs fused automaton kernel)
run python bench.py

# 3. single-chip compile check
run python __graft_entry__.py
