#!/bin/bash
# Round-5 TPU capture sequence — run when the tunnel is up. Each step is
# independent and persists its own artifact, so a mid-sequence tunnel
# flake loses only the step in flight (bench.py additionally keeps
# BENCH_partial.json current row-by-row).
#
# Usage: bash experiments/run_r5_tpu.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=experiments/r5_tpu_capture.log
steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(verify bench roofline spec streamed parity_trained)

run() {
  local name=$1; shift
  for s in "${steps[@]}"; do
    if [ "$s" = "$name" ]; then
      echo "=== $name $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
      "$@" >> "$LOG" 2>&1
      echo "--- $name rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
    fi
  done
}

# 1. kernel numerics on real Mosaic (updates stdout only; tee to artifact)
run verify bash -c 'python bench.py --verify | tee KERNEL_VERIFY_TPU.json'

# 2. full bench: all rows incl. 70b + derived_check; generous budget
run bench env PRIMA_BENCH_BUDGET_S=2800 python bench.py

# 3. 14B-deficit roofline over every 8B/14B matmul shape
run roofline python experiments/kernel_roofline_r5.py

# 4. trained-pair speculative end-to-end ON CHIP
run spec env PRIMA_SPEC_R5_TPU=1 PRIMA_SPEC_R5_PROMPTS=4 \
    python experiments/spec_r5.py

# 5. streamed (host->HBM double-buffered) composition bound
run streamed bash -c 'python tools/bench_streamed.py | tee experiments/streamed_r5.json'

# 6. trained-weights hardware parity (appends a PARITY_TPU.md section)
run parity_trained env PRIMA_PARITY_GGUF=models_tiny_pair/target.gguf \
    PRIMA_PARITY_APPEND=1 python -m tools.parity_tpu

# 7. large-model parity (~360 MB upload at ~20 MB/s: run only with time
#    to spare — not in the default set)
run parity_large env PRIMA_PARITY_LAYERS=14 PRIMA_PARITY_HIDDEN=2048 \
    PRIMA_PARITY_FFN=5632 PRIMA_PARITY_HEADS=32 PRIMA_PARITY_KV=4 \
    PRIMA_PARITY_VOCAB=32000 PRIMA_PARITY_APPEND=1 \
    python -m tools.parity_tpu

echo "capture done $(date -u)" | tee -a "$LOG"
