#!/bin/bash
# On-chip session runner for round 2. Each step in its own process
# under timeout (a Pallas deadlock hangs the TPU worker ~30 min, so
# known-good steps run BEFORE the first drive of the new megakernel).
# Usage: bash exp/chip_session.sh [logdir]
set -u
LOG=${1:-exp/r2_chip}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {  # step NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/session.log"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/session.log"
  tail -5 "$LOG/$name.log" | tee -a "$LOG/session.log"
  return $rc
}

# 0. sanity
step sanity 120 python -c "import jax, numpy as np, jax.numpy as jnp; print(jax.devices()); print(np.asarray(jnp.ones((8,128)).sum()))" || exit 1

# 1. DMA gather-depth/striping sweep (informs sparse gather + megakernel)
for args in "gather 1024 3 32 1" "gather 1024 4 32 1" "gather 1024 6 32 1" \
            "gather 1024 8 32 1" "gather 1024 4 32 2" "gather 1024 4 32 4" \
            "gather 512 6 32 1" "gather 512 8 32 2" "contig 1024 3 32 1"; do
  step "probe_${args// /_}" 420 python exp/dma_probe.py $args
done

# 2. known-good kernel numerics on chip (round-2 unfused changes)
step verify_main 900 python exp/verify_drive.py

# 3. 32-layer full-size e2e rows (VERDICT #2) — independent of fused
step e2e32_int8 2400 python scripts/bench_textgen.py --model longchat-7b \
  --layers 32 --ctx 32768 --budget 2048 --decode-tokens 32 --quantize 8
step e2e32_int8_full 2400 python scripts/bench_textgen.py --model longchat-7b \
  --layers 32 --ctx 32768 --budget 32768 --decode-tokens 32 --quantize 8
step e2e32_llama31_serving 2400 python scripts/bench_textgen.py \
  --model llama31-8b --layers 32 --ctx 32768 --budget 2048 \
  --decode-tokens 32 --quantize 8 --kv-dtype fp8 --meta-dtype fp8 \
  --topk approx
step e2e32_llama31_serving_full 2400 python scripts/bench_textgen.py \
  --model llama31-8b --layers 32 --ctx 32768 --budget 32768 \
  --decode-tokens 32 --quantize 8 --kv-dtype fp8 --meta-dtype fp8

# 4. accuracy delta study on chip (VERDICT #4)
step accuracy_delta 3000 python scripts/accuracy_delta.py --random \
  --preset small-tpu --ctx 8192 --eval-tokens 128 --gen-tokens 64 \
  --budgets 512,1024,2048,4096 --json-out exp/r2_chip/accuracy_delta.json

# 5. FIRST drive of the fused megakernel (hang risk point)
step verify_fused 900 python exp/verify_drive.py fused || {
  echo "FUSED FAILED — waiting out possible TPU outage" | tee -a "$LOG/session.log"
  exit 2
}

# 6. fused knob sweep (select_group / gather sems / ring depths)
step bench_fused_32k 2400 python exp/bench_fused.py 32768
step bench_fused_128k 2400 python exp/bench_fused.py 131072 \
  "1,1,2,6" "4,1,5,6" "4,2,5,8"

# 7. headline bench (fused + unfused + serving configs)
step bench 1800 python bench.py
step bench_kernels 1800 python scripts/bench_kernels.py

# 8. serving throughput incl. prefix-cache scenario
step bench_serving 2400 python scripts/bench_serving.py \
  --preset llama31-8b --layers 4 --max-batch 8 --requests 24 \
  --prompt-len 2048 --gen-len 64 --shared-prefix 1024

echo "SESSION DONE $(date)" | tee -a "$LOG/session.log"
