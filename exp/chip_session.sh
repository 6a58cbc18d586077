#!/bin/bash
# On-chip evidence session for round 3 (VERDICT r2 #1-#4, #10). Each
# step runs in its own process under timeout (a Pallas deadlock hangs
# the TPU worker ~30 min, so known-good steps run BEFORE the first
# drive of risky kernels). ALL outputs land in $LOG and are committed.
# Usage: bash exp/chip_session.sh [logdir]
set -u
LOG=${1:-exp/r3_chip}
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
step sanity 300 python -c "import jax, numpy as np, jax.numpy as jnp; print(jax.devices()); print(np.asarray(jnp.ones((8,128)).sum()))" || exit 1

# 1. top-k regression diagnosis (VERDICT #2): exact/exact_fast/approx
#    timings + certificate failure rates at P=2048 and P=8192
step topk_probe 1200 python exp/topk_probe.py

# 2. known-good kernel numerics on chip
step verify_main 900 python exp/verify_drive.py

# 3. dense kernel sweep at hardware speed (VERDICT #10): the
#    reference's ~400-combo gtest grid analogue
step kernel_sweep 3600 env QT_SWEEP_N=64 QT_SWEEP_TPU=1 \
  python -m pytest tests/test_kernel_sweep.py -q -p no:cacheprovider

# 4. full-size e2e rows (VERDICT #4). Geometry must FIT one 16 GB
#    chip: longchat (MHA) at 32 layers holds 537 MB KV per 1K ctx —
#    32K ctx alone is 17 GB, so the MHA 32-layer row runs at 8K and
#    the 32-layer 32K row uses llama31 (GQA, KV/4 = 4.3 GB).
# Full 32-layer models on one 16 GB chip need 4-bit weights (the
# reference's own AWQ headline row is 4-bit at 32K/2048): int8
# weights + any 32-layer pool exceed HBM regardless of KV dtype.
step e2e32_gqa_32k 2400 python scripts/bench_textgen.py --model llama31-8b \
  --layers 32 --ctx 32768 --budget 2048 --decode-tokens 32 --quantize 4 \
  --prefill-chunk 4096
step e2e32_gqa_32k_full 2400 python scripts/bench_textgen.py --model llama31-8b \
  --layers 32 --ctx 32768 --budget 32768 --decode-tokens 32 --quantize 4 \
  --prefill-chunk 4096
step e2e32_mha_8k 2400 python scripts/bench_textgen.py --model longchat-7b \
  --layers 32 --ctx 8192 --budget 2048 --decode-tokens 32 --quantize 4 \
  --prefill-chunk 4096
step e2e8_128k 2400 python scripts/bench_textgen.py --model llama31-8b \
  --layers 8 --ctx 131072 --budget 2048 --decode-tokens 32 --quantize 8
step e2e8_128k_full 2400 python scripts/bench_textgen.py --model llama31-8b \
  --layers 8 --ctx 131072 --budget 131072 --decode-tokens 32 --quantize 8

# 5. accuracy delta study on chip (VERDICT #2 r1 / #4)
step accuracy_delta 3000 python scripts/accuracy_delta.py --random \
  --preset small-tpu --skip-layers 1 --ctx 8192 --eval-tokens 128 \
  --gen-tokens 64 --budgets 512,1024,2048,4096 \
  --json-out "$LOG/accuracy_delta.json"

# 6. fused megakernel drive + tuned-config verification (VERDICT #1)
step verify_fused 900 python exp/verify_drive.py fused || {
  echo "FUSED FAILED" | tee -a "$LOG/session.log"
}

# 7. fused knob confirmation at both contexts (one process per config:
#    a Mosaic compiler crash SIGABRTs the process)
for cfg in 16,1,3,4,1024 8,1,3,4,1024; do
  step "fused32k_${cfg//,/;}" 900 env BF_SKIP_BASE=1 \
    python exp/bench_fused.py 32768 "$cfg"
done
for cfg in 8,1,3,4,1024; do
  step "fused128k_${cfg//,/;}" 1200 env BF_SKIP_BASE=1 \
    python exp/bench_fused.py 131072 "$cfg"
done

# 8. headline bench + kernel-stage accounting
step bench 3600 python bench.py
step bench_kernels 1800 python scripts/bench_kernels.py

# 9. serving throughput incl. prefix-cache scenario
step bench_serving 2400 python scripts/bench_serving.py \
  --preset llama31-8b --layers 4 --max-batch 8 --requests 24 \
  --prompt-len 2048 --gen-len 64 --shared-prefix 1024

# 10. eval path on chip
step ppl_eval 1200 python scripts/ppl_eval.py --random --preset small-tpu \
  --num-eval-tokens 32 --max-seq-len 1024

echo "SESSION DONE $(date)" | tee -a "$LOG/session.log"
