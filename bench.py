"""Headline benchmark: Quest sparse self-attention vs dense paged decode.

Mirrors the reference's headline protocol (`BASELINE.md`: up to 7.03x
self-attention speedup vs FlashInfer dense at 32K ctx / 2048 token
budget / page 16 / 32 heads / fp16 on RTX 4090;
`/root/reference/kernels/src/bench/bench_batch_decode.cu:135-142`).

Measures, on one real TPU chip with bf16 KV cache:
  dense  = dense paged flash-decode over the full 32K cache
  sparse = estimate -> top-k -> sparse paged flash-decode (full Quest
           decode-attention pipeline, jitted as one function)
and reports speedup = t_dense / t_sparse.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    on_tpu = jax.default_backend() == "tpu"
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # Reference headline config: 32K ctx, budget 2048, page 16, 32 heads.
    B, Hq, Hkv, D, page = 1, 32, 32, 128, 16
    CTX = 32768 if on_tpu else 2048          # CPU smoke fallback
    BUDGET = 2048 if on_tpu else 256
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)

    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    k_new = (rng.standard_normal((B, CTX, Hkv, D)) * 0.3).astype(np.float32)
    v_new = (rng.standard_normal((B, CTX, Hkv, D)) * 0.3).astype(np.float32)
    layer = append_prefill(layer, jnp.asarray(k_new), jnp.asarray(v_new))
    seq = jnp.asarray([CTX], jnp.int32)
    layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min, seq)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))

    # Slope-timed on device (utils/benchmarking.py): a fori_loop chain
    # with data-dependent feedback at two trip counts; fixed dispatch /
    # fetch costs cancel exactly. Big arrays ride `env`, not closures.
    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    iters, reps = ((8, 72), 5) if on_tpu else ((2, 6), 2)
    t_dense = bench_op(
        lambda q, env: fb(q, dense_decode_attention(q, env, seq,
                                                    sm_scale=sm)),
        q, iters=iters, reps=reps, env=layer.kv_pages)

    def sparse_step(q, env):
        kv_pages, kmax, kmin = env
        scores = page_scores(q, kmax, kmin)
        idx, num_valid = select_pages(scores, seq, page, S)
        return fb(q, sparse_decode_attention(q, kv_pages, idx, num_valid,
                                             seq, sm_scale=sm))

    t_sparse = bench_op(sparse_step, q, iters=iters, reps=reps,
                        env=(layer.kv_pages, layer.k_max, layer.k_min))
    speedup = t_dense / t_sparse

    # Bytes-moved accounting (NVBench analogue,
    # `bench_batch_decode.cu:82-86`).
    bpe = 2  # bf16
    dense_bytes = 2 * Hkv * CTX * D * bpe
    sparse_bytes = (2 * Hkv * BUDGET * D * bpe            # selected pages
                    + 2 * Hkv * (CTX // page) * D * bpe)  # metadata
    log(f"dense:  {t_dense*1e6:8.1f} us  ({dense_bytes/t_dense/1e9:.0f} GB/s)")
    log(f"sparse: {t_sparse*1e6:8.1f} us  ({sparse_bytes/t_sparse/1e9:.0f} GB/s)")
    log(f"speedup: {speedup:.2f}x (reference headline: 7.03x)")

    print(json.dumps({
        "metric": "self_attention_speedup_32k_budget2048",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 7.03, 3),
    }))


if __name__ == "__main__":
    main()
