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
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, contiguous_kv, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages

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
    layer = LayerKV(layer.k_pages, layer.v_pages, layer.k_min, layer.k_max,
                    seq)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    k_flat, v_flat = contiguous_kv(layer)

    @jax.jit
    def dense_fn(q, k_flat, v_flat):
        return dense_decode_attention(q, k_flat, v_flat, seq, sm_scale=sm)

    @jax.jit
    def sparse_fn(q, lay):
        scores = page_scores(q, lay.k_min, lay.k_max)
        idx, num_valid = select_pages(scores, seq, page, S)
        return sparse_decode_attention(q, lay.k_pages, lay.v_pages,
                                       idx, num_valid, seq, sm_scale=sm)

    def timeit(fn, iters=50):
        jax.block_until_ready(fn())      # compile + warm
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    t_dense = timeit(lambda: dense_fn(q, k_flat, v_flat))
    t_sparse = timeit(lambda: sparse_fn(q, layer))
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
