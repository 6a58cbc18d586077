"""Timestamped stage probe for the headline bench path on chip.

Usage: python exp/stage_probe.py [CTX] [stages...]
stages subset of: fill dense unfused fused  (default: all)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from quest_tpu.config import ModelConfig, QuestConfig
    from quest_tpu.kv.paged_kv import LayerKV, append_prefill, init_cache
    from quest_tpu.ops.dense_decode import dense_decode_attention
    from quest_tpu.ops.estimate import page_scores
    from quest_tpu.ops.fused_decode import fused_sparse_decode
    from quest_tpu.ops.sparse_decode import sparse_decode_attention
    from quest_tpu.ops.topk import select_pages
    from quest_tpu.utils.benchmarking import bench_op

    CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    stages = set(sys.argv[2:]) or {"fill", "dense", "unfused", "fused"}
    log("imports done, backend", jax.default_backend())

    B, Hq, Hkv, D, page, BUDGET = 1, 32, 32, 128, 16, 2048
    model = ModelConfig(num_heads=Hq, num_kv_heads=Hkv, head_dim=D)
    quest = QuestConfig(page_size=page, token_budget=BUDGET,
                        max_seq_len=CTX)
    S = quest.page_budget
    sm = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    cache = init_cache(model, quest, batch_size=B, num_layers=1)
    layer = cache.layer(0)
    log("cache init done")
    CH = min(8192, CTX)
    fill = jax.jit(append_prefill, donate_argnums=(0,))
    for off in range(0, CTX, CH):
        kn = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        vn = (rng.standard_normal((B, CH, Hkv, D)) * 0.3).astype(np.float32)
        layer = fill(layer, jnp.asarray(kn), jnp.asarray(vn))
        layer = LayerKV(layer.kv_pages, layer.k_max, layer.k_min,
                        jnp.asarray([off + CH], jnp.int32))
        layer.kv_pages.block_until_ready()
        log(f"fill chunk @{off}")
    seq = jnp.asarray([CTX], jnp.int32)
    q = jnp.asarray((rng.standard_normal((B, Hq, D)) * 0.3).astype(np.float32))
    iters, reps = (8, 72), 3

    def fb(x, y):
        dep = jnp.tanh(jnp.sum(y.astype(jnp.float32))) * 1e-3
        return (x + dep.astype(x.dtype)).astype(x.dtype)

    if "dense" in stages:
        t = bench_op(lambda q, env: fb(q, dense_decode_attention(
            q, env, seq, sm_scale=sm)), q, iters=iters, reps=reps,
            env=layer.kv_pages)
        log(f"dense {t*1e6:.1f} us")

    if "unfused" in stages:
        def sparse_step(q, env):
            kv_pages, kmax, kmin = env
            scores = page_scores(q, kmax, kmin)
            idx, nv = select_pages(scores, seq, page, S, method="exact_fast")
            return fb(q, sparse_decode_attention(q, kv_pages, idx, nv, seq,
                                                 sm_scale=sm))
        t = bench_op(sparse_step, q, iters=iters, reps=reps,
                     env=(layer.kv_pages, layer.k_max, layer.k_min))
        log(f"unfused {t*1e6:.1f} us")

    if "fused" in stages:
        def fused_step(q, env):
            kv_pages, kmax, kmin = env
            return fb(q, fused_sparse_decode(q, kv_pages, kmax, kmin, seq,
                                             sm_scale=sm, budget_pages=S))
        log("fused: compiling one call...")
        out = jax.jit(fused_step)(q, (layer.kv_pages, layer.k_max,
                                      layer.k_min))
        out.block_until_ready()
        log("fused: first call done; timing...")
        t = bench_op(fused_step, q, iters=iters, reps=reps,
                     env=(layer.kv_pages, layer.k_max, layer.k_min))
        log(f"fused {t*1e6:.1f} us")


if __name__ == "__main__":
    main()
